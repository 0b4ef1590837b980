"""Scene as a pytree of flat SoA arrays + its ray/emitter queries.

TPU-native replacement for src/render/scene.cpp (Scene object DAG,
emitter distribution, ray queries) and src/render/mesh.cpp
(differentiable surface-interaction reconstruction).  The object graph
of the reference collapses into:

* GeometryArrays — vertex/face/sphere tables + BVH arrays,
* per-shape index tables (material id, emitter id),
* a flat "light-sample table" that jointly samples (emitter, primitive)
  for NEE (mathematically identical to the reference's two-stage
  DiscreteDistribution pick in Scene::sample_emitter_direction
  scene.cpp:295 followed by per-shape area sampling),
* EmitterTable / camera batch / film config built by loader/dict_loader.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m
from ..core import warp
from ..core.distr import DiscreteDistribution, Marginal2D
from ..accel import traverse
from .records import (DirectionSample, PreliminaryIntersection, Ray,
                      SurfaceInteraction)

# Emitter type ids
E_AREA = 0
E_POINT = 1
E_CONSTANT = 2
E_ENVMAP = 3
E_DIRECTIONAL = 4
E_SPOT = 5
E_PROJECTOR = 6
E_DIRECTIONALAREA = 7


@struct.dataclass
class GeometryArrays:
    verts: jnp.ndarray       # (V, 3) — differentiable positions
    faces: jnp.ndarray       # (F, 3) int32
    vnormals: jnp.ndarray    # (V, 3) shading normals (zeros = use geometric)
    vuvs: jnp.ndarray        # (V, 2)
    has_vn: jnp.ndarray      # (F,) bool — face uses interpolated normals
    has_uv: jnp.ndarray      # (F,) bool
    tri_shape: jnp.ndarray   # (F,) int32
    sph_center: jnp.ndarray  # (S, 3)
    sph_radius: jnp.ndarray  # (S,)
    sph_shape: jnp.ndarray   # (S,) int32
    bvh_bbox: jnp.ndarray    # (M, 2, 3)
    bvh_meta: jnp.ndarray    # (M, 2) int32
    bvh_prim_ids: jnp.ndarray  # (P,) int32
    accel_mode: str = struct.field(pytree_node=False, default="brute")
    # spatially-coherent triangle permutation for the tiled-cull Pallas
    # tracer (ops/isect.py ray_triangles_tiled); identity if unused
    tri_order: jnp.ndarray = None  # (F,) int32
    # per-vertex fiber tangents for curve shapes (loader/curves.py);
    # None unless the scene holds curves.  Non-zero tangent => the SI
    # frame aligns sh_t with the fiber axis (hair BSDF convention,
    # src/bsdfs/hair.cpp:566-589)
    vtangents: jnp.ndarray = None  # (V, 3) or None
    # per-vertex attribute values for mesh_attribute textures
    # (src/textures/mesh_attribute.cpp "vertex_color"); None if unused
    vattrs: jnp.ndarray = None     # (V, 3) or None
    # static attribute-presence flags: the SI reconstruction's packed
    # gather skips normal/uv columns entirely when no face uses them
    # (gather row width is the hot-loop's main HBM cost)
    any_vn: bool = struct.field(pytree_node=False, default=True)
    any_vattr: bool = struct.field(pytree_node=False, default=False)
    any_uv: bool = struct.field(pytree_node=False, default=True)
    # unique mesh edges for silhouette sampling (ad/projective.py):
    # (E, 4) int32 [v0, v1, face_a, face_b]; face_b = -1 on open
    # boundaries.  Built position-welded so per-corner vertex splits
    # (OBJ expansion) don't hide adjacency.
    edges: jnp.ndarray = None
    # treelet tile boundaries for the binned tracer
    # (accel/build.treelet_tiles): (n_tiles + 1,) int32 into tri_order
    # space; None outside the tiled accel mode
    tile_starts: jnp.ndarray = None
    # cached binned-tracer tables (ops/binned_trace.pack_binned),
    # precomputed ONCE at scene build: re-deriving them per trace call
    # re-gathered the full 1M-triangle soup EVERY bounce (closest +
    # shadow), ~350 ms of a 1.1 s bigscene frame (round-5 device
    # profile).  Refreshed by ad.update_scene on vertex updates.
    bt_soa: jnp.ndarray = None       # (n_tiles_p, 16, TILE)
    bt_sup: jnp.ndarray = None       # (NSP, 8) supertile AABBs
    bt_tilec: jnp.ndarray = None     # (192, NSP) tile AABB components
    bt_pmap: jnp.ndarray = None      # (n_tiles_p*TILE,) ordered prim ids
    bt_ns: int = struct.field(pytree_node=False, default=0)
    bt_nt: int = struct.field(pytree_node=False, default=0)
    # TRUE instancing (src/shapes/instance.cpp): mesh shape-group
    # templates stored once in group-local space + per-instance
    # transforms.  Instanced prim ids start at
    # accel.traverse.inst_prim_base (F + S + a pad that keeps SDF prim
    # ids clear).  All None when the scene has no mesh instances.
    tmpl_verts: jnp.ndarray = None    # (Vt, 3)
    tmpl_faces: jnp.ndarray = None    # (Ft, 3) int32
    tmpl_vns: jnp.ndarray = None      # (Vt, 3)
    tmpl_uvs: jnp.ndarray = None      # (Vt, 2)
    tmpl_hasvn: jnp.ndarray = None    # (Ft,) bool
    tmpl_hasuv: jnp.ndarray = None    # (Ft,) bool
    tmpl_tri_shape: jnp.ndarray = None  # (Ft,) int32 shared shape ids
    inst_to_world: jnp.ndarray = None   # (I, 4, 4)
    inst_to_object: jnp.ndarray = None  # (I, 4, 4)
    inst_nrm_mat: jnp.ndarray = None    # (I, 4, 4) to_object^T
    inst_prim_off: jnp.ndarray = None   # (I + 1,) int32 cumulative fc
    inst_face_idx: jnp.ndarray = None   # (I, Fg_max) template faces, -1 pad

    @property
    def tri_p0(self):
        return self.verts[self.faces[:, 0]]

    @property
    def tri_p1(self):
        return self.verts[self.faces[:, 1]]

    @property
    def tri_p2(self):
        return self.verts[self.faces[:, 2]]

    @property
    def n_prims(self):
        return self.faces.shape[0] + self.sph_center.shape[0]


@struct.dataclass
class EmitterTable:
    """Flat emitter parameter table (replaces the Emitter plugin set)."""

    e_type: jnp.ndarray       # (E,) int32
    radiance: jnp.ndarray     # (E, 3) radiance / intensity / irradiance
    tex: jnp.ndarray          # (E,) int32 texture id (-1 = constant)
    to_world: jnp.ndarray     # (E, 4, 4)
    to_world_inv: jnp.ndarray  # (E, 4, 4)
    shape: jnp.ndarray        # (E,) shape id for area emitters, -1 else
    params: jnp.ndarray       # (E, 4) type-specific scalars
    sampling_weight: jnp.ndarray  # (E,)
    # --- joint NEE light-sample table ---
    ls_distr: DiscreteDistribution   # over L entries
    ls_prim: jnp.ndarray      # (L,) global prim id or -1
    ls_emitter: jnp.ndarray   # (L,) emitter id
    # per global prim: area-measure pick density (p_entry / prim_area), -1 emitters
    prim_emitter: jnp.ndarray     # (n_prims,) int32, -1 = not emissive
    prim_pdf_area: jnp.ndarray    # (n_prims,) float32
    env_warp: Marginal2D          # envmap importance table (1x1 dummy if none)
    env_index: int = struct.field(pytree_node=False, default=-1)
    types_present: tuple = struct.field(pytree_node=False, default=())

    @property
    def n(self):
        return self.e_type.shape[0]


def envmap_dir_to_uv(d_local):
    """Mitsuba envmap parametrization (envmap.cpp Emitter::eval):
    u = atan2(d.x, -d.z) / 2pi (wrapped), v = acos(d.y) / pi — the
    polar axis is local +y, u=0 faces -z.  Returns (uv, sin_theta)."""
    phi = jnp.arctan2(d_local[..., 0], -d_local[..., 2])
    u = phi * warp.INV_TWOPI
    u = jnp.where(u < 0.0, u + 1.0, u)
    cy = jnp.clip(d_local[..., 1], -1.0, 1.0)
    v = m.safe_acos(cy) * warp.INV_PI
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cy * cy, 0.0))
    return jnp.stack([u, v], -1), sin_t


def envmap_uv_to_dir(uv):
    """Inverse of envmap_dir_to_uv.  Returns (d_local, sin_theta)."""
    theta = uv[..., 1] * jnp.pi
    phi = uv[..., 0] * 2.0 * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    d = m.vec(st * jnp.sin(phi), ct, -st * jnp.cos(phi))
    return d, st


@struct.dataclass
class Scene:
    geom: GeometryArrays
    shape_material: jnp.ndarray   # (n_shapes,) int32
    shape_emitter: jnp.ndarray    # (n_shapes,) int32
    materials: Any                # bsdfs.registry.MaterialTable
    textures: Any                 # texture.TextureTable
    emitters: EmitterTable
    sensor: Any                   # sensors CameraBatch
    film: Any                     # film.FilmConfig
    bbox_lo: jnp.ndarray          # scene bounds (for dist. emitters)
    bbox_hi: jnp.ndarray
    # participating media (render/medium.py); -1 = vacuum
    media: Any = None             # MediumTable
    shape_interior: jnp.ndarray = None   # (n_shapes,) int32 medium id
    shape_exterior: jnp.ndarray = None   # (n_shapes,) int32 medium id
    camera_medium: int = struct.field(pytree_node=False, default=-1)
    has_media: bool = struct.field(pytree_node=False, default=False)
    # heterogeneous-media volume grids (render/volume.py)
    volumes: Any = None           # VolumeGridTable
    has_hetero: bool = struct.field(pytree_node=False, default=False)
    # any null-BSDF shape bounding a medium (shadow rays must cross it)
    has_null_boundaries: bool = struct.field(pytree_node=False,
                                             default=False)
    # shape-attached surface sensor (irradiancemeter.cpp): global prim ids
    # of the attached shape + an area-weighted pick distribution; ray
    # generation lives in integrators/api.py sample_rays
    sensor_prims: jnp.ndarray = None      # (K,) int32 global prim ids
    sensor_prim_distr: Any = None         # DiscreteDistribution over areas
    has_surface_sensor: bool = struct.field(pytree_node=False,
                                            default=False)
    # measured BSDFs (bsdfs/measured.py): one MeasuredBSDF pytree per
    # distinct .bsdf file; material rows of type D_MEASURED index into
    # this tuple via child_a
    measured: tuple = ()
    # measured polarized pBSDFs (bsdfs/measured_polarized.py); material
    # rows of type D_MEASURED_POL index into this tuple via child_a
    measured_pol: tuple = ()
    # SDF grid shapes (render/sdf.py, src/shapes/sdfgrid.cpp): prim id
    # F + S + k belongs to scene.sdfs[k]
    sdfs: tuple = ()

    # ---------------- ray queries ----------------

    def ray_intersect_preliminary(self, ray: Ray) -> PreliminaryIntersection:
        pi = traverse.ray_intersect_prelim(self.geom, ray)
        if not self.sdfs:
            return pi
        from . import sdf as _sdf
        n_ps = self.geom.n_prims
        t = pi.t
        prim = pi.prim_index
        shape = pi.shape_index
        uv = pi.prim_uv
        for k, g in enumerate(self.sdfs):
            t_s, hit = _sdf.sdf_intersect(g, ray.o, ray.d,
                                          jnp.minimum(t, ray.maxt))
            closer = hit & (t_s < t)
            t = jnp.where(closer, t_s, t)
            prim = jnp.where(closer, n_ps + k, prim)
            shape = jnp.where(closer, g.shape_index, shape)
            uv = jnp.where(closer[..., None], 0.0, uv)
        return PreliminaryIntersection(t=t, prim_uv=uv, prim_index=prim,
                                       shape_index=shape)

    def ray_test(self, ray: Ray):
        occ = traverse.ray_test(self.geom, ray)
        if self.sdfs:
            from . import sdf as _sdf
            for g in self.sdfs:
                _, hit = _sdf.sdf_intersect(g, ray.o, ray.d, ray.maxt)
                occ = occ | hit
        return occ

    def ray_intersect(self, ray: Ray) -> SurfaceInteraction:
        return self.compute_surface_interaction(ray, self.ray_intersect_preliminary(ray))

    # ---------------- differentiable SI reconstruction ----------------

    def compute_surface_interaction(self, ray: Ray,
                                    pi: PreliminaryIntersection) -> SurfaceInteraction:
        """Reattach gradients to the detached hit (SURVEY.md §A.1,
        Mesh::compute_surface_interaction mesh.cpp:1392-1480): re-run a
        differentiable Möller-Trumbore on the hit triangle and graft its
        derivative onto the primal (t, uv) via replace_grad."""
        g = self.geom
        F = g.faces.shape[0]
        n = pi.t.shape[0]
        valid = pi.is_valid
        prim = jnp.maximum(pi.prim_index, 0)
        is_tri = prim < F if F > 0 else jnp.zeros_like(valid)

        # ---- triangles
        #
        # All per-face attributes are packed into ONE (F, 31) matrix so
        # the per-lane lookup is a single gather: on TPU, gather cost is
        # dominated by per-row index handling, so 1 wide gather beats the
        # ~18 narrow ones this used to be (measured 2.3x on v5e).  The
        # pack itself is row-space work over F, negligible next to the
        # n-lane wavefront.  Gradients to `verts` flow through the pack.
        if F > 0:
            tri = jnp.clip(prim, 0, F - 1)
            f32 = jnp.float32
            f0, f1, f2 = g.faces[:, 0], g.faces[:, 1], g.faces[:, 2]
            sshp = jnp.maximum(g.tri_shape, 0)
            # column groups included only when any face uses them (the
            # any_vn/any_uv static flags): a flat-shaded untextured
            # scene gathers 11 columns instead of 29
            parts = [
                g.verts[f0], g.verts[f1], g.verts[f2],              # 0:9
                self.shape_material[sshp][:, None].astype(f32),     # 9
                self.shape_emitter[sshp][:, None].astype(f32),      # 10
            ]
            off_vn = off_uv = off_tg = -1
            off = 11
            if g.any_vn:
                parts += [g.vnormals[f0], g.vnormals[f1],
                          g.vnormals[f2], g.has_vn[:, None].astype(f32)]
                off_vn = off
                off += 10
            if g.any_uv:
                parts += [g.vuvs[f0], g.vuvs[f1], g.vuvs[f2],
                          g.has_uv[:, None].astype(f32)]
                off_uv = off
                off += 7
            if g.vtangents is not None:
                parts += [g.vtangents[f0], g.vtangents[f1],
                          g.vtangents[f2]]
                off_tg = off
                off += 9
            off_vc = -1
            if g.any_vattr:
                parts += [g.vattrs[f0], g.vattrs[f1], g.vattrs[f2]]
                off_vc = off
            A = jnp.concatenate(parts, axis=1)
            a = m.take_rows(A, tri)                          # (n, C)
            p0, p1, p2 = a[:, 0:3], a[:, 3:6], a[:, 6:9]
            t_d, u_d, v_d, _ = traverse.ray_triangle(ray.o, ray.d, p0, p1, p2, eps=1.0)
            t_tri = m.replace_grad(pi.t, t_d)
            uv_tri = m.replace_grad(pi.prim_uv,
                                    jnp.stack([u_d, v_d], -1))
            b0 = 1.0 - uv_tri[..., 0] - uv_tri[..., 1]
            p_tri = (b0[..., None] * p0 + uv_tri[..., 0:1] * p1
                     + uv_tri[..., 1:2] * p2)
            ng_tri = m.normalize(jnp.cross(p1 - p0, p2 - p0))
            if off_vn >= 0:
                vn = (b0[..., None] * a[:, off_vn:off_vn + 3]
                      + uv_tri[..., 0:1] * a[:, off_vn + 3:off_vn + 6]
                      + uv_tri[..., 1:2] * a[:, off_vn + 6:off_vn + 9])
                use_vn = a[:, off_vn + 9] > 0.5
                ns_tri = jnp.where(use_vn[..., None], m.normalize(vn),
                                   ng_tri)
            else:
                ns_tri = ng_tri
            if off_uv >= 0:
                tuv = (b0[..., None] * a[:, off_uv:off_uv + 2]
                       + uv_tri[..., 0:1] * a[:, off_uv + 2:off_uv + 4]
                       + uv_tri[..., 1:2] * a[:, off_uv + 4:off_uv + 6])
                uv_surf_tri = jnp.where(
                    (a[:, off_uv + 6] > 0.5)[..., None], tuv, uv_tri)
            else:
                uv_surf_tri = uv_tri
            mat_tri = a[:, 9].astype(jnp.int32)
            emi_tri = a[:, 10].astype(jnp.int32)
            if off_tg >= 0:
                tg_tri = (b0[..., None] * a[:, off_tg:off_tg + 3]
                          + uv_tri[..., 0:1] * a[:, off_tg + 3:off_tg + 6]
                          + uv_tri[..., 1:2] * a[:, off_tg + 6:off_tg + 9])
            else:
                tg_tri = None
            if off_vc >= 0:
                vc_tri = (b0[..., None] * a[:, off_vc:off_vc + 3]
                          + uv_tri[..., 0:1] * a[:, off_vc + 3:off_vc + 6]
                          + uv_tri[..., 1:2] * a[:, off_vc + 6:off_vc + 9])
            else:
                vc_tri = None
        else:
            t_tri = pi.t
            p_tri = jnp.zeros((n, 3))
            ng_tri = jnp.zeros((n, 3))
            ns_tri = ng_tri
            uv_surf_tri = pi.prim_uv
            mat_tri = jnp.zeros((n,), jnp.int32)
            emi_tri = jnp.full((n,), -1, jnp.int32)
            tg_tri = None
            vc_tri = None

        # ---- spheres (same single-gather pack)
        S = g.sph_center.shape[0]
        if S > 0:
            sph = jnp.clip(prim - F, 0, S - 1)
            f32 = jnp.float32
            sshp = jnp.maximum(g.sph_shape, 0)
            B = jnp.concatenate([
                g.sph_center,                                       # 0:3
                g.sph_radius[:, None],                              # 3
                self.shape_material[sshp][:, None].astype(f32),     # 4
                self.shape_emitter[sshp][:, None].astype(f32),      # 5
            ], axis=1)
            b = m.take_rows(B, sph)
            c = b[:, 0:3]
            r = b[:, 3]
            p_raw = ray.o + ray.d * pi.t[..., None]
            n_sph = m.normalize(p_raw - c)
            p_sph = c + n_sph * r[..., None]
            theta, phi = m.dir_to_sph(n_sph)
            uv_sph = jnp.stack([phi * warp.INV_TWOPI, theta * warp.INV_PI], -1)
            t_sph = pi.t
            mat_sph = b[:, 4].astype(jnp.int32)
            emi_sph = b[:, 5].astype(jnp.int32)
        else:
            p_sph = jnp.zeros((n, 3))
            n_sph = jnp.zeros((n, 3))
            uv_sph = jnp.zeros((n, 2))
            t_sph = pi.t
            mat_sph = jnp.zeros((n,), jnp.int32)
            emi_sph = jnp.full((n,), -1, jnp.int32)

        t = jnp.where(is_tri, t_tri, t_sph)
        p = jnp.where(is_tri[..., None], p_tri, p_sph)
        ng = jnp.where(is_tri[..., None], ng_tri, n_sph)
        ns = jnp.where(is_tri[..., None], ns_tri, n_sph)
        uv = jnp.where(is_tri[..., None], uv_surf_tri, uv_sph)
        mat_inst = jnp.zeros((n,), jnp.int32)
        is_inst = jnp.zeros((n,), bool)
        if g.inst_to_world is not None:
            # TRUE instancing (instance.cpp compute_surface_interaction
            # semantics): template triangle transformed to world by the
            # instance's to_world; gradients flow to tmpl_verts AND the
            # instance transforms (both are pytree leaves)
            from ..accel import traverse as tv_mod
            n_base = tv_mod.inst_prim_base(g)
            is_inst = valid & (prim >= n_base)
            sid_i, inst, face = tv_mod.instanced_shape_index(g, prim)
            tf = g.tmpl_faces[jnp.maximum(face, 0)]
            tw = g.inst_to_world
            q0 = m.transform_point_indexed(tw, inst, g.tmpl_verts[tf[:, 0]])
            q1 = m.transform_point_indexed(tw, inst, g.tmpl_verts[tf[:, 1]])
            q2 = m.transform_point_indexed(tw, inst, g.tmpl_verts[tf[:, 2]])
            t_d, u_d, v_d, _ = traverse.ray_triangle(ray.o, ray.d,
                                                     q0, q1, q2, eps=1.0)
            t_i = m.replace_grad(pi.t, t_d)
            uv_i = m.replace_grad(pi.prim_uv, jnp.stack([u_d, v_d], -1))
            b0i = 1.0 - uv_i[..., 0] - uv_i[..., 1]
            p_i = (b0i[..., None] * q0 + uv_i[..., 0:1] * q1
                   + uv_i[..., 1:2] * q2)
            ng_i = m.normalize(jnp.cross(q1 - q0, q2 - q0))
            vn_l = (b0i[..., None] * g.tmpl_vns[tf[:, 0]]
                    + uv_i[..., 0:1] * g.tmpl_vns[tf[:, 1]]
                    + uv_i[..., 1:2] * g.tmpl_vns[tf[:, 2]])
            vn_w = m.transform_vector_indexed(g.inst_nrm_mat, inst, vn_l)
            use_vn = g.tmpl_hasvn[jnp.maximum(face, 0)]
            # flat-shaded templates store zero vnormals; normalize(0)
            # has a NaN GRADIENT that jnp.where would still propagate
            # into d/d(inst_to_world) — substitute a unit vector first
            vn_safe = jnp.where(use_vn[..., None], vn_w,
                                jnp.array([0.0, 0.0, 1.0]))
            ns_i = jnp.where(use_vn[..., None], m.normalize(vn_safe),
                             ng_i)
            uv_t = (b0i[..., None] * g.tmpl_uvs[tf[:, 0]]
                    + uv_i[..., 0:1] * g.tmpl_uvs[tf[:, 1]]
                    + uv_i[..., 1:2] * g.tmpl_uvs[tf[:, 2]])
            uv_si = jnp.where(
                g.tmpl_hasuv[jnp.maximum(face, 0)][..., None], uv_t, uv_i)
            t = jnp.where(is_inst, t_i, t)
            p = jnp.where(is_inst[..., None], p_i, p)
            ng = jnp.where(is_inst[..., None], ng_i, ng)
            ns = jnp.where(is_inst[..., None], ns_i, ns)
            uv = jnp.where(is_inst[..., None], uv_si, uv)
            mat_inst = self.shape_material[jnp.maximum(sid_i, 0)]

        # ---- SDF grids (render/sdf.py; sdfgrid.cpp:337-456)
        mat_sdf = jnp.zeros((n,), jnp.int32)
        emi_sdf = jnp.full((n,), -1, jnp.int32)
        is_sdf = jnp.zeros((n,), bool)
        if self.sdfs:
            from . import sdf as _sdf
            n_ps = g.n_prims
            sg = jax.lax.stop_gradient
            for k, gs in enumerate(self.sdfs):
                mk = valid & (prim == n_ps + k)
                is_sdf = is_sdf | mk
                # detached local hit + tangent-plane reattachment:
                # t_diff = s(p_l) / dot(n, -d_l) grafts grid gradients
                # onto t (sdfgrid.cpp:390-420)
                # sanitize dead lanes (t = inf) so no NaN leaks through
                # the jnp.where merges into gradients
                t_safe = jnp.where(mk, pi.t, 0.0)
                p_det = sg(ray.o + ray.d * t_safe[..., None])
                p_l = jnp.clip(m.transform_point(gs.to_object, p_det),
                               0.0, 1.0)
                d_l = sg(m.transform_vector(gs.to_object, ray.d))
                n_l = m.normalize(_sdf.sdf_grad(gs, p_l))
                n_w = m.normalize(m.transform_normal(gs.to_object, n_l))
                sval = _sdf.sdf_value(gs, p_l)
                denom = m.dot(sg(n_l), -d_l)
                t_diff = sval / jnp.where(jnp.abs(denom) < 1e-9,
                                          jnp.where(denom >= 0, 1e-9, -1e-9),
                                          denom)
                t_k = m.replace_grad(pi.t, jnp.where(mk, t_diff, 0.0))
                p_k = ray.o + ray.d * jnp.where(mk, t_k, 0.0)[..., None]
                if gs.normal_mode == "smooth":
                    ns_k = m.normalize(m.transform_normal(
                        gs.to_object, _sdf.sdf_smooth_normal(gs, p_l)))
                else:
                    ns_k = n_w
                t = jnp.where(mk, t_k, t)
                p = jnp.where(mk[..., None], p_k, p)
                ng = jnp.where(mk[..., None], n_w, ng)
                ns = jnp.where(mk[..., None], ns_k, ns)
                uv = jnp.where(mk[..., None], 0.0, uv)
                mat_sdf = jnp.where(mk, self.shape_material[gs.shape_index],
                                    mat_sdf)
                emi_sdf = jnp.where(mk, self.shape_emitter[gs.shape_index],
                                    emi_sdf)

        # orient the geometric normal to the shading normal's hemisphere
        ng = m.mulsign(ng, m.dot(ng, ns)[..., None])
        s, tb = m.coordinate_system(ns)
        if tg_tri is not None:
            # fiber tangent frame: sh_t = tangent projected ⊥ ns,
            # sh_s = sh_t × ns (right-handed s×t=n); only on lanes whose
            # interpolated tangent is meaningful
            has_tg = is_tri & (m.dot(tg_tri, tg_tri) > 0.25)
            t_ax = m.normalize(tg_tri - m.dot(tg_tri, ns)[..., None] * ns)
            s_ax = m.normalize(jnp.cross(t_ax, ns))
            s = jnp.where(has_tg[..., None], s_ax, s)
            tb = jnp.where(has_tg[..., None], t_ax, tb)
        wi_world = -ray.d
        wi = m.frame_to_local(ns, s, tb, wi_world)

        shape_idx = jnp.where(valid, pi.shape_index, -1)
        mat = jnp.where(valid, jnp.where(is_tri, mat_tri,
                                         jnp.where(is_sdf, mat_sdf,
                                                   mat_sph)), -1)
        mat = jnp.where(is_inst, mat_inst, mat)
        emi = jnp.where(valid, jnp.where(is_tri, emi_tri,
                                         jnp.where(is_sdf, emi_sdf,
                                                   emi_sph)), -1)
        emi = jnp.where(is_inst, -1, emi)  # no emitters in groups

        return SurfaceInteraction(
            t=jnp.where(valid, t, jnp.inf),
            p=p, n=ng, sh_n=ns, sh_s=s, sh_t=tb, uv=uv, wi=wi,
            prim_index=jnp.where(valid, pi.prim_index, -1),
            shape_index=shape_idx, material_index=mat, emitter_index=emi,
            vattr=(jnp.where(is_tri[..., None], vc_tri, 0.0)
                   if vc_tri is not None else None))

    # ---------------- emitters ----------------

    def eval_emitter(self, si: SurfaceInteraction, active=None):
        """Radiance emitted at si toward si.wi (Emitter::eval for area
        emitters, src/emitters/area.cpp: one-sided, front face only)."""
        em = self.emitters
        e = jnp.maximum(si.emitter_index, 0)
        # ONE one-hot fetch for [radiance, tex]: per-lane row gathers
        # cost ~7.5 ms/Mlane·bounce on TPU (round-5 veach attribution);
        # tex ids are small ints, exact through f32
        pack = jnp.concatenate(
            [em.radiance, em.tex[:, None].astype(jnp.float32)], -1)
        a = m.take_rows(pack, e)
        rad = a[:, :3]
        tex = a[:, 3].astype(jnp.int32)
        from .texture import eval_spectrum_or_texture
        rad = eval_spectrum_or_texture(rad, tex, self.textures, si.uv)
        front = m.cos_theta(si.wi) > 0.0
        ok = (si.emitter_index >= 0) & front
        if active is not None:
            ok = ok & active
        return jnp.where(ok[..., None], rad, 0.0)

    def eval_environment(self, d):
        """Radiance of the escape-environment (constant or envmap) for
        rays that left the scene (Scene::environment()->eval)."""
        em = self.emitters
        if em.env_index < 0:
            return jnp.zeros(d.shape[:-1] + (3,))
        e = em.env_index
        rad = jnp.broadcast_to(em.radiance[e], d.shape[:-1] + (3,))
        # envmap: equirect lookup in emitter-local frame
        # (envmap.cpp eval: u = atan2(x, -z)/2pi, v = acos(y)/pi)
        d_local = m.transform_vector(em.to_world_inv[e], d)
        uv, _ = envmap_dir_to_uv(m.normalize(d_local))
        tex_id = em.tex[e]
        from .texture import eval_spectrum_or_texture
        val = eval_spectrum_or_texture(
            rad, jnp.broadcast_to(tex_id, d.shape[:-1]), self.textures, uv)
        is_env = E_ENVMAP in em.types_present
        if is_env:
            return val * em.radiance[e]  # scale factor for envmap
        return rad

    def pdf_emitter_hit(self, prev_si_p, si: SurfaceInteraction):
        """pdf of NEE having sampled the direction prev_si_p -> si.p when
        si lies on an area emitter; 0 if si is not emissive.

        Triangles: area pdf converted to solid angle.  Spheres seen from
        outside: the visible-cone pdf (sphere.cpp sample_direction), in
        exact agreement with sample_emitter_direction."""
        em = self.emitters
        g = self.geom
        F = g.faces.shape[0]
        # instanced/SDF prims index past the (n_prims,) tables and are
        # never emitters — clamp and zero them
        in_tbl = (si.prim_index >= 0) & (si.prim_index < g.n_prims)
        prim = jnp.clip(si.prim_index, 0, max(g.n_prims - 1, 0))
        # ONE one-hot fetch for [pdf_area, sphere center, sphere radius]
        # (sphere rows live at F..F+S-1 of the prim table): the three
        # separate per-lane row gathers here were the top cost of the
        # veach bounce body (round-5 attribution, ~20 ms/Mlane·bounce)
        S = g.sph_center.shape[0]
        P = em.prim_pdf_area.shape[0]
        pack = em.prim_pdf_area[:, None]
        if S > 0 and F + S <= P:
            cen = jnp.zeros((P, 3)).at[F:F + S].set(g.sph_center)
            rad = jnp.zeros((P, 1)).at[F:F + S].set(g.sph_radius[:, None])
            pack = jnp.concatenate([pack, cen, rad], -1)
        a = m.take_rows(pack, prim)
        pdf_area = jnp.where(in_tbl, a[:, 0], 0.0)
        delta = si.p - prev_si_p
        dist2 = m.squared_norm(delta)
        cos = jnp.abs(m.cos_theta(si.wi))
        pdf = m.safe_div(pdf_area * dist2, cos)

        if S > 0:
            if F + S <= P:
                c = a[:, 1:4]
                r = a[:, 4]
            else:
                sph = jnp.clip(prim - F, 0, S - 1)
                c = g.sph_center[sph]
                r = g.sph_radius[sph]
            dc = m.norm(c - prev_si_p)
            outside = dc > r * 1.0001
            sin2 = jnp.clip((r / jnp.maximum(dc, 1e-8)) ** 2, 0.0, 1.0)
            cos_max = m.safe_sqrt(1.0 - sin2)
            pick = pdf_area * (4.0 * jnp.pi * r * r)
            pdf_cone = m.safe_div(pick,
                                  2.0 * jnp.pi * jnp.maximum(1.0 - cos_max,
                                                             1e-8))
            is_sph = si.prim_index >= F
            pdf = jnp.where(is_sph & outside, pdf_cone, pdf)
        return pdf

    def pdf_environment_direction(self, d):
        """NEE pdf for escaping rays hitting the env emitter (MIS)."""
        em = self.emitters
        if em.env_index < 0:
            return jnp.zeros(d.shape[:-1])
        e = em.env_index
        # entry pick probability for the env pseudo-prim
        entry_p = em.ls_distr.pmf_normalized(
            jnp.full(d.shape[:-1], em.ls_prim.shape[0] - 1, jnp.int32))
        # NOTE(loader): env/const entry is appended last in the ls table.
        if E_ENVMAP in em.types_present:
            d_local = m.transform_vector(em.to_world_inv[e], d)
            uv, sin_t = envmap_dir_to_uv(m.normalize(d_local))
            pdf_uv = em.env_warp.pdf(uv)
            sin_t = jnp.maximum(sin_t, 1e-8)
            return entry_p * pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
        return entry_p * warp.INV_FOURPI

    def sample_emitter_direction(self, si: SurfaceInteraction, u2,
                                 test_visibility: bool = True):
        """NEE: jointly sample (emitter, prim), a point on it, shadow-test
        (Scene::sample_emitter_direction scene.cpp:295-348).

        Returns (DirectionSample, spec (N,3) = radiance * sampling weight
        with pdf already divided out).
        """
        em = self.emitters
        g = self.geom
        n = si.t.shape[0]
        F = g.faces.shape[0]
        S = g.sph_center.shape[0]

        entry, u_re = em.ls_distr.sample_reuse(u2[..., 0])
        entry_p = em.ls_distr.pmf_normalized(entry)
        u_pt = jnp.stack([u_re, u2[..., 1]], -1)

        # Pack every per-entry quantity into one (L, 29) matrix so the
        # per-lane lookup is a single gather (TPU gathers cost per row,
        # not per byte).  Row space over the light table L is tiny next
        # to the wavefront n.  Gradients to verts/radiance flow through.
        f32 = jnp.float32
        ls_p = em.ls_prim
        ls_e = em.ls_emitter
        L = ls_p.shape[0]
        is_tri_row = (ls_p >= 0) & (ls_p < F)
        if F > 0:
            trirow = jnp.clip(ls_p, 0, F - 1)
            fv = [jnp.where(is_tri_row[:, None],
                            g.verts[g.faces[trirow, k]], 0.0)
                  for k in range(3)]
        else:
            fv = [jnp.zeros((L, 3))] * 3
        if S > 0:
            sphrow = jnp.clip(ls_p - F, 0, S - 1)
            c_row = g.sph_center[sphrow]
            r_row = g.sph_radius[sphrow][:, None]
        else:
            c_row = jnp.zeros((L, 3))
            r_row = jnp.zeros((L, 1))
        tw_rows = em.to_world[ls_e]
        A = jnp.concatenate([
            em.e_type[ls_e][:, None].astype(f32),            # 0
            ls_p[:, None].astype(f32),                       # 1
            em.prim_pdf_area[jnp.maximum(ls_p, 0)][:, None],  # 2
            em.radiance[ls_e],                               # 3:6
            em.tex[ls_e][:, None].astype(f32),               # 6
            fv[0], fv[1], fv[2],                             # 7:16
            c_row,                                           # 16:19
            r_row,                                           # 19
            tw_rows[:, :3, 3],                               # 20:23 position
            tw_rows[:, :3, 2],                               # 23:26 z axis
            em.params[ls_e][:, 0:2],                         # 26:28
            ls_e[:, None].astype(f32),                       # 28
        ], axis=1)
        a = m.take_rows(A, entry)                     # (n, C)
        etype = a[:, 0].astype(jnp.int32)
        prim = a[:, 1].astype(jnp.int32)
        e_id = a[:, 28].astype(jnp.int32)
        rad_const = a[:, 3:6]
        pdf_area_e = a[:, 2]

        p = jnp.zeros((n, 3))
        n_l = jnp.zeros((n, 3))
        uv_l = jnp.zeros((n, 2))
        pdf_sa = jnp.zeros((n,))
        delta = jnp.zeros((n,), bool)
        spec = jnp.zeros((n, 3))
        d_out = jnp.zeros((n, 3))
        dist_out = jnp.full((n,), jnp.inf)

        def finish_surface(p_s, n_s, uv_s, area_pdf, rad, mask):
            """Convert an area sample to solid angle + accumulate."""
            nonlocal p, n_l, uv_l, pdf_sa, spec, d_out, dist_out
            delta_v = p_s - si.p
            dist = m.norm(delta_v)
            d = delta_v / jnp.maximum(dist[..., None], 1e-20)
            cos_l = -m.dot(d, n_s)
            pdf = m.safe_div(area_pdf * dist * dist, jnp.abs(cos_l))
            front = cos_l > 0.0
            val = jnp.where((front & (pdf > 0))[..., None],
                            rad / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
            sel = mask
            p = jnp.where(sel[..., None], p_s, p)
            n_l = jnp.where(sel[..., None], n_s, n_l)
            uv_l = jnp.where(sel[..., None], uv_s, uv_l)
            pdf_sa = jnp.where(sel & front, pdf, pdf_sa)
            spec = jnp.where(sel[..., None], val, spec)
            d_out = jnp.where(sel[..., None], d, d_out)
            dist_out = jnp.where(sel, dist, dist_out)

        types = em.types_present

        if E_AREA in types:
            mask = (etype == E_AREA) | (etype == E_DIRECTIONALAREA)
            is_tri = (prim >= 0) & (prim < F)
            # triangle sample (uniform area -> solid-angle conversion)
            if F > 0:
                p0, p1, p2 = a[:, 7:10], a[:, 10:13], a[:, 13:16]
                b = warp.square_to_uniform_triangle(u_pt)
                p_t = (1 - b[..., 0:1] - b[..., 1:2]) * p0 + b[..., 0:1] * p1 + b[..., 1:2] * p2
                n_t = m.normalize(jnp.cross(p1 - p0, p2 - p0))
                uv_t = b
            else:
                p_t = jnp.zeros((n, 3)); n_t = jnp.zeros((n, 3)); uv_t = jnp.zeros((n, 2))
            tex = a[:, 6].astype(jnp.int32)
            from .texture import eval_spectrum_or_texture
            rad = eval_spectrum_or_texture(rad_const, tex, self.textures, uv_t)
            finish_surface(p_t, n_t, uv_t, pdf_area_e, rad, mask & is_tri)

            # sphere emitters: visible-cone solid-angle sampling
            # (sphere.cpp sample_direction); area fallback when inside
            if S > 0:
                c = a[:, 16:19]
                r = a[:, 19]
                dc_v = c - si.p
                dc = m.norm(dc_v)
                outside = dc > r * 1.0001
                sin2 = jnp.clip((r / jnp.maximum(dc, 1e-8)) ** 2, 0.0, 1.0)
                cos_max = m.safe_sqrt(1.0 - sin2)
                dir_c = dc_v / jnp.maximum(dc[..., None], 1e-8)
                s_f, t_f = m.coordinate_system(dir_c)
                d_loc = warp.square_to_uniform_cone(u_pt, cos_max)
                d_cone = m.frame_to_world(dir_c, s_f, t_f, d_loc)
                from ..accel.traverse import ray_sphere
                t_hit, hit_s = ray_sphere(si.p, d_cone, c, r)
                # grazing cone rays can numerically miss: project instead
                t_safe = jnp.where(hit_s, t_hit, dc * cos_max)
                p_s = si.p + d_cone * t_safe[..., None]
                n_s = m.normalize(p_s - c)
                p_s = c + n_s * r[..., None]
                pick = pdf_area_e * (4.0 * jnp.pi * r * r)
                pdf_cone = m.safe_div(
                    pick, 2.0 * jnp.pi * jnp.maximum(1.0 - cos_max, 1e-8))
                sel = mask & ~is_tri & (prim >= 0) & outside
                dist_s = m.norm(p_s - si.p)
                val_s = jnp.where((pdf_cone > 0)[..., None],
                                  rad / jnp.maximum(pdf_cone, 1e-20)[..., None],
                                  0.0)
                p = jnp.where(sel[..., None], p_s, p)
                n_l = jnp.where(sel[..., None], n_s, n_l)
                pdf_sa = jnp.where(sel, pdf_cone, pdf_sa)
                spec = jnp.where(sel[..., None], val_s, spec)
                d_out = jnp.where(sel[..., None], d_cone, d_out)
                dist_out = jnp.where(sel, dist_s, dist_out)
                # inside the sphere: uniform-area fallback
                dir_u = warp.square_to_uniform_sphere(u_pt)
                p_u = c + dir_u * r[..., None]
                finish_surface(p_u, dir_u, u_pt, pdf_area_e, rad,
                               mask & ~is_tri & (prim >= 0) & ~outside)

        if E_POINT in types or E_SPOT in types or E_PROJECTOR in types:
            mask = (etype == E_POINT) | (etype == E_SPOT) | (etype == E_PROJECTOR)
            p_e = a[:, 20:23]
            delta_v = p_e - si.p
            dist = m.norm(delta_v)
            d = delta_v / jnp.maximum(dist[..., None], 1e-20)
            inten = rad_const
            fall = jnp.ones((n,))
            if E_SPOT in types:
                # spot falloff (src/emitters/spot.cpp): smooth between
                # beam_width and cutoff angles.  cos to the spot axis via
                # the world-space z column (exact for rigid to_world,
                # which look_at always produces)
                axis = m.normalize(a[:, 23:26])
                cos_dir = m.dot(axis, -d)
                cos_cut = a[:, 26]
                cos_beam = a[:, 27]
                tfall = m.safe_div(cos_dir - cos_cut, cos_beam - cos_cut)
                spot_fall = jnp.clip(tfall, 0.0, 1.0)
                fall = jnp.where(etype == E_SPOT, jnp.where(cos_dir > cos_cut, spot_fall, 0.0), fall)
            val = inten * (fall / jnp.maximum(dist * dist, 1e-20))[..., None]
            sel = mask
            p = jnp.where(sel[..., None], p_e, p)
            d_out = jnp.where(sel[..., None], d, d_out)
            dist_out = jnp.where(sel, dist, dist_out)
            pdf_sa = jnp.where(sel, entry_p, pdf_sa)
            delta = delta | sel
            spec = jnp.where(sel[..., None], val / jnp.maximum(entry_p, 1e-20)[..., None], spec)

        if E_DIRECTIONAL in types:
            mask = etype == E_DIRECTIONAL
            d = -m.normalize(a[:, 23:26])
            diam = m.norm(self.bbox_hi - self.bbox_lo) + 1.0
            sel = mask
            p = jnp.where(sel[..., None], si.p + d * diam, p)
            d_out = jnp.where(sel[..., None], d, d_out)
            dist_out = jnp.where(sel, diam, dist_out)
            pdf_sa = jnp.where(sel, entry_p, pdf_sa)
            delta = delta | sel
            spec = jnp.where(sel[..., None],
                             rad_const / jnp.maximum(entry_p, 1e-20)[..., None], spec)

        if E_CONSTANT in types or E_ENVMAP in types:
            mask = (etype == E_CONSTANT) | (etype == E_ENVMAP)
            if E_ENVMAP in types:
                uv_s, pdf_uv = em.env_warp.sample(u_pt)
                d_local, sin_t = envmap_uv_to_dir(uv_s)
                # a scene has one environment emitter: static index
                ei = em.env_index
                d = m.normalize(m.transform_vector(em.to_world[ei], d_local))
                sin_t = jnp.maximum(sin_t, 1e-8)
                pdf_dir = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
                rad = self.textures.eval_bilinear(
                    jnp.broadcast_to(jnp.maximum(em.tex[ei], 0), (n,)),
                    uv_s) * em.radiance[ei]
            else:
                d = warp.square_to_uniform_sphere(u_pt)
                pdf_dir = jnp.full((n,), warp.INV_FOURPI)
                rad = jnp.broadcast_to(rad_const, (n, 3))
            diam = m.norm(self.bbox_hi - self.bbox_lo) + 1.0
            pdf = entry_p * pdf_dir
            sel = mask
            p = jnp.where(sel[..., None], si.p + d * diam, p)
            d_out = jnp.where(sel[..., None], d, d_out)
            dist_out = jnp.where(sel, diam, dist_out)
            pdf_sa = jnp.where(sel, pdf, pdf_sa)
            spec = jnp.where(sel[..., None],
                             m.safe_div(rad, jnp.maximum(pdf, 1e-20)[..., None]), spec)

        # visibility
        if test_visibility:
            shadow_ray = si.spawn_ray_to(p)
            occluded = self.ray_test(shadow_ray)
            vis = ~occluded & (pdf_sa > 0)
            spec = jnp.where(vis[..., None], spec, 0.0)
            pdf_sa = jnp.where(vis, pdf_sa, 0.0)

        ds = DirectionSample(p=p, n=n_l, uv=uv_l, d=d_out, dist=dist_out,
                             pdf=pdf_sa, delta=delta, emitter_index=e_id)
        return ds, spec
