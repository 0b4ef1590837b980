"""Camera batch: perspective / thinlens / orthographic sensors.

Replaces the reference's Sensor/ProjectiveCamera hierarchy
(src/render/sensor.cpp, src/sensors/{perspective,thinlens,orthographic}.cpp)
and the fork's MultiSensor abstraction (include/mitsuba/render/sensor.h:
253-310): N cameras live as *stacked parameter arrays* and every query
takes a per-lane view index — the "gather<SensorPtr>" vcall of the
reference (grid.cpp:455-457) becomes a plain array gather.

Includes the fork-added ``sample_surface`` (sensor.h:93-116,
perspective.cpp:327-385): project a world-space point into view k,
returning film uv, the area-measure film pdf ``normalization/cos^3``,
and the semi-Jacobian ``Jp = cos_surf * pdf / dist^2`` that AMVPT's
per-view MIS weighting builds on (SURVEY.md §A.6).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m
from ..core import warp
from .records import Ray

S_PERSPECTIVE = 0
S_THINLENS = 1
S_ORTHOGRAPHIC = 2
S_RADIANCEMETER = 3   # single-direction probe (radiancemeter.cpp)
S_DISTANT = 4         # distant directional sensor (distant.cpp)
S_IRRADIANCEMETER = 5  # shape-attached irradiance probe (irradiancemeter.cpp;
#                        ray generation lives in the render driver since it
#                        samples the attached shape's surface)


@struct.dataclass
class CameraBatch:
    cam_type: jnp.ndarray      # (B,) int32
    to_world: jnp.ndarray      # (B, 4, 4)
    to_world_inv: jnp.ndarray  # (B, 4, 4)
    tan_half_fov: jnp.ndarray  # (B,) tan(fov_x / 2)
    lens_shift: jnp.ndarray    # (B, 2) sample-space shear (grid.cpp:182-205)
    aperture_radius: jnp.ndarray  # (B,)
    focus_dist: jnp.ndarray    # (B,)
    near_clip: jnp.ndarray     # (B,)
    # per-sensor auxiliary params; distant (distant.cpp): [0:3] = scene
    # bounding-sphere center (or target point), [3] = bsphere radius,
    # [4] = 1 if targeting a point (else cross-section sampling)
    aux: jnp.ndarray = None    # (B, 8)
    resolution: tuple = struct.field(pytree_node=False, default=(256, 256))
    # multi-view "quilt" layout (fork MultiSensor: n_sensors, grid_dim)
    grid_dim: tuple = struct.field(pytree_node=False, default=(1, 1))
    reverse_axis: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_sensors(self):
        return self.to_world.shape[0]

    @property
    def aspect(self):
        w, h = self.resolution
        return w / h

    @property
    def film_resolution(self):
        """Full film (quilt) size in pixels: per-view res x grid dims."""
        w, h = self.resolution
        return (w * self.grid_dim[0], h * self.grid_dim[1])

    # ------------------------------------------------------------------

    def _view_params(self, view):
        """ALL per-view scalar parameters in ONE one-hot fetch: each
        separate ``table[view]`` lookup lowers to a per-lane row gather
        (~2 ms/Mlane on TPU, round-4 measurement); sample_ray made 5 of
        them and sample_surface 7 per call."""
        f32 = jnp.float32
        parts = [self.cam_type[:, None].astype(f32),        # 0
                 self.tan_half_fov[:, None],                # 1
                 self.lens_shift,                           # 2:4
                 self.aperture_radius[:, None],             # 4
                 self.focus_dist[:, None],                  # 5
                 self.near_clip[:, None]]                   # 6
        if self.aux is not None:
            parts.append(self.aux)                          # 7:15
        a = m.take_rows(jnp.concatenate(parts, axis=1), view)
        out = dict(ct=a[..., 0].astype(jnp.int32), t=a[..., 1],
                   sh=a[..., 2:4], ap=a[..., 4], fd=a[..., 5],
                   nc=a[..., 6])
        if self.aux is not None:
            out["aux"] = a[..., 7:15]
        return out

    def _dir_cam_p(self, vp, uv):
        """Pinhole camera-space direction for film uv in [0,1]^2."""
        t = vp["t"]
        sh = vp["sh"]
        x = (1.0 - 2.0 * (uv[..., 0] - sh[..., 0])) * t
        y = (1.0 - 2.0 * (uv[..., 1] - sh[..., 1])) * t / self.aspect
        return jnp.stack([x, y, jnp.ones_like(x)], -1)

    def _dir_cam(self, view, uv):
        return self._dir_cam_p(self._view_params(view), uv)

    def sample_ray(self, view, uv, u_lens):
        """(view (N,), uv (N,2) in per-view [0,1]^2, aperture sample) ->
        (Ray, weight (N,3)).  Matches perspective.cpp:205-241 /
        thinlens.cpp sample_ray; importance weight is 1."""
        vp = self._view_params(view)
        ct = vp["ct"]
        d_pin = self._dir_cam_p(vp, uv)

        # perspective / thinlens share the pinhole direction
        p_lens2 = warp.square_to_uniform_disk_concentric(u_lens) \
            * vp["ap"][..., None]
        is_tl = ct == S_THINLENS
        o_cam = jnp.where(
            is_tl[..., None],
            jnp.stack([p_lens2[..., 0], p_lens2[..., 1],
                       jnp.zeros_like(p_lens2[..., 0])], -1),
            jnp.zeros(d_pin.shape))
        # focus-plane target for thinlens
        fd = vp["fd"]
        target = d_pin * fd[..., None]  # d_pin.z == 1
        d_cam = jnp.where(is_tl[..., None], target - o_cam, d_pin)

        # radiancemeter / distant: every sample shares the +z direction
        is_rm = (ct == S_RADIANCEMETER) | (ct == S_DISTANT)
        d_cam = jnp.where(is_rm[..., None],
                          jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]),
                                           d_cam.shape), d_cam)
        o_cam = jnp.where(is_rm[..., None], jnp.zeros_like(o_cam), o_cam)

        # orthographic: origin on the film plane, direction +z
        is_ortho = ct == S_ORTHOGRAPHIC
        o_ortho = jnp.stack([(1.0 - 2.0 * uv[..., 0]),
                             (1.0 - 2.0 * uv[..., 1]) / self.aspect,
                             jnp.zeros_like(uv[..., 0])], -1)
        o_cam = jnp.where(is_ortho[..., None], o_ortho, o_cam)
        d_cam = jnp.where(is_ortho[..., None],
                          jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), d_cam.shape),
                          d_cam)

        # per-column indexed transforms: gathering (N, 4, 4) matrices
        # costs 32x tile-padded HBM on TPU (core/math.py note)
        o = m.transform_point_indexed(self.to_world, view, o_cam)
        d = m.normalize(
            m.transform_vector_indexed(self.to_world, view, d_cam))

        # distant sensor (distant.cpp:196-232): origin placed outside the
        # scene, targeting either a fixed point or the bounding-sphere
        # cross section perpendicular to the direction
        is_dist = ct == S_DISTANT
        if self.aux is not None:
            aux = vp["aux"]
            center = aux[..., 0:3]
            radius = aux[..., 3:4]
            is_pt = aux[..., 4:5] > 0.5
            disk = warp.square_to_uniform_disk_concentric(u_lens)
            perp = m.transform_vector_indexed(
                self.to_world, view,
                jnp.stack([disk[..., 0], disk[..., 1],
                           jnp.zeros_like(disk[..., 0])], -1))
            o_none = center + perp * radius - d * radius
            o_tgt = center - 2.0 * radius * d
            o = jnp.where(is_dist[..., None],
                          jnp.where(is_pt, o_tgt, o_none), o)

        weight = jnp.ones(d.shape[:-1] + (3,))
        return Ray.make(o, d), weight

    # ------------------------------------------------------------------

    def sample_surface(self, view, p_world, n_world, u_lens):
        """Fork API sensor.h:93-116: connect surface point -> camera.

        Returns dict with:
          uv       film coordinates in [0,1]^2 (valid iff ``visible``)
          d        unit direction surface -> camera point
          dist     distance
          pdf      area-measure film pdf = normalization / cos^3
                   (perspective.cpp:357-366)
          Jp       semi-Jacobian cos_surf * pdf / dist^2 (:383)
          visible  in-frustum & surface faces the camera
        """
        vp = self._view_params(view)
        ct = vp["ct"]
        is_tl = ct == S_THINLENS
        p_lens2 = warp.square_to_uniform_disk_concentric(u_lens) \
            * vp["ap"][..., None]
        o_cam = jnp.where(
            is_tl[..., None],
            jnp.stack([p_lens2[..., 0], p_lens2[..., 1],
                       jnp.zeros_like(p_lens2[..., 0])], -1),
            jnp.zeros(p_world.shape))
        o_world = m.transform_point_indexed(self.to_world, view, o_cam)

        delta = o_world - p_world
        dist = m.norm(delta)
        d = delta / jnp.maximum(dist[..., None], 1e-20)

        # project: direction camera -> surface, in camera space
        p_cam = m.transform_point_indexed(self.to_world_inv, view,
                                          p_world)
        rel = p_cam - o_cam
        z = rel[..., 2]
        behind = z <= vp["nc"]
        t = vp["t"]
        sh = vp["sh"]
        # thinlens focuses through the lens point: uv determined by the
        # focus-plane intersection of the line o_cam -> p_cam
        fd = jnp.where(is_tl, vp["fd"], jnp.ones_like(z))
        scale_f = jnp.where(is_tl, fd / jnp.maximum(z, 1e-8), 1.0 / jnp.maximum(z, 1e-8))
        fp = o_cam + rel * scale_f[..., None]   # point at z = fd (or 1)
        xz = fp[..., 0] / jnp.maximum(fd, 1e-8)
        yz = fp[..., 1] / jnp.maximum(fd, 1e-8)
        u = 0.5 * (1.0 - xz / t) + sh[..., 0]
        v = 0.5 * (1.0 - yz * self.aspect / t) + sh[..., 1]
        uv = jnp.stack([u, v], -1)

        in_frustum = (~behind & (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0))
        # film-area pdf (importance): normalization / cos^3
        # image rect volume in the z=1 plane = (2t)(2t/aspect)
        normalization = self.aspect / (4.0 * t * t)
        cos_cam = z / jnp.maximum(m.norm(rel), 1e-20)
        pdf_film = m.safe_div(normalization, jnp.maximum(cos_cam, 1e-8) ** 3)
        if True:  # thinlens aperture pdf factor (thinlens.cpp:372-416)
            ap_area = jnp.pi * vp["ap"] ** 2
            pdf_film = jnp.where(is_tl & (ap_area > 0),
                                 pdf_film / jnp.maximum(ap_area, 1e-20), pdf_film)
        cos_surf = m.dot(d, n_world)
        face = cos_surf > 0.0      # which surface side the camera sees
        Jp = m.safe_div(jnp.abs(cos_surf) * pdf_film, dist * dist)
        return dict(uv=uv, d=d, dist=dist, pdf=pdf_film, Jp=Jp,
                    visible=in_frustum, face=face, p=o_world)

    # ------------------------------------------------------------------
    # quilt layout (fork GridSensor grid.cpp:269-297 sample_ray_idx)
    # ------------------------------------------------------------------

    def quilt_decode(self, pos_uv):
        """Film-global uv in [0,1]^2 -> (view index, intra-tile uv)."""
        gx, gy = self.grid_dim
        fx = pos_uv[..., 0] * gx
        fy = pos_uv[..., 1] * gy
        ix = jnp.clip(fx.astype(jnp.int32), 0, gx - 1)
        iy = jnp.clip(fy.astype(jnp.int32), 0, gy - 1)
        iy_idx = (gy - 1 - iy) if self.reverse_axis else iy
        view = jnp.clip(iy_idx * gx + ix, 0, self.n_sensors - 1)
        uv = jnp.stack([fx - ix, fy - iy], -1)
        return view, uv

    def quilt_tile_origin(self, view):
        """View index -> film-pixel origin of its quilt tile."""
        gx, gy = self.grid_dim
        w, h = self.resolution
        iy_idx = view // gx
        ix = view % gx
        iy = (gy - 1 - iy_idx) if self.reverse_axis else iy_idx
        return jnp.stack([ix * w, iy * h], -1)


def make_camera_batch(to_world_list, fov_x_deg, resolution,
                      cam_type=S_PERSPECTIVE, lens_shift=None,
                      aperture_radius=0.0, focus_dist=1.0, near_clip=1e-2,
                      grid_dim=(1, 1), reverse_axis=False,
                      aux=None) -> CameraBatch:
    tw = np.asarray(to_world_list, np.float32).reshape(-1, 4, 4)
    B = tw.shape[0]
    inv = np.linalg.inv(tw.astype(np.float64)).astype(np.float32)

    def bcast(x):
        return np.broadcast_to(np.asarray(x, np.float32), (B,)).copy()

    fov = np.deg2rad(bcast(fov_x_deg))
    ls = np.zeros((B, 2), np.float32) if lens_shift is None \
        else np.broadcast_to(np.asarray(lens_shift, np.float32), (B, 2)).copy()
    return CameraBatch(
        cam_type=jnp.broadcast_to(jnp.asarray(cam_type, jnp.int32), (B,)),
        to_world=jnp.asarray(tw), to_world_inv=jnp.asarray(inv),
        tan_half_fov=jnp.tan(jnp.asarray(fov) / 2.0),
        lens_shift=jnp.asarray(ls),
        aperture_radius=jnp.asarray(bcast(aperture_radius)),
        focus_dist=jnp.asarray(bcast(focus_dist)),
        near_clip=jnp.asarray(bcast(near_clip)),
        aux=jnp.zeros((B, 8), jnp.float32) if aux is None
        else jnp.broadcast_to(jnp.asarray(aux, jnp.float32), (B, 8)),
        resolution=tuple(resolution), grid_dim=tuple(grid_dim),
        reverse_axis=reverse_axis)
