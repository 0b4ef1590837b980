"""Wavefront ray-scene intersection in JAX.

Device-side counterpart of the reference's accel backends
(src/render/scene_embree.inl rtcIntersect / scene_optix.inl /
kdtree.h ray_intersect).  Two strategies, chosen at scene build time:

* ``brute``: all-pairs ray x primitive test, tiled over primitives with
  ``lax.scan``.  For scenes up to a few thousand primitives this is the
  right call on TPU — it is pure dense vector math on the VPU with zero
  divergence, no gathers, and XLA fuses the whole sweep.
* ``bvh``: lockstep stack-based BVH2 traversal under ``lax.while_loop``
  (short stack in a (N, DEPTH) register array).  Needed for large
  scenes where brute force is O(N_rays * N_prims).

Both return a detached PreliminaryIntersection; differentiable
SurfaceInteraction reconstruction happens in render/scene.py
(SURVEY.md §A.1 grad re-attachment).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core import math as m
from ..render.records import PreliminaryIntersection

STACK_DEPTH = 48
MAX_LEAF = 4


def ray_triangle(o, d, p0, p1, p2, eps=0.0):
    """Möller-Trumbore. All args broadcastable (..., 3).

    Returns (t, u, v, hit) with t = inf on miss.  Matches the
    reference's Mesh::ray_intersect_triangle (mesh.h:467).
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(d, e2)
    det = m.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - p0
    u = m.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = m.dot(d, qvec) * inv_det
    t = m.dot(e2, qvec) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps)
           & (u + v <= 1.0 + eps) & (t > 0.0))
    return jnp.where(hit, t, jnp.inf), u, v, hit


def ray_sphere(o, d, center, radius):
    """Analytic sphere hit (src/shapes/sphere.cpp); returns nearest
    positive t (inf on miss)."""
    L = o - center
    b = 2.0 * m.dot(d, L)
    c = m.squared_norm(L) - radius * radius
    disc = b * b - 4.0 * c
    sq = m.safe_sqrt(disc)
    t0 = 0.5 * (-b - sq)
    t1 = 0.5 * (-b + sq)
    t = jnp.where(t0 > 0.0, t0, t1)
    hit = (disc >= 0.0) & (t > 0.0)
    return jnp.where(hit, t, jnp.inf), hit


def ray_aabb(o, inv_d, lo, hi, maxt):
    """Slab test; returns (tnear, intersects)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < maxt)
    return tmin, hit


# ---------------------------------------------------------------------------
# Brute-force sweep (scan over primitive tiles)
# ---------------------------------------------------------------------------

def intersect_brute(geom, o, d, maxt, tile: int = 128,
                    any_hit: bool = False):
    """All-pairs sweep. geom is a GeometryArrays (see render/scene.py).

    On TPU the triangle sweep runs as a Pallas kernel with the soup
    resident in VMEM (ops/isect.py); elsewhere (CPU tests) a lax.scan
    over primitive tiles carries the best hit.
    """
    tri_p0, tri_p1, tri_p2 = geom.tri_p0, geom.tri_p1, geom.tri_p2
    F = tri_p0.shape[0]
    n = o.shape[0]

    # derive every init from the (possibly device-varying) ray arrays so
    # the scan carry types agree under shard_map's varying-axes check
    # (maxt alone may be an unvarying constant like full(inf))
    best_t = jnp.minimum(o[:, 0] * 0.0 + jnp.inf, maxt)
    best = (best_t, o[:, :2] * 0.0,
            (o[:, 0] * 0.0 - 1.0).astype(jnp.int32))

    use_pallas = (jax.default_backend() == "tpu"
                  and 0 < F and F * 36 <= (8 << 20))
    if use_pallas and F <= 64:
        # tiny scenes: triangles on sublanes (pad to 8, not 128) — a
        # 36-tri Cornell tests 40 rows instead of 128 lanes (~3x fewer).
        # (An MXU Plücker-matmul variant was tried and measured 13.7 ms
        # vs 1.0 ms/query: K=16 contractions starve the systolic array
        # and f32 needs Precision.HIGHEST; the VPU row sweep wins.)
        from ..ops.isect import pack_tri_rows, ray_triangles_pallas_rows
        rows = pack_tri_rows(tri_p0, tri_p1, tri_p2)
        t, u, v, pid = ray_triangles_pallas_rows(
            o, d, jnp.minimum(maxt, best_t), rows, any_hit=any_hit)
        upd = jnp.isfinite(t)
        best = (jnp.where(upd, t, best[0]),
                jnp.where(upd[:, None], jnp.stack([u, v], -1), best[1]),
                jnp.where(upd, pid, best[2]))
    elif use_pallas:
        from ..ops.isect import pack_tri_soa, ray_triangles_pallas
        soa = pack_tri_soa(tri_p0, tri_p1, tri_p2)
        t, u, v, pid = ray_triangles_pallas(o, d, jnp.minimum(maxt, best_t),
                                            soa, any_hit=any_hit)
        upd = jnp.isfinite(t)
        best = (jnp.where(upd, t, best[0]),
                jnp.where(upd[:, None], jnp.stack([u, v], -1), best[1]),
                jnp.where(upd, pid, best[2]))
    elif F > 0:
        pad = (-F) % tile
        p0 = jnp.pad(tri_p0, ((0, pad), (0, 0)))
        p1 = jnp.pad(tri_p1, ((0, pad), (0, 0)))
        p2 = jnp.pad(tri_p2, ((0, pad), (0, 0)), constant_values=0.0)
        valid = jnp.pad(jnp.ones((F,), bool), (0, pad))
        n_tiles = (F + pad) // tile
        p0 = p0.reshape(n_tiles, tile, 3)
        p1 = p1.reshape(n_tiles, tile, 3)
        p2 = p2.reshape(n_tiles, tile, 3)
        valid = valid.reshape(n_tiles, tile)
        tile_ids = jnp.arange(n_tiles)

        def body(carry, xs):
            bt, buv, bprim = carry
            q0, q1, q2, val, tid = xs
            t, u, v, hit = ray_triangle(o[:, None, :], d[:, None, :],
                                        q0[None], q1[None], q2[None])
            t = jnp.where(val[None, :], t, jnp.inf)
            t = jnp.where(t < bt[:, None], t, jnp.inf)
            # min + one-hot select, NOT take_along_axis: a per-lane
            # row gather costs ~2 ms/Mlane on TPU (measured as the
            # entire Veach slowdown at the sphere-merge site below)
            k = jnp.argmin(t, axis=1)
            tk = jnp.min(t, axis=1)
            upd = jnp.isfinite(tk)
            oh = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) \
                == k[:, None]
            uk = jnp.sum(jnp.where(oh, u, 0.0), axis=1)
            vk = jnp.sum(jnp.where(oh, v, 0.0), axis=1)
            bt = jnp.where(upd, tk, bt)
            buv = jnp.where(upd[:, None], jnp.stack([uk, vk], -1), buv)
            bprim = jnp.where(upd, tid * tile + k, bprim)
            return (bt, buv, bprim), None

        best, _ = jax.lax.scan(body, best, (p0, p1, p2, valid, tile_ids))

    best_t, best_uv, best_prim = best

    S = geom.sph_center.shape[0]
    if S > 0:
        t, hit = ray_sphere(o[:, None, :], d[:, None, :],
                            geom.sph_center[None], geom.sph_radius[None])
        t = jnp.where(t < best_t[:, None], t, jnp.inf)
        # min-reduce, NOT argmin + take_along_axis: the row gather ran
        # once per query and cost ~8 ms/Mlane-query — it alone made
        # Veach (4 passive spheres) 3.9x slower than Cornell
        k = jnp.argmin(t, axis=1)
        tk = jnp.min(t, axis=1)
        upd = jnp.isfinite(tk)
        best_t = jnp.where(upd, tk, best_t)
        best_prim = jnp.where(upd, F + k, best_prim)
        best_uv = jnp.where(upd[:, None], jnp.zeros_like(best_uv), best_uv)

    hit_valid = jnp.isfinite(best_t) & (best_t < maxt)
    return best_t, best_uv, jnp.where(hit_valid, best_prim, -1)


# ---------------------------------------------------------------------------
# BVH traversal (lockstep while_loop with per-lane stack)
# ---------------------------------------------------------------------------

def intersect_bvh(geom, o, d, maxt, any_hit: bool = False):
    """Stack-based BVH2 traversal; returns (t, uv, prim) like brute."""
    n = o.shape[0]
    lanes = jnp.arange(n)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    bbox = geom.bvh_bbox          # (M, 2, 3)
    meta = geom.bvh_meta          # (M, 2)
    prim_ids = geom.bvh_prim_ids  # (P,) leaf order -> global prim id
    F = geom.tri_p0.shape[0]

    stack0 = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    sptr0 = jnp.ones((n,), jnp.int32)
    t0 = jnp.minimum(jnp.full((n,), jnp.inf), maxt)
    state0 = (stack0, sptr0, t0, jnp.zeros((n, 2)), jnp.full((n,), -1, jnp.int32))

    def cond(state):
        _, sptr, _, _, _ = state
        return jnp.any(sptr > 0)

    def cond_any(state):
        _, sptr, _, _, bprim = state
        return jnp.any((sptr > 0) & (bprim < 0))

    def body(state):
        stack, sptr, bt, buv, bprim = state
        if any_hit:
            active = (sptr > 0) & (bprim < 0)
        else:
            active = sptr > 0
        top = jnp.maximum(sptr - 1, 0)
        node = stack[lanes, top]
        node = jnp.where(active, node, 0)
        sptr = jnp.where(active, sptr - 1, sptr)

        nb = bbox[node]                        # (n, 2, 3)
        nm = meta[node]                        # (n, 2)
        is_leaf = nm[:, 1] > 0

        # --- interior: test children, push near last (popped first)
        c0 = node + 1
        c1 = nm[:, 0]
        b0 = bbox[c0]
        b1 = bbox[c1]
        t_near0, h0 = ray_aabb(o, inv_d, b0[:, 0], b0[:, 1], bt)
        t_near1, h1 = ray_aabb(o, inv_d, b1[:, 0], b1[:, 1], bt)
        swap = t_near1 < t_near0
        near = jnp.where(swap, c1, c0)
        far = jnp.where(swap, c0, c1)
        h_near = jnp.where(swap, h1, h0)
        h_far = jnp.where(swap, h0, h1)

        inter = active & ~is_leaf
        push_far = inter & h_far
        stack = stack.at[lanes, jnp.minimum(sptr, STACK_DEPTH - 1)].set(
            jnp.where(push_far, far, stack[lanes, jnp.minimum(sptr, STACK_DEPTH - 1)]))
        sptr = jnp.where(push_far, sptr + 1, sptr)
        push_near = inter & h_near
        stack = stack.at[lanes, jnp.minimum(sptr, STACK_DEPTH - 1)].set(
            jnp.where(push_near, near, stack[lanes, jnp.minimum(sptr, STACK_DEPTH - 1)]))
        sptr = jnp.where(push_near, sptr + 1, sptr)

        # --- leaf: up to MAX_LEAF prims
        first = nm[:, 0]
        count = nm[:, 1]
        leaf = active & is_leaf
        for k in range(MAX_LEAF):
            pid_slot = jnp.clip(first + k, 0, prim_ids.shape[0] - 1)
            gp = prim_ids[pid_slot]
            pvalid = leaf & (k < count)
            is_tri = gp < F
            tri = jnp.clip(gp, 0, jnp.maximum(F - 1, 0))
            if F > 0:
                tt, u, v, th = ray_triangle(o, d, geom.tri_p0[tri],
                                            geom.tri_p1[tri], geom.tri_p2[tri])
            else:
                tt = jnp.full((n,), jnp.inf); u = v = jnp.zeros((n,)); th = jnp.zeros((n,), bool)
            if geom.sph_center.shape[0] > 0:
                sph = jnp.clip(gp - F, 0, geom.sph_center.shape[0] - 1)
                st, sh = ray_sphere(o, d, geom.sph_center[sph], geom.sph_radius[sph])
            else:
                st = jnp.full((n,), jnp.inf); sh = jnp.zeros((n,), bool)
            pt = jnp.where(is_tri, tt, st)
            ph = jnp.where(is_tri, th, sh)
            upd = pvalid & ph & (pt < bt)
            bt = jnp.where(upd, pt, bt)
            buv = jnp.where(upd[:, None],
                            jnp.where(is_tri[:, None], jnp.stack([u, v], -1),
                                      jnp.zeros((n, 2))), buv)
            bprim = jnp.where(upd, gp, bprim)
        return stack, sptr, bt, buv, bprim

    state = jax.lax.while_loop(cond_any if any_hit else cond, body, state0)
    _, _, bt, buv, bprim = state
    hit_valid = jnp.isfinite(bt) & (bt < maxt)
    return bt, buv, jnp.where(hit_valid, bprim, -1)


def _morton3(x, y, z):
    """Interleave 3x8-bit cell coords into a 24-bit Morton code."""
    def spread(v):
        v = v & 0xFF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _ray_sort_keys(o, d, lo, hi):
    """Coherence keys for ray binning: octant | coarse-origin Morton |
    quantized direction | fine-origin Morton.

    The direction bits are the load-bearing part for SECONDARY rays:
    diffuse-bounce wavefronts share a small origin region but spray
    directions over the hemisphere, and a block whose rays share only
    an origin cell admits a huge tile set in the streamed tracer's
    group-interval cull (measured 0.7 Mrays/s at 250k tris vs 740 for
    coherent primaries).  Binning by (coarse origin, direction cone)
    makes each 1024-ray block a narrow frustum again.  Direction within
    the octant is parametrized by the normalized L1 coordinates
    u = |dx|/(|dx|+|dy|+|dz|), v = |dy|/(...) quantized to 4 bits each."""
    extent = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((o - lo) / extent * 255.0).astype(jnp.uint32), 0, 255)
    octant = ((d[..., 0] >= 0).astype(jnp.uint32)
              | ((d[..., 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[..., 2] >= 0).astype(jnp.uint32) << 2))
    mo = _morton3(cell[..., 0], cell[..., 1], cell[..., 2])   # 24 bits
    coarse = mo >> 15                                          # 9 bits
    fine = (mo >> 3) & jnp.uint32(0xFFF)                       # 12 bits
    ad = jnp.abs(d)
    s = jnp.maximum(ad[..., 0] + ad[..., 1] + ad[..., 2], 1e-20)
    du = jnp.clip((ad[..., 0] / s * 16.0).astype(jnp.uint32), 0, 15)
    dv = jnp.clip((ad[..., 1] / s * 16.0).astype(jnp.uint32), 0, 15)
    dirb = (du << 4) | dv                                      # 8 bits
    return (octant << 29) | (coarse << 20) | (dirb << 12) | fine


def uses_binned(geom) -> bool:
    """Whether intersect_tiled routes this geometry through the binned
    tracer (size threshold or MT_FORCE_BINNED, see below)."""
    import os
    F = geom.faces.shape[0]
    return (geom.tile_starts is not None
            and (F * 36 > (6 << 20)
                 or os.environ.get("MT_FORCE_BINNED") == "1")
            and os.environ.get("MT_LARGE_TRACER", "binned") == "binned")


def build_binned_cache(geom):
    """Precompute the binned-tracer tables onto the geometry pytree.

    pack_binned gathers the whole permuted triangle soup; leaving it
    inline in the trace call re-ran those gathers EVERY bounce (XLA
    does not hoist them out of the sampling while-loop) — ~350 ms per
    1M-tri bigscene frame.  Called once at scene build (dict_loader)
    and again by ad.update_scene when vertices change."""
    if not uses_binned(geom):
        return geom
    from ..ops.binned_trace import pack_binned
    order = geom.tri_order
    p0 = geom.tri_p0[order]
    p1 = geom.tri_p1[order]
    p2 = geom.tri_p2[order]
    soa, sup_ab, tile_c, ns, nt, pmap = pack_binned(
        p0, p1, p2, tile_starts=geom.tile_starts)
    return geom.replace(bt_soa=soa, bt_sup=sup_ab, bt_tilec=tile_c,
                        bt_pmap=pmap, bt_ns=ns, bt_nt=nt)


def intersect_tiled(geom, o, d, maxt, any_hit: bool = False,
                    sort_rays: bool = True):
    """Large-scene tiled-cull sweep (ops/isect.py): triangles permuted
    into BVH-leaf order, per-tile AABB block culling, dense VPU tests.
    Rays are Morton-sorted so blocks stay coherent for the culling."""
    import os

    from ..ops.isect import pack_tiles, ray_triangles_tiled
    order = geom.tri_order
    # VMEM-resident soup up to ~6 MB; beyond that, the sort-based
    # binned tracer (ops/binned_trace.py) — per-ray front-to-back tile
    # traversal whose cost tracks true (ray, tile) incidence.  The
    # cull-then-pop streamer (ops/stream_trace.py) remains available
    # via MT_LARGE_TRACER=stream (its block-union work model loses on
    # incoherent bounce wavefronts; measured in GAPS.md round-2 delta).
    F = geom.faces.shape[0]
    # MT_FORCE_BINNED=1 routes even small scenes through the binned
    # tracer (CPU integration tests of the spectral x views x binned
    # triple; interpret mode is slow, so tests keep scenes tiny)
    if (F * 36 > (6 << 20)
            or os.environ.get("MT_FORCE_BINNED") == "1"):
        if os.environ.get("MT_LARGE_TRACER", "binned") == "stream":
            from ..ops.stream_trace import (pack_tri_soa16,
                                            ray_triangles_streamed,
                                            tile_bounds16)
            p0 = geom.tri_p0[order]
            p1 = geom.tri_p1[order]
            p2 = geom.tri_p2[order]
            soa = pack_tri_soa16(p0, p1, p2)
            tb = tile_bounds16(p0, p1, p2)
            trace = ray_triangles_streamed
        else:
            from ..ops.binned_trace import (pack_binned,
                                            ray_triangles_binned)
            if geom.bt_soa is not None:
                # tables precomputed once at scene build
                # (build_binned_cache) — repacking here re-gathered the
                # full soup per bounce
                soa_b, sup_ab, tile_c = (geom.bt_soa, geom.bt_sup,
                                         geom.bt_tilec)
                ns, nt, pmap = geom.bt_ns, geom.bt_nt, geom.bt_pmap
            else:
                p0 = geom.tri_p0[order]
                p1 = geom.tri_p1[order]
                p2 = geom.tri_p2[order]
                soa_b, sup_ab, tile_c, ns, nt, pmap = pack_binned(
                    p0, p1, p2, tile_starts=geom.tile_starts)

            def trace(o, d, maxt, soa, tb, any_hit=False):
                return ray_triangles_binned(o, d, maxt, soa_b, sup_ab,
                                            tile_c, ns, nt,
                                            any_hit=any_hit,
                                            prim_map=pmap)

            soa = tb = None
            # binned needs no ray pre-sorting: run coherence comes from
            # the global per-round tile-key sort
            sort_rays = False
    else:
        p0 = geom.tri_p0[order]
        p1 = geom.tri_p1[order]
        p2 = geom.tri_p2[order]
        soa, tb = pack_tiles(p0, p1, p2)
        trace = ray_triangles_tiled

    if sort_rays:
        lo = jnp.min(tb[:3].min(1), 0)
        hi = jnp.max(tb[3:].max(1), 0)
        keys = _ray_sort_keys(o, d, lo, hi)
        perm = jnp.argsort(keys)
        o_s, d_s, maxt_s = o[perm], d[perm], maxt[perm]
        t, u, v, cid = trace(o_s, d_s, maxt_s, soa, tb, any_hit=any_hit)
        inv = jnp.argsort(perm)
        t, u, v, cid = t[inv], u[inv], v[inv], cid[inv]
    else:
        t, u, v, cid = trace(o, d, maxt, soa, tb, any_hit=any_hit)
    prim = jnp.where(cid >= 0, order[jnp.maximum(cid, 0)], -1)
    best = (t, jnp.stack([u, v], -1), prim)

    S = geom.sph_center.shape[0]
    if S > 0:
        ts, hit = ray_sphere(o[:, None, :], d[:, None, :],
                             geom.sph_center[None], geom.sph_radius[None])
        ts = jnp.where(ts < jnp.minimum(best[0], maxt)[:, None], ts, jnp.inf)
        k = jnp.argmin(ts, axis=1)
        tk = jnp.min(ts, axis=1)
        upd = jnp.isfinite(tk)
        F = geom.tri_p0.shape[0]
        best = (jnp.where(upd, tk, best[0]),
                jnp.where(upd[:, None], jnp.zeros_like(best[1]), best[1]),
                jnp.where(upd, F + k, best[2]))
    t, uv, prim = best
    hit_valid = jnp.isfinite(t) & (t < maxt)
    return t, uv, jnp.where(hit_valid, prim, -1)


# instanced prim ids start far above F + S so SDF prims (which the
# Scene layer appends at [F + S, F + S + n_sdfs)) never collide
INST_PRIM_PAD = 4096


def inst_prim_base(geom):
    return geom.tri_p0.shape[0] + geom.sph_center.shape[0] \
        + INST_PRIM_PAD


def _intersect_instances(geom, o, d, maxt, best):
    """Fold TRUE-instanced geometry (src/shapes/instance.cpp) into a
    closest-hit result: scan over instances, transform the ray into
    the instance frame (unnormalized direction keeps the world-t
    parametrization for any affine transform), brute-sweep the
    group's template faces.  O(N * Fg_max) per instance — the
    correctness path; large instanced scenes should keep per-group
    triangle counts moderate (the binned tracer sees instanced
    geometry only through this stage for now, a documented perf
    limitation)."""
    bt, buv, bprim = best
    base = inst_prim_base(geom)
    tv = geom.tmpl_verts
    tf = geom.tmpl_faces
    poff = geom.inst_prim_off

    def body(carry, xs):
        bt, buv, bprim = carry
        to_obj, fidx, p_base = xs
        o2 = o @ to_obj[:3, :3].T + to_obj[:3, 3]
        d2 = d @ to_obj[:3, :3].T
        valid_f = fidx >= 0
        ff = tf[jnp.maximum(fidx, 0)]
        p0, p1, p2 = tv[ff[:, 0]], tv[ff[:, 1]], tv[ff[:, 2]]
        t, u, v, hit = ray_triangle(o2[:, None, :], d2[:, None, :],
                                    p0[None], p1[None], p2[None])
        t = jnp.where(hit & valid_f[None, :], t, jnp.inf)
        t = jnp.where(t < jnp.minimum(bt, maxt)[:, None], t, jnp.inf)
        k = jnp.argmin(t, axis=1)
        tk = jnp.min(t, axis=1)
        upd = jnp.isfinite(tk)
        oh = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == k[:, None]
        uk = jnp.sum(jnp.where(oh, u, 0.0), axis=1)
        vk = jnp.sum(jnp.where(oh, v, 0.0), axis=1)
        bt = jnp.where(upd, tk, bt)
        buv = jnp.where(upd[:, None], jnp.stack([uk, vk], -1), buv)
        bprim = jnp.where(upd, base + p_base + k, bprim)
        return (bt, buv, bprim), None

    (bt, buv, bprim), _ = jax.lax.scan(
        body, (bt, buv, bprim),
        (geom.inst_to_object, geom.inst_face_idx, poff[:-1]))
    return bt, buv, bprim


def instanced_shape_index(geom, prim):
    """Shape id for instanced prim ids (>= inst_prim_base)."""
    ip = jnp.maximum(prim - inst_prim_base(geom), 0)
    poff = geom.inst_prim_off
    inst = jnp.clip(jnp.searchsorted(poff, ip, side="right") - 1,
                    0, poff.shape[0] - 2)
    loc = ip - poff[inst]
    face = geom.inst_face_idx[inst, loc]
    return geom.tmpl_tri_shape[jnp.maximum(face, 0)], inst, face


def _pick_mode(geom, mode):
    mode = mode or geom.accel_mode
    if mode == "tiled" and jax.default_backend() != "tpu":
        return "bvh"   # CPU tests use the reference XLA traversal
    return mode


def ray_intersect_prelim(geom, ray, mode: str = None) -> PreliminaryIntersection:
    """Closest-hit query -> PreliminaryIntersection (detached).

    Equivalent of Scene::ray_intersect_preliminary (scene.h:146).
    """
    mode = _pick_mode(geom, mode)
    d = jax.lax.stop_gradient(ray.d)
    o = jax.lax.stop_gradient(ray.o)
    if mode == "tiled":
        t, uv, prim = intersect_tiled(geom, o, d, ray.maxt)
    elif mode == "bvh":
        t, uv, prim = intersect_bvh(geom, o, d, ray.maxt)
    else:
        t, uv, prim = intersect_brute(geom, o, d, ray.maxt)
    if geom.inst_to_world is not None:
        t, uv, prim = _intersect_instances(geom, o, d, ray.maxt,
                                           (t, uv, prim))
    F = geom.tri_p0.shape[0]
    S = geom.sph_center.shape[0]
    is_tri = (prim >= 0) & (prim < F)
    is_sph = (prim >= F) & (prim < F + S)
    tri_sid = geom.tri_shape[jnp.clip(prim, 0, F - 1)] if F > 0 \
        else jnp.full_like(prim, -1)
    sph_sid = geom.sph_shape[jnp.clip(prim - F, 0, S - 1)] if S > 0 \
        else jnp.full_like(prim, -1)
    shape_idx = jnp.where(is_tri, tri_sid,
                          jnp.where(is_sph, sph_sid, -1))
    if geom.inst_to_world is not None:
        inst_sid, _, _ = instanced_shape_index(geom, prim)
        # guard on inst_prim_base, not F + S: the [F+S, F+S+n_sdfs)
        # range is reserved for SDF prims appended by the Scene layer
        shape_idx = jnp.where(prim >= inst_prim_base(geom), inst_sid,
                              shape_idx)
    shape_idx = jnp.where(prim >= 0, shape_idx, -1)
    return PreliminaryIntersection(
        t=jnp.where(prim >= 0, t, jnp.inf), prim_uv=uv,
        prim_index=prim, shape_index=shape_idx)


def ray_test(geom, ray, mode: str = None):
    """Shadow/any-hit query -> bool occluded (Scene::ray_test scene.h:175)."""
    mode = _pick_mode(geom, mode)
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    if mode == "tiled":
        t, _, prim = intersect_tiled(geom, o, d, ray.maxt, any_hit=True)
    elif mode == "bvh":
        t, _, prim = intersect_bvh(geom, o, d, ray.maxt, any_hit=True)
    else:
        t, _, prim = intersect_brute(geom, o, d, ray.maxt, any_hit=True)
    if geom.inst_to_world is not None:
        t, _, prim = _intersect_instances(geom, o, d, ray.maxt,
                                          (t, jnp.zeros(o.shape[:1] + (2,)),
                                           prim))
    return prim >= 0
