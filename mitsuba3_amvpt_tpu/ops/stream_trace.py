"""Large-scene HBM-streaming tracer v2: cull-then-pop worklist kernel.

Replaces the linear super-tile sweep in ops/isect.py
(ray_triangles_tiled_hbm) for big scenes.  The reference delegates this
problem to Embree/OptiX (src/render/scene_embree.inl:50); on TPU we
keep the irregularity at *block* granularity and make every hardware
instruction dense:

1. Rays are Morton/octant-sorted (accel/traverse.py) and processed in
   blocks of ``RAY_BLOCK`` split into ``NG`` groups.  For each group the
   kernel computes interval bounds (origin box, 1/d interval, max t).
2. **Dense cull**: a conservative interval-arithmetic slab test of every
   group interval against every tile AABB — vectorized over tiles on
   the VPU, O(NG * n_tiles) flops, no control flow.  Admitted tiles
   form a key vector ``key[tile] = tile`` (else +inf).
3. **Pop loop**: while any key is admitted, pop the lowest tile id with
   a vector argmin, DMA that tile's triangles HBM -> VMEM (double
   buffered: the next tile's DMA is started before the current sweep),
   re-test each ray group *exactly* against the tile AABB using the
   current per-ray best-t (restores the early-out a precomputed cull
   cannot see), and run the dense Moller-Trumbore sweep only for
   groups that still hit.

Work per block is proportional to the admitted-tile union of its rays,
not to scene size — the TPU analog of log-N traversal.  Triangle data
never resides in VMEM wholesale, so scene size is HBM-bound (~64 B/tri).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 1024   # rays per kernel instance
NG = 8             # ray groups per block (cull granularity)
TILE = 512         # triangles per streamed tile (DMA + sweep unit)
_BIG = 3e38
_KBIG = 1e9        # key sentinel (tile ids are small ints)


def _interval_mul(alo, ahi, blo, bhi):
    """Product interval of [alo,ahi] x [blo,bhi] (broadcastable)."""
    p1 = alo * blo
    p2 = alo * bhi
    p3 = ahi * blo
    p4 = ahi * bhi
    lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return lo, hi


def _stream_kernel(rays_ref, tbl_ref, tbr_ref, tris_hbm,
                   t_ref, u_ref, v_ref, id_ref,
                   key_ref, scratch, dma_sem,
                   *, n_tiles: int, any_hit: bool):
    B = RAY_BLOCK
    GS = B // NG
    NTP = tbl_ref.shape[1]          # padded tile count (lanes)

    def comp(r):
        return [rays_ref[r, pl.ds(g * GS, GS)] for g in range(NG)]

    ox, oy, oz = comp(0), comp(1), comp(2)
    dx, dy, dz = comp(3), comp(4), comp(5)
    maxt = comp(6)

    def safe_inv(a):
        tiny = jnp.where(a >= 0, 1e-20, -1e-20)
        return 1.0 / jnp.where(jnp.abs(a) > 1e-20, a, tiny)

    idx_ = [safe_inv(v) for v in dx]
    idy_ = [safe_inv(v) for v in dy]
    idz_ = [safe_inv(v) for v in dz]

    t_ref[:] = jnp.full((B,), _BIG)
    u_ref[:] = jnp.zeros((B,))
    v_ref[:] = jnp.zeros((B,))
    id_ref[:] = jnp.full((B,), -1, jnp.int32)

    # ------------------------------------------------------------------
    # dense cull: group intervals vs all tile AABBs (vector over tiles)
    # ------------------------------------------------------------------
    lox = tbl_ref[0, :]
    loy = tbl_ref[1, :]
    loz = tbl_ref[2, :]
    hix = tbl_ref[3, :]
    hiy = tbl_ref[4, :]
    hiz = tbl_ref[5, :]

    admit = jnp.full((NTP,), _KBIG, jnp.float32)
    for g in range(NG):
        tmax_g = jnp.max(maxt[g])

        def axis(o, inv, lo_t, hi_t):
            olo = jnp.min(o)
            ohi = jnp.max(o)
            ilo = jnp.min(inv)
            ihi = jnp.max(inv)
            # conservative: if 1/d interval straddles the two signs the
            # group is mixed-octant (possible only for |d|~0 lanes) ->
            # widen to everything
            mixed = (ilo < 0.0) & (ihi > 0.0)
            t1lo, t1hi = _interval_mul(lo_t - ohi, lo_t - olo, ilo, ihi)
            t2lo, t2hi = _interval_mul(hi_t - ohi, hi_t - olo, ilo, ihi)
            near_lo = jnp.minimum(t1lo, t2lo)
            far_hi = jnp.maximum(t1hi, t2hi)
            near_lo = jnp.where(mixed, -_BIG, near_lo)
            far_hi = jnp.where(mixed, _BIG, far_hi)
            return near_lo, far_hi

        nx, fx = axis(ox[g], idx_[g], lox, hix)
        ny, fy = axis(oy[g], idy_[g], loy, hiy)
        nz, fz = axis(oz[g], idz_[g], loz, hiz)
        tnear = jnp.maximum(jnp.maximum(jnp.maximum(nx, ny), nz), 0.0)
        tfar = jnp.minimum(jnp.minimum(fx, fy), fz)
        hit_g = (tfar >= tnear) & (tnear < tmax_g)
        # key = conservative t-near: pops drain front-to-back, so
        # closest-hit rays terminate the loop as soon as the nearest
        # remaining tile lies beyond every ray's current best hit
        admit = jnp.minimum(admit, jnp.where(hit_g, tnear, _KBIG))

    tile_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, NTP), 1).reshape(NTP).astype(jnp.float32)
    valid = tile_iota < float(n_tiles)
    key_ref[:] = jnp.where(valid, admit, _KBIG)

    # ------------------------------------------------------------------
    # pop loop with double-buffered tile DMA
    # ------------------------------------------------------------------
    def pop():
        """Pop the admitted tile with the smallest t-near key.
        Returns (valid, tnear, tile_id); invalid => id 0."""
        key2 = key_ref[:]
        k = jnp.min(key2)
        s = jnp.min(jnp.where(key2 <= k, tile_iota, _KBIG))
        key_ref[:] = jnp.where(tile_iota == s, _KBIG, key2)
        return k < _KBIG, k, jnp.minimum(s, _KBIG).astype(jnp.int32)

    def interest_bound():
        """max over rays of min(best_t, maxt): no remaining tile whose
        conservative t-near exceeds this can change any result."""
        bt = t_ref[:]
        return jnp.max(jnp.minimum(bt, rays_ref[6, :]))

    def start_dma(slot, tile_id):
        cp = pltpu.make_async_copy(
            tris_hbm.at[:, pl.ds(tile_id * TILE, TILE)],
            scratch.at[slot], dma_sem.at[slot])
        cp.start()

    def wait_dma(slot, tile_id):
        pltpu.make_async_copy(
            tris_hbm.at[:, pl.ds(tile_id * TILE, TILE)],
            scratch.at[slot], dma_sem.at[slot]).wait()

    def clear(s):
        key_ref[:] = jnp.where(key_ref[:] == s.astype(jnp.float32),
                               _KBIG, key_ref[:])

    def slab_exact(g, row):
        """Per-ray slab of group g vs tile AABB row, with current best t."""
        t0x = (row[0] - ox[g]) * idx_[g]
        t1x = (row[3] - ox[g]) * idx_[g]
        t0y = (row[1] - oy[g]) * idy_[g]
        t1y = (row[4] - oy[g]) * idy_[g]
        t0z = (row[2] - oz[g]) * idz_[g]
        t1z = (row[5] - oz[g]) * idz_[g]
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        lim = jnp.minimum(t_ref[pl.ds(g * GS, GS)], maxt[g])
        return jnp.any((tmax >= jnp.maximum(tmin, 0.0)) & (tmin < lim))

    def sweep(g, slot, base_tri):
        sl_r = pl.ds(g * GS, GS)
        bt = t_ref[sl_r]
        p0x = scratch[slot, 0, :]
        p0y = scratch[slot, 1, :]
        p0z = scratch[slot, 2, :]
        e1x = scratch[slot, 3, :]
        e1y = scratch[slot, 4, :]
        e1z = scratch[slot, 5, :]
        e2x = scratch[slot, 6, :]
        e2y = scratch[slot, 7, :]
        e2z = scratch[slot, 8, :]

        def bx(a):
            return a[:, None]

        def tx(a):
            return a[None, :]

        pvx = bx(dy[g]) * tx(e2z) - bx(dz[g]) * tx(e2y)
        pvy = bx(dz[g]) * tx(e2x) - bx(dx[g]) * tx(e2z)
        pvz = bx(dx[g]) * tx(e2y) - bx(dy[g]) * tx(e2x)
        det = tx(e1x) * pvx + tx(e1y) * pvy + tx(e1z) * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = bx(ox[g]) - tx(p0x)
        tvy = bx(oy[g]) - tx(p0y)
        tvz = bx(oz[g]) - tx(p0z)
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * tx(e1z) - tvz * tx(e1y)
        qvy = tvz * tx(e1x) - tvx * tx(e1z)
        qvz = tvx * tx(e1y) - tvy * tx(e1x)
        v = (bx(dx[g]) * qvx + bx(dy[g]) * qvy + bx(dz[g]) * qvz) * inv_det
        t = (tx(e2x) * qvx + tx(e2y) * qvy + tx(e2z) * qvz) * inv_det
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > 0.0) & (t < bx(maxt[g]))
               & (t < bx(bt)))
        if any_hit:
            occ = jnp.any(hit, axis=1)
            t_ref[sl_r] = jnp.where(occ, 0.0, bt)
            id_ref[sl_r] = jnp.where(occ, base_tri,
                                     id_ref[sl_r])
            return
        t = jnp.where(hit, t, _BIG)
        k = jnp.argmin(t, axis=1)
        tk = jnp.min(t, axis=1)
        upd = tk < bt
        cols = jax.lax.broadcasted_iota(jnp.int32, (GS, TILE), 1)
        sel = cols == k[:, None]
        uk = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
        vk = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
        t_ref[sl_r] = jnp.where(upd, tk, bt)
        u_ref[sl_r] = jnp.where(upd, uk, u_ref[sl_r])
        v_ref[sl_r] = jnp.where(upd, vk, v_ref[sl_r])
        id_ref[sl_r] = jnp.where(upd, base_tri + k, id_ref[sl_r])

    def visit(slot, tile_id):
        """Sweep the tile resident in `slot` for groups that still hit."""
        row = tbr_ref[tile_id, :]
        for g in range(NG):
            @pl.when(slab_exact(g, row))
            def _(g=g):
                sweep(g, slot, tile_id * TILE)

    v0, k0, s0 = pop()

    @pl.when(v0)
    def _():
        start_dma(0, s0)
        v1, k1, s1 = pop()

        # invariant at body entry: cur tile's DMA into slot i%2 is in
        # flight; (nxt_v, nxt_k, nxt_s) is the pre-popped follow-up.
        # A follow-up DMA is started only if its conservative t-near can
        # still matter (early termination); the loop then never exits
        # with a DMA in flight (the scratch semaphores persist across
        # grid steps, so a dangling signal would corrupt the next block).
        def body(carry):
            i, cur_s, nxt_v, nxt_k, nxt_s, _ = carry
            cur_slot = i % 2
            proceed = jnp.logical_and(nxt_v, nxt_k < interest_bound())

            @pl.when(proceed)
            def _():
                start_dma(1 - cur_slot, nxt_s)

            wait_dma(cur_slot, cur_s)
            visit(cur_slot, cur_s)
            v2, k2, s2 = pop()
            return (i + 1, nxt_s, v2, k2, s2, proceed)

        def cond(carry):
            *_, cont = carry
            return cont

        jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), s0, v1, k1, s1, jnp.ones((), jnp.bool_)))


@functools.partial(jax.jit, static_argnames=("any_hit",))
def ray_triangles_streamed(o, d, maxt, tri_soa16, tile_aabb,
                           any_hit: bool = False):
    """Cull-then-pop streamed tracer (see module docstring).

    o, d: (N, 3); maxt: (N,).  tri_soa16: (16, F_pad) HBM layout with
    rows p0.xyz (0:3), e1.xyz (3:6), e2.xyz (6:9) precomputed and
    F_pad a multiple of TILE (degenerate padding tris).  tile_aabb:
    (6, n_tiles).  Rays should be pre-sorted for coherence.
    Returns (t, u, v, clustered_prim_id) with t == inf / id == -1 miss.
    """
    n = o.shape[0]
    pad = (-n) % RAY_BLOCK
    # Clamp maxt to the scene-bbox exit distance: a miss lane with
    # maxt=inf would otherwise pin the kernel's early-termination bound
    # (interest_bound) at infinity and force every block to drain its
    # whole admitted tile list (measured 250x slowdown on diffuse-bounce
    # wavefronts, where ~0.5% of rays miss).  No hit can lie beyond the
    # bbox, so this is exact.
    glo = jnp.min(tile_aabb[0:3], axis=1)
    ghi = jnp.max(tile_aabb[3:6], axis=1)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d < 0, -1e-20, 1e-20), d)
    t0b = (glo[None] - o) * inv
    t1b = (ghi[None] - o) * inv
    t_exit = jnp.min(jnp.maximum(t0b, t1b), axis=-1)
    maxt = jnp.minimum(maxt, jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-4)
    rays = jnp.concatenate([o.T, d.T, maxt[None],
                            jnp.zeros((1, n), o.dtype)], axis=0)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    n_pad = n + pad
    F_pad = tri_soa16.shape[1]
    n_tiles = F_pad // TILE
    ntp = (-(-n_tiles) // 128) * 128 if n_tiles % 128 else n_tiles
    ntp = max(((n_tiles + 127) // 128) * 128, 128)

    # lane layout for the dense cull (8, NTP): padding tiles empty
    tbl = jnp.full((8, ntp), _BIG, jnp.float32)
    tbl = tbl.at[0:3, :n_tiles].set(tile_aabb[0:3])
    tbl = tbl.at[3:6, :].set(-_BIG)
    tbl = tbl.at[3:6, :n_tiles].set(tile_aabb[3:6])
    # row layout for pop-time exact tests (n_tiles, 128)
    tbr = jnp.zeros((n_tiles, 128), jnp.float32)
    tbr = tbr.at[:, 0:6].set(tile_aabb.T)

    grid = (n_pad // RAY_BLOCK,)
    kernel = functools.partial(_stream_kernel, n_tiles=n_tiles,
                               any_hit=any_hit)
    ray_spec = pl.BlockSpec((RAY_BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    t, u, v, pid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ntp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # tris stay in HBM
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ntp,), jnp.float32),            # key vector
            pltpu.VMEM((2, 16, TILE), jnp.float32),     # tile double buf
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(rays, tbl, tbr, tri_soa16)
    t = jnp.where(t >= _BIG * 0.5, jnp.inf, t)
    return t[:n], u[:n], v[:n], pid[:n]


def pack_tri_soa16(p0, p1, p2):
    """(F,3) x3 -> (16, F_pad) HBM layout: rows p0.xyz, e1.xyz, e2.xyz,
    zero padding to 16 sublanes and to a TILE multiple of lanes.
    Degenerate padding triangles (all zero -> det == 0) never hit."""
    F = p0.shape[0]
    pad = (-F) % TILE
    soa = jnp.concatenate([jnp.asarray(p0).T,
                           (jnp.asarray(p1) - jnp.asarray(p0)).T,
                           (jnp.asarray(p2) - jnp.asarray(p0)).T,
                           jnp.zeros((7, F), jnp.float32)], axis=0)
    if pad:
        soa = jnp.pad(soa, ((0, 0), (0, pad)))
    return soa


def tile_bounds16(p0, p1, p2):
    """Per-TILE AABBs for triangles already in coherent order.
    Returns (6, n_tiles).  jnp — usable inside jit (vertices may be
    optimization parameters, so packs must derive from current verts)."""
    F = p0.shape[0]
    pad = (-F) % TILE
    n_tiles = (F + pad) // TILE

    def padto(a, fill):
        return jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)

    lo = jnp.minimum(jnp.minimum(padto(p0, 1e30), padto(p1, 1e30)),
                     padto(p2, 1e30))
    hi = jnp.maximum(jnp.maximum(padto(p0, -1e30), padto(p1, -1e30)),
                     padto(p2, -1e30))
    lo = lo.reshape(n_tiles, TILE, 3).min(1)
    hi = hi.reshape(n_tiles, TILE, 3).max(1)
    return jnp.concatenate([lo.T, hi.T], axis=0).astype(jnp.float32)


def first_tile_key(o, d, maxt, tile_aabb):
    """Nearest-admitted-tile id per ray (-1 if none) for ray binning.

    One dense two-level pass (supertiles of 32 tiles, then the winning
    supertile's tiles via a single row gather): the first round of the
    binned tracer's front-to-back selection (ops/binned_trace.py), used
    as the leading sort key for the streamed tracer.  Blocks of rays
    that share their first tile share their whole near-field tile
    neighborhood, which collapses the block-union the cull admits —
    direction-octant keys alone leave diffuse-bounce unions at ~half
    the scene (measured, scripts/count_admission.py).

    maxt should already be bbox-exit clamped.  Rays with NO admitted
    tile provably hit nothing (their segment misses every tile box).
    """
    n = o.shape[0]
    n_tiles = tile_aabb.shape[1]
    nsup = -(-n_tiles // 32)
    pad = nsup * 32 - n_tiles
    ta = tile_aabb
    if pad:
        filler = jnp.concatenate([jnp.full((3, pad), _BIG),
                                  jnp.full((3, pad), -_BIG)], axis=0)
        ta = jnp.concatenate([ta, filler], axis=1)
    tlo = ta[0:3].T.reshape(nsup, 32, 3)
    thi = ta[3:6].T.reshape(nsup, 32, 3)
    slo = tlo.min(1)
    shi = thi.max(1)
    rows = jnp.concatenate([tlo, thi], axis=2).reshape(nsup, 32 * 6)

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d < 0, -1e-20, 1e-20), d)
    o3 = o[:, None, :]
    inv3 = inv[:, None, :]

    def slab(lo, hi):
        t0 = (lo - o3) * inv3
        t1 = (hi - o3) * inv3
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        return tn, (tf >= tn) & (tn < maxt[:, None])

    def lex_min(t, ids, valid):
        tv = jnp.where(valid, t, _BIG)
        tmin = jnp.min(tv, -1)
        imin = jnp.min(jnp.where(valid & (tv <= tmin[:, None]), ids,
                                 jnp.int32(2**30)), -1)
        return tmin, imin, tmin < _BIG * 0.5

    sup_ids = jnp.arange(nsup, dtype=jnp.int32)[None]
    tns, hs = slab(slo[None], shi[None])
    _, si, s_ok = lex_min(tns, jnp.broadcast_to(sup_ids, tns.shape), hs)

    r = rows[jnp.maximum(si, 0)].reshape(n, 32, 6)
    tnt, ht = slab(r[:, :, 0:3], r[:, :, 3:6])
    tids = jnp.arange(32, dtype=jnp.int32)[None]
    _, ti, t_ok = lex_min(tnt, jnp.broadcast_to(tids, tnt.shape), ht)
    gid = jnp.maximum(si, 0) * 32 + ti
    # -1 (provable miss) ONLY when no supertile is admitted at all; a
    # nearest super whose own tiles all miss still bins by that super
    # (a later super may hold the hit — zeroing maxt there would be
    # wrong, it cost 40% of bounce hits before this guard)
    gid = jnp.where(t_ok, gid, jnp.maximum(si, 0) * 32)
    return jnp.where(s_ok, jnp.minimum(gid, n_tiles - 1), -1)
