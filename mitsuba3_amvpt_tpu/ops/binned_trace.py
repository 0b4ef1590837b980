"""Sort-based binned tracer: per-ray front-to-back tile traversal.

The third-generation large-scene tracer (after the VMEM sweep in
ops/isect.py and the cull-then-pop streamer in ops/stream_trace.py).
The streamer's weakness is structural: its work per 1024-ray block is
the UNION of the block's per-ray tile needs, and incoherent wavefronts
(diffuse bounces, area-light shadows) have near-disjoint needs — the
union approaches the whole scene (measured: 254/486 tiles admitted per
block, 0.7 Mrays/s) even though each individual ray only needs its 2-4
nearest tiles (99.5% of bounce rays hit within ~1 sphere spacing).

This tracer makes the work proportional to the TRUE (ray, tile)
incidence, the TPU analog of what Embree's per-ray BVH traversal gives
the reference (scene_embree.inl:50):

  repeat (lax.while_loop):
    1. per ray, select its NEXT unvisited tile in strict front-to-back
       (t_near, id) lexicographic order — dense two-level hierarchy:
       slab over ~n/32 supertile AABBs, then the 32 tile AABBs of the
       ray's current supertile (one row-gather);
    2. sort rays by emitted tile id (jax.lax.sort: 0.1 ms at 262k) —
       finished rays carry a sentinel key and compact to the end, so
       dead lanes cost nothing (SURVEY §7 "dynamic wavefronts");
    3. a Pallas kernel walks each 128-lane group's tile RUNS: DMA the
       run's triangle tile HBM->VMEM (double-buffered), dense
       Moller-Trumbore sweep masked to the run;
    4. scatter results back; a ray terminates when its best hit is
       nearer than every unvisited tile (exact per-ray early-out).

Rays never revisit a tile: per-ray cursors (last supertile / last tile
key) advance lexicographically, which also breaks t_near ties between
abutting boxes without livelock.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # triangles per tile (DMA + sweep unit)
SUPER = 32          # tiles per supertile
GROUP = 128         # lanes per sweep group (one tile-run walk each)
NG_SW = 8           # groups per sweep-kernel invocation (8 sublanes min)
MAX_ROUNDS = 256    # safety bound on traversal rounds
K_EMIT = 4          # tiles emitted per ray per round (amortizes the
                    # dense selection/sort/gather phases over K visits)
_BIG = 3e38
SENTINEL = 0x7FFFFFFF   # i32 key for "no tile" (sorts after all real ids;
                        # int32 because Mosaic lacks unsigned reductions)


# ---------------------------------------------------------------------------
# scene-side packing
# ---------------------------------------------------------------------------

def pack_binned(p0, p1, p2):
    """Triangles (already in BVH-leaf order) -> binned-tracer tables.

    Returns (tri_soa (16, F_pad), tile_aabb (6, n_tiles),
    super_aabb (6, n_super), tile_rows (n_super, SUPER*8)).
    tile_rows packs each supertile's 32 tile AABBs in one row (6 used of
    8 floats per tile) so the per-ray fetch is a single row gather.
    All jnp — usable under jit with differentiable vertices upstream.
    """
    F = p0.shape[0]
    padt = (-F) % (TILE * SUPER)
    soa = jnp.concatenate([p0.T, (p1 - p0).T, (p2 - p0).T,
                           jnp.zeros((7, F), jnp.float32)], axis=0)
    soa = jnp.pad(soa, ((0, 0), (0, padt)))

    def padv(a, fill):
        return jnp.pad(a, ((0, padt), (0, 0)), constant_values=fill)

    lo = jnp.minimum(jnp.minimum(padv(p0, _BIG), padv(p1, _BIG)),
                     padv(p2, _BIG))
    hi = jnp.maximum(jnp.maximum(padv(p0, -_BIG), padv(p1, -_BIG)),
                     padv(p2, -_BIG))
    n_tiles = (F + padt) // TILE
    tlo = lo.reshape(n_tiles, TILE, 3).min(1)
    thi = hi.reshape(n_tiles, TILE, 3).max(1)
    tile_aabb = jnp.concatenate([tlo.T, thi.T], 0).astype(jnp.float32)

    n_super = n_tiles // SUPER
    slo = tlo.reshape(n_super, SUPER, 3).min(1)
    shi = thi.reshape(n_super, SUPER, 3).max(1)
    super_aabb = jnp.concatenate([slo.T, shi.T], 0).astype(jnp.float32)

    rows = jnp.concatenate([tlo, thi, jnp.zeros((n_tiles, 2))], axis=1)
    tile_rows = rows.reshape(n_super, SUPER * 8).astype(jnp.float32)
    return soa, tile_aabb, super_aabb, tile_rows


# ---------------------------------------------------------------------------
# XLA side: per-ray next-tile selection
# ---------------------------------------------------------------------------

def _slab(o, inv, lo, hi, limit):
    """Vectorized slab test; o/inv (N,1,3) vs boxes (1,M,3).
    Returns (t_near (N,M), hit)."""
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tn = jnp.maximum(tn, 0.0)
    hit = (tf >= tn) & (tn <= limit[:, None])
    return tn, hit


def _lex_min(t, idx, valid):
    """Lexicographic min over axis -1 of (t, idx) among valid.
    Returns (t*, idx*, any_valid)."""
    tv = jnp.where(valid, t, _BIG)
    tmin = jnp.min(tv, axis=-1)
    iv = jnp.where(valid & (tv <= tmin[:, None]), idx, jnp.int32(2**30))
    imin = jnp.min(iv, axis=-1)
    return tmin, imin, jnp.isfinite(tmin) & (tmin < _BIG * 0.5)


def _lex_gt(t, i, t0, i0):
    """(t, i) lexicographically greater than (t0, i0)."""
    return (t > t0) | ((t == t0) & (i > i0))


# ---------------------------------------------------------------------------
# Pallas run-sweep kernel
# ---------------------------------------------------------------------------

def _run_sweep_kernel(rays_ref, tid_ref, tris_hbm,
                      t_ref, u_ref, v_ref, id_ref,
                      scratch, dma_sem, *, any_hit: bool):
    """One invocation covers NG_SW groups of GROUP lanes (block shapes
    need >= 8 sublanes).  Each group's lanes are sorted by tile id; the
    group walks its runs: DMA the run's tile, dense MT sweep.

    All lanes of a group test every run tile (dense VPU cost equals a
    masked sweep, and Mosaic cannot reshape i1 vectors): lanes outside
    the run pick up bonus hits — genuine intersections that only
    tighten best-t earlier."""
    B = GROUP
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).reshape(B)

    for g in range(NG_SW):
        t_ref[g, :] = jnp.full((B,), _BIG)
        u_ref[g, :] = jnp.zeros((B,))
        v_ref[g, :] = jnp.zeros((B,))
        id_ref[g, :] = jnp.full((B,), -1, jnp.int32)

    def start_dma(slot, tid):
        pltpu.make_async_copy(
            tris_hbm.at[:, pl.ds(tid * TILE, TILE)],
            scratch.at[slot], dma_sem.at[slot]).start()

    def wait_dma(slot, tid):
        pltpu.make_async_copy(
            tris_hbm.at[:, pl.ds(tid * TILE, TILE)],
            scratch.at[slot], dma_sem.at[slot]).wait()

    def group(g):
        sl = pl.ds(g * B, B)
        ox = rays_ref[0, sl]
        oy = rays_ref[1, sl]
        oz = rays_ref[2, sl]
        dx = rays_ref[3, sl]
        dy = rays_ref[4, sl]
        dz = rays_ref[5, sl]
        lim = rays_ref[6, sl]
        tids = tid_ref[g, :]

        def at(vec, i):
            """vec[i] via masked reduce (no 1D dynamic_slice in TC)."""
            fill = jnp.array(jnp.iinfo(vec.dtype).max, vec.dtype)
            return jnp.min(jnp.where(lanes == i, vec, fill))

        def run_info(cursor):
            tid = at(tids, cursor)
            in_run = tids == tid
            end = jnp.max(jnp.where(in_run, lanes + 1, 0))
            return tid, end

        def sweep(slot, tid):
            bt = t_ref[g, :]
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

            pvx = bx(dy) * tx(e2z) - bx(dz) * tx(e2y)
            pvy = bx(dz) * tx(e2x) - bx(dx) * tx(e2z)
            pvz = bx(dx) * tx(e2y) - bx(dy) * tx(e2x)
            det = tx(e1x) * pvx + tx(e1y) * pvy + tx(e1z) * pvz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx = bx(ox) - tx(p0x)
            tvy = bx(oy) - tx(p0y)
            tvz = bx(oz) - tx(p0z)
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * tx(e1z) - tvz * tx(e1y)
            qvy = tvz * tx(e1x) - tvx * tx(e1z)
            qvz = tvx * tx(e1y) - tvy * tx(e1x)
            v = (bx(dx) * qvx + bx(dy) * qvy + bx(dz) * qvz) * inv_det
            t = (tx(e2x) * qvx + tx(e2y) * qvy + tx(e2z) * qvz) * inv_det
            hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (t > 0.0) & (t < bx(lim))
                   & (t < bx(bt)))
            t = jnp.where(hit, t, _BIG)
            k = jnp.argmin(t, axis=1)
            tk = jnp.min(t, axis=1)
            upd = tk < bt
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, TILE), 1)
            sel = cols == k[:, None]
            uk = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
            vk = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
            base = tid * TILE
            t_ref[g, :] = jnp.where(upd, tk, bt)
            u_ref[g, :] = jnp.where(upd, uk, u_ref[g, :])
            v_ref[g, :] = jnp.where(upd, vk, v_ref[g, :])
            id_ref[g, :] = jnp.where(upd, base + k, id_ref[g, :])

        @pl.when(at(tids, 0) != SENTINEL)
        def _():
            tid0, end0 = run_info(0)
            start_dma(0, tid0)

            def body(carry):
                i, cursor, tid, end = carry
                slot = i % 2
                more = (end < B) & (at(tids, jnp.minimum(end, B - 1))
                                    != SENTINEL)
                nxt_tid, nxt_end = run_info(jnp.minimum(end, B - 1))

                @pl.when(more)
                def _():
                    start_dma(1 - slot, nxt_tid)

                wait_dma(slot, tid)
                sweep(slot, tid)
                return (i + 1, end, nxt_tid, nxt_end)

            def cond(carry):
                i, cursor, tid, end = carry
                return (cursor < B) & (tid != SENTINEL)

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0),
                                            tid0, end0))

    for g in range(NG_SW):
        group(g)


def _run_sweep(rays8, tids, tri_soa, any_hit: bool):
    """rays8 (8, N) sorted lanes; tids (N,) i32 sorted tile keys.

    Lane vectors are reshaped (N//GROUP, GROUP) so every operand/result
    block is 2D with a 128-lane minor dim — XLA's 1D layout tiling
    (T(1024)) does not match Mosaic's (T(128)) for flat arrays."""
    n = rays8.shape[1]
    blk = NG_SW * GROUP
    grid = (n // blk,)
    lane_spec = pl.BlockSpec((NG_SW, GROUP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_run_sweep_kernel, any_hit=any_hit)
    interpret = jax.default_backend() != "tpu"
    t, u, v, pid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            lane_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[lane_spec, lane_spec, lane_spec, lane_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n // GROUP, GROUP), jnp.float32),
            jax.ShapeDtypeStruct((n // GROUP, GROUP), jnp.float32),
            jax.ShapeDtypeStruct((n // GROUP, GROUP), jnp.float32),
            jax.ShapeDtypeStruct((n // GROUP, GROUP), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays8, tids.reshape(n // GROUP, GROUP), tri_soa)
    return (t.reshape(n), u.reshape(n), v.reshape(n), pid.reshape(n))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("any_hit",))
def ray_triangles_binned(o, d, maxt, tri_soa, tile_aabb, super_aabb,
                         tile_rows, any_hit: bool = False):
    """Front-to-back binned tracing (module docstring).

    Returns (t, u, v, clustered_prim_id) with t == inf / id == -1 on
    miss.  Rays need NO pre-sorting: coherence only affects how many
    lanes share a tile run (a mild constant), not the visit count.
    """
    n = o.shape[0]
    pad = (-n) % (NG_SW * GROUP)
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        maxt = jnp.pad(maxt, (0, pad), constant_values=-1.0)
    np_ = n + pad

    n_super = super_aabb.shape[1]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d < 0, -1e-20, 1e-20), d)
    # clamp maxt to the scene-bbox exit (miss lanes terminate as soon as
    # their frontier passes the geometry instead of marching to inf)
    glo = jnp.min(tile_aabb[0:3], axis=1)
    ghi = jnp.max(tile_aabb[3:6], axis=1)
    t_exit = jnp.min(jnp.maximum((glo[None] - o) * inv,
                                 (ghi[None] - o) * inv), axis=-1)
    maxt = jnp.minimum(maxt, jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-4)

    o3 = o[:, None, :]
    inv3 = inv[:, None, :]
    slo = super_aabb[0:3].T[None]
    shi = super_aabb[3:6].T[None]
    sup_ids = jnp.arange(n_super, dtype=jnp.int32)[None]
    tile_ids32 = jnp.arange(SUPER, dtype=jnp.int32)[None]

    state = dict(
        best_t=jnp.full((np_,), jnp.inf),
        best_u=jnp.zeros((np_,)),
        best_v=jnp.zeros((np_,)),
        best_id=jnp.full((np_,), -1, jnp.int32),
        cur_super=jnp.full((np_,), -1, jnp.int32),
        ls_t=jnp.full((np_,), -1.0),      # last super key
        ls_i=jnp.full((np_,), -1, jnp.int32),
        lt_t=jnp.full((np_,), -1.0),      # last tile key (within super)
        lt_i=jnp.full((np_,), -1, jnp.int32),
        done=maxt <= 0.0,
        rounds=jnp.int32(0),
        emitted=jnp.ones((), bool),
    )

    def round_body(s):
        limit = jnp.minimum(s["best_t"], maxt)
        if any_hit:
            done = s["done"] | (s["best_id"] >= 0)
        else:
            done = s["done"]
        active = ~done

        # ---- supertile selection for lanes without a current super
        need = active & (s["cur_super"] < 0)
        tns, hits = _slab(o3, inv3, slo, shi, limit)
        cand = hits & _lex_gt(tns, sup_ids, s["ls_t"][:, None],
                              s["ls_i"][:, None]) & need[:, None]
        st, si, s_ok = _lex_min(tns, jnp.broadcast_to(sup_ids, tns.shape),
                                cand)
        cur = jnp.where(need & s_ok, si, s["cur_super"])
        ls_t = jnp.where(need & s_ok, st, s["ls_t"])
        ls_i = jnp.where(need & s_ok, si, s["ls_i"])
        lt_t = jnp.where(need & s_ok, -1.0, s["lt_t"])
        lt_i = jnp.where(need & s_ok, -1, s["lt_i"])
        done = done | (need & ~s_ok)
        active = ~done

        # ---- K tile selections within the current supertile: the
        # (N, 32) slab is computed once; only the lex cursor advances
        has_sup = active & (cur >= 0)
        rows = tile_rows[jnp.maximum(cur, 0)]          # (N, SUPER*8)
        rows = rows.reshape(np_, SUPER, 8)
        tnt, hitt = _slab(o3, inv3, rows[:, :, 0:3], rows[:, :, 3:6],
                          limit)
        alive = has_sup
        keys = []
        for _k in range(K_EMIT):
            candt = hitt & _lex_gt(tnt, tile_ids32, lt_t[:, None],
                                   lt_i[:, None]) & alive[:, None]
            tt, ti, t_ok = _lex_min(
                tnt, jnp.broadcast_to(tile_ids32, tnt.shape), candt)
            emit_k = alive & t_ok
            lt_t = jnp.where(emit_k, tt, lt_t)
            lt_i = jnp.where(emit_k, ti, lt_i)
            gid = jnp.maximum(cur, 0) * SUPER + ti
            keys.append(jnp.where(emit_k, gid, jnp.int32(SENTINEL)))
            # exhausted mid-burst: wait for the next round's super pick
            alive = alive & t_ok
        emit = keys[0] != SENTINEL
        cur = jnp.where(has_sup & ~alive, -1, cur)

        # ---- sort all K*N emission slots by tile, sweep, un-sort
        key_all = jnp.stack(keys, 1).reshape(np_ * K_EMIT)  # lane-major
        slot = jnp.arange(np_ * K_EMIT, dtype=jnp.int32)
        skey, sslot = jax.lax.sort([key_all, slot], num_keys=1)
        lane_of = sslot // K_EMIT
        ray_rows = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                              d[:, 0], d[:, 1], d[:, 2],
                              limit, limit], axis=1)       # (N, 8)
        rows8 = ray_rows[lane_of].T                        # (8, K*N)
        t_s, u_s, v_s, id_s = _run_sweep(rows8, skey, tri_soa, any_hit)
        res = jnp.stack([jnp.where(t_s >= _BIG * 0.5, jnp.inf, t_s),
                         u_s, v_s, id_s.astype(jnp.float32)], axis=1)
        res = jnp.zeros((np_ * K_EMIT, 4)).at[sslot].set(res)
        res = res.reshape(np_, K_EMIT, 4)
        kbest = jnp.argmin(res[:, :, 0], axis=1)
        rbest = jnp.take_along_axis(res, kbest[:, None, None], 1)[:, 0]
        tt_c = rbest[:, 0]
        upd = tt_c < s["best_t"]
        return dict(
            best_t=jnp.where(upd, tt_c, s["best_t"]),
            best_u=jnp.where(upd, rbest[:, 1], s["best_u"]),
            best_v=jnp.where(upd, rbest[:, 2], s["best_v"]),
            best_id=jnp.where(upd, rbest[:, 3].astype(jnp.int32),
                              s["best_id"]),
            cur_super=cur, ls_t=ls_t, ls_i=ls_i, lt_t=lt_t, lt_i=lt_i,
            done=done,
            rounds=s["rounds"] + 1,
            # a lane that exhausted its supertile emits nothing this
            # round but must get another round to pick its next super
            emitted=jnp.any(emit) | jnp.any(has_sup & ~alive),
        )

    def cond(s):
        return s["emitted"] & (s["rounds"] < MAX_ROUNDS)

    s = jax.lax.while_loop(cond, round_body, state)
    t = jnp.where(s["best_id"] >= 0, s["best_t"], jnp.inf)
    return (t[:n], s["best_u"][:n], s["best_v"][:n], s["best_id"][:n])
