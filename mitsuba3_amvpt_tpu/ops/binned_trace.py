"""Sort-based binned tracer v2: per-ray front-to-back tile traversal
with a fused Pallas selection kernel and staged lane compaction.

The large-scene tracer (TPU analog of Embree's per-ray BVH traversal,
reference src/render/scene_embree.inl:50).  Work is proportional to the
TRUE (ray, tile) incidence — not to block-level tile unions (the
stream tracer's weakness on incoherent bounce wavefronts) and not to
scene size:

  repeat (lax.while_loop):
    1. SELECT (Pallas kernel, this round's new piece): each lane picks
       its next K unvisited tiles in strict front-to-back (t_near, id)
       lexicographic order over a dense two-level hierarchy — slab over
       ~n_tiles/32 supertile AABBs (VMEM-resident), then the 32 tile
       AABBs of the lane's current supertile fetched with ONE one-hot
       MXU matmul.  All intermediates stay in VMEM; the previous XLA
       formulation materialized (N, n_super) f32 temporaries in HBM
       every round (~21 ms/round at 131k lanes — the measured round-2
       bottleneck).
    2. sort the K*N emitted keys by tile id (jax.lax.sort); finished
       lanes carry a sentinel key and compact to the end.
    3. SWEEP (Pallas kernel): each 128-lane group walks its tile RUNS:
       DMA the run's triangle tile HBM->VMEM (double-buffered), dense
       Moller-Trumbore sweep.
    4. scatter results back; a ray terminates when its best hit is
       nearer than every unvisited tile (exact per-ray early-out).

  Between stages the wavefront is COMPACTED: lanes are sorted by their
  done flag and the arrays shrink (N -> N/4 -> N/16), so straggler
  rounds cost a fraction of a full-wavefront round.

Rays never revisit a tile: per-lane cursors (last supertile / last
tile key) advance lexicographically, which also breaks t_near ties
between abutting boxes without livelock.  Rounds are bounded by
n_tiles + n_super + 8 — a true upper bound on per-lane visits, so no
silent truncation (every emitted round makes lexicographic progress).
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
RL = 8              # lane rows per select-kernel block (RL*128 lanes)
import os as _os

K_EMIT = int(_os.environ.get("MT_K_EMIT", "6"))
                    # tiles emitted per ray per round.  Measured TRUE
                    # front-to-back visits on the 1M bench scene:
                    # mean 3.3, p90 5, p99 6 (scripts/visit_stats.py);
                    # the round-4 scan (scripts/tune_binned.py) over
                    # K in {2,4,6,8} put the optimum at 6 — larger K
                    # wastes sort/gather/sweep slots, smaller K pays
                    # fixed per-round costs more often
_REFETCH_STRIDE = int(_os.environ.get("MT_REFETCH", "1"))
                    # emission slots per tile-row fetch; 1 = refetch
                    # after every emission (fewest rounds)
NCH = 20            # state channels per lane (see _CH below)
_BIG = 3e38
_IBIG = 1.0e9
SENTINEL = 0x7FFFFFFF   # i32 key for "no tile" (sorts after all real ids;
                        # int32 because Mosaic lacks unsigned reductions)

# state-channel map: everything f32 (integer cursors are small exact
# floats); one (NB, NCH, 128) array keeps the select kernel to a single
# blocked input/output.  ls_t/ls_i is the lexicographic supertile
# cursor (== the current supertile's (t_near, id)); tnb caches the
# eager-termination bound.  (A round-5 experiment replaced the
# per-round slab + on-demand pick_super with a per-lane cached
# supertile frontier; it LOST — rays on the 1M bench scene walk 6-10
# overlapping supertile AABBs, so the cache stalled ~80% of round-2
# lanes and forced rebuild slabs almost every round.)
_CH = dict(o=0, d=3, inv=6, limit=9, maxt=10, cur=11, ls_t=12, ls_i=13,
           lt_t=14, lt_i=15, done=16, progress=17)


# ---------------------------------------------------------------------------
# scene-side packing
# ---------------------------------------------------------------------------

def pack_binned(p0, p1, p2, tile_starts=None):
    """Triangles (already in BVH-leaf order) -> binned-tracer tables.

    ``tile_starts``: optional treelet tile boundaries from
    accel.build.treelet_tiles — tile t covers ordered prims
    [starts[t], starts[t+1]) (each <= TILE), padded to TILE with
    degenerate slots.  The VALUES may be traced (a scene-pytree leaf);
    only the array LENGTH is static.  Without it, tiles are fixed runs
    of TILE consecutive prims (looser AABBs).

    Returns (tri_soa (n_tiles_p, 16, TILE), sup_ab (NSP, 8),
    tile_c (192, NSP), ns_real, n_tiles_real, prim_map).  ``sup_ab``
    rows are supertile AABBs (lox loy loz hix hiy hiz 0 0);
    ``tile_c[c*SUPER+j, s]`` is AABB component c of tile ``s*SUPER+j``
    — laid out so the per-lane tile fetch is one (192, NSP) @
    (NSP, 128) MXU matmul against a one-hot supertile selector.
    ``prim_map`` (n_tiles_p*TILE,) int32 maps a sweep slot id
    (tile*TILE + lane) back to the ordered prim index (-1 for pads).
    ns_real / n_tiles_real are static ints.  All jnp — usable under
    jit with differentiable vertices upstream.
    """
    F = p0.shape[0]
    if tile_starts is None:
        n_tiles_real = max(-(-F // TILE), 1)
        tile_starts = jnp.minimum(
            jnp.arange(n_tiles_real + 1, dtype=jnp.int32) * TILE, F)
    starts = jnp.asarray(tile_starts, jnp.int32)
    n_tiles_real = starts.shape[0] - 1          # static (array shape)
    n_tiles_p = -(-n_tiles_real // SUPER) * SUPER
    starts = jnp.concatenate(
        [starts, jnp.full((n_tiles_p - n_tiles_real,), F, jnp.int32)])
    counts_t = starts[1:] - starts[:-1]          # (n_tiles_p,)
    offs = jnp.arange(TILE, dtype=jnp.int32)
    idx = starts[:-1, None] + offs[None, :]
    valid2 = offs[None, :] < counts_t[:, None]
    idx_flat = jnp.where(valid2, idx, -1).reshape(-1)
    valid = idx_flat >= 0
    gi = jnp.maximum(idx_flat, 0)

    def take(a):
        return jnp.where(valid[:, None], a[gi], 0.0)

    q0, q1, q2 = take(p0), take(p1), take(p2)
    # rows 0-2 p0, 3-5 e1, 6-8 e2 — classic Moller-Trumbore operands.
    # (A plane-equation + barycentric-gradient variant was tried and
    # REVERTED: its per-tri gradient vectors scale as 1/|n|, so sliver
    # triangles — uv-sphere poles — produced false near-zero hits and
    # real misses on TPU at the ~0.3% level.  MT keeps every
    # intermediate at edge/ray scale and matches the brute reference
    # bit-for-bit.)  Tile-major layout: one tile = one CONTIGUOUS
    # (16, TILE) 8 KB block, so the sweep kernel's HBM->VMEM DMA is a
    # single linear copy.
    soa = jnp.concatenate([q0.T, (q1 - q0).T, (q2 - q0).T,
                           jnp.zeros((7, q0.shape[0]), jnp.float32)], 0)
    soa = jnp.transpose(soa.reshape(16, n_tiles_p, TILE), (1, 0, 2))

    big = jnp.where(valid[:, None], 0.0, _BIG)
    lo = jnp.minimum(jnp.minimum(q0 + big, q1 + big), q2 + big)
    hi = jnp.maximum(jnp.maximum(q0 - big, q1 - big), q2 - big)
    tlo = lo.reshape(n_tiles_p, TILE, 3).min(1)
    thi = hi.reshape(n_tiles_p, TILE, 3).max(1)
    # pad slots push to +/-BIG and never win the min/max as long as a
    # tile has one real prim; EMPTY tiles become far-away point boxes
    # ([1e30]^3) — a point box beyond the scene can never satisfy
    # tn <= limit (limit is always clamped to the scene-bbox exit), so
    # empty tiles are rejected without an explicit validity channel
    empty = (counts_t == 0)[:, None]
    tlo = jnp.where(empty, 1e30, jnp.clip(tlo, -_BIG, _BIG))
    thi = jnp.where(empty, 1e30, jnp.clip(thi, -_BIG, _BIG))

    ns = n_tiles_p // SUPER
    # mask empty tiles out of the supertile reduction: their 1e30 point
    # boxes must not inflate the supertile AABB (or the driver's global
    # bbox / maxt clamp downstream) — a fully-empty supertile becomes an
    # inverted box (+BIG, -BIG) that can never pass the slab test
    slo = jnp.where(empty, _BIG, tlo).reshape(ns, SUPER, 3).min(1)
    shi = jnp.where(empty, -_BIG, thi).reshape(ns, SUPER, 3).max(1)
    nsp = max(-(-ns // 128) * 128, 128)
    sup_ab = jnp.concatenate([slo, shi, jnp.zeros((ns, 2))], axis=1)
    sup_ab = jnp.pad(sup_ab, ((0, nsp - ns), (0, 0))).astype(jnp.float32)

    # tile_c: component-major rows, supertile lanes.  The bounds are
    # DILATED by 2^-7 relative + 1e-6 absolute so the select kernel can
    # fetch them with a DEFAULT-precision (single-pass bf16) one-hot
    # matmul: bf16 input rounding perturbs values by <= 2^-9 relative,
    # so the rounded dilated box still strictly contains the exact box
    # — false tile ADMISSIONS only (a few % extra visits), never the
    # false misses that forced Precision.HIGHEST (6 bf16 passes, ~60%
    # of steady-state select cost) through round 4.
    dlo = jnp.abs(tlo) * (2.0 ** -7) + 1e-6
    dhi = jnp.abs(thi) * (2.0 ** -7) + 1e-6
    comp = jnp.concatenate([tlo - dlo, thi + dhi], axis=1)
    comp = comp.reshape(ns, SUPER, 6)
    tile_c = jnp.transpose(comp, (2, 1, 0)).reshape(6 * SUPER, ns)
    tile_c = jnp.pad(tile_c, ((0, 0), (0, nsp - ns))).astype(jnp.float32)
    prim_map = jnp.asarray(idx_flat, jnp.int32)
    return soa, sup_ab, tile_c, ns, n_tiles_real, prim_map


# ---------------------------------------------------------------------------
# Pallas SELECT kernel: per-lane next-K-tiles in front-to-back order
# ---------------------------------------------------------------------------

def _select_kernel(S_ref, sup_ref, tile_ref, keys_ref,
                   tnext_ref, S_out_ref, *,
                   ns_real: int, n_tiles_real: int, k_emit: int):
    """One block = RL rows of 128 lanes.  Per 128-lane group:

    * slab-test the NSP supertile AABBs once ((NSP, 128), VMEM),
    * fetch the 32 tile AABBs of each lane's current supertile with a
      single one-hot (192, NSP) @ (NSP, 128) matmul (default precision
      over pre-dilated boxes, see pack_binned),
    * emit up to k_emit tiles per lane in (t_near, id) lex order; a
      lane that exhausts its supertile advances its super cursor (using
      the cached slab) and pauses until the next refetch slot,
    * emit ``t_next``: a lower bound on every still-unvisited
      candidate's t_near (remaining tiles of the current fetch + the
      exact next supertile after the lex cursor), letting the driver
      terminate lanes eagerly instead of one round late.
    """
    nsp = sup_ref.shape[0]
    ids_s = jax.lax.broadcasted_iota(
        jnp.int32, (nsp, GROUP), 0).astype(jnp.float32)
    ids_t = jax.lax.broadcasted_iota(
        jnp.int32, (SUPER, GROUP), 0).astype(jnp.float32)
    valid_s = ids_s < float(ns_real)

    for rl in range(S_ref.shape[0]):
        def ch(c):
            return S_ref[rl, c:c + 1, :]

        ox, oy, oz = ch(0), ch(1), ch(2)
        dx, dy, dz = ch(3), ch(4), ch(5)
        ix, iy, iz = ch(6), ch(7), ch(8)
        limit = ch(_CH["limit"])
        maxt = ch(_CH["maxt"])
        cur = ch(_CH["cur"])
        ls_t, ls_i = ch(_CH["ls_t"]), ch(_CH["ls_i"])
        lt_t, lt_i = ch(_CH["lt_t"]), ch(_CH["lt_i"])
        done = ch(_CH["done"]) > 0.5

        # ---- supertile slab, once per round: (NSP, 128)
        def axis_ts(ref, lo_col, hi_col, oc, ic):
            t0 = (ref[:, lo_col:lo_col + 1] - oc) * ic
            t1 = (ref[:, hi_col:hi_col + 1] - oc) * ic
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        n0, f0 = axis_ts(sup_ref, 0, 3, ox, ix)
        n1, f1 = axis_ts(sup_ref, 1, 4, oy, iy)
        n2, f2 = axis_ts(sup_ref, 2, 5, oz, iz)
        tn_s = jnp.maximum(jnp.maximum(n0, n1), jnp.maximum(n2, 0.0))
        tf_s = jnp.minimum(jnp.minimum(f0, f1), f2)
        hit_s = (tf_s >= tn_s) & (tn_s <= limit) & valid_s

        def pick_super(lst, lsi):
            cand = hit_s & ((tn_s > lst) | ((tn_s == lst) & (ids_s > lsi)))
            tv = jnp.where(cand, tn_s, _BIG)
            st = jnp.min(tv, axis=0, keepdims=True)
            iv = jnp.where(cand & (tv <= st), ids_s, _IBIG)
            si = jnp.min(iv, axis=0, keepdims=True)
            return st, si, st < _BIG * 0.5

        # ---- ensure a current supertile
        need = (~done) & (cur < 0.0)
        st, si, ok = pick_super(ls_t, ls_i)
        ok0 = need & ok
        cur = jnp.where(ok0, si, cur)
        ls_t = jnp.where(ok0, st, ls_t)
        ls_i = jnp.where(ok0, si, ls_i)
        lt_t = jnp.where(ok0, -1.0, lt_t)
        lt_i = jnp.where(ok0, -1.0, lt_i)
        done = done | (need & ~ok)
        progress = ok0

        # ---- one-hot tile-row fetch: (192, NSP) @ (NSP, 128).
        # Default (single-pass bf16) precision is safe because the
        # packed tile AABBs are pre-dilated past the bf16 input
        # rounding radius (see pack_binned) — the rounded box strictly
        # contains the exact one, so grazing rays can only gain tiles.
        # (Round 4 ran Precision.HIGHEST against UNdilated boxes —
        # ~1e-4 false misses otherwise — at 6x the MXU cost.)
        def fetch_rows(cur):
            oh = (ids_s == jnp.maximum(cur, 0.0)).astype(jnp.float32)
            rows = jax.lax.dot_general(
                tile_ref[:, :], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (192, 128)

            def axis_tt(c, oc, ic):
                lo = rows[c * SUPER:(c + 1) * SUPER, :]
                hi = rows[(3 + c) * SUPER:(4 + c) * SUPER, :]
                t0 = (lo - oc) * ic
                t1 = (hi - oc) * ic
                return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

            m0, g0 = axis_tt(0, ox, ix)
            m1, g1 = axis_tt(1, oy, iy)
            m2, g2 = axis_tt(2, oz, iz)
            tn_t = jnp.maximum(jnp.maximum(m0, m1), jnp.maximum(m2, 0.0))
            tf_t = jnp.minimum(jnp.minimum(g0, g1), g2)
            gid_t = jnp.maximum(cur, 0.0) * float(SUPER) + ids_t
            hit_t = ((tf_t >= tn_t) & (tn_t <= limit)
                     & (gid_t < float(n_tiles_real)) & (cur >= 0.0))
            return tn_t, hit_t

        tn_t, hit_t = fetch_rows(cur)

        # ---- K front-to-back tile emissions from a BOUNDED number of
        # row fetches (the one-hot matmul + dual slab sweep was ~2/3 of
        # select cost when refetched per emission slot).  A lane that
        # exhausts its supertile advances its super cursor via the
        # cached slab (cheap) but only refetches tile rows at the
        # designated refetch slots; until then it pauses emission for
        # the round (sentinel slots).  Lexicographic progress per round
        # is preserved (>= 1 emission or cursor advance per live lane).
        refetch_at = set(range(_REFETCH_STRIDE - 1, k_emit - 1,
                               _REFETCH_STRIDE))
        alive = ~done
        paused = jnp.zeros_like(done)
        key_list = []
        for _k in range(k_emit):
            cand = (hit_t
                    & ((tn_t > lt_t) | ((tn_t == lt_t) & (ids_t > lt_i)))
                    & (alive & ~paused))
            tv = jnp.where(cand, tn_t, _BIG)
            tt = jnp.min(tv, axis=0, keepdims=True)
            iv = jnp.where(cand & (tv <= tt), ids_t, _IBIG)
            ti = jnp.min(iv, axis=0, keepdims=True)
            emit = tt < _BIG * 0.5
            keyf = cur * float(SUPER) + ti
            key_list.append(jnp.where(emit, keyf.astype(jnp.int32),
                                      jnp.int32(SENTINEL)))
            lt_t = jnp.where(emit, tt, lt_t)
            lt_i = jnp.where(emit, ti, lt_i)
            # exhausted lanes: advance the super cursor (cached slab)
            need2 = alive & ~paused & ~emit
            st2, si2, oks = pick_super(ls_t, ls_i)
            adv = need2 & oks
            cur = jnp.where(adv, si2, cur)
            ls_t = jnp.where(adv, st2, ls_t)
            ls_i = jnp.where(adv, si2, ls_i)
            lt_t = jnp.where(adv, -1.0, lt_t)
            lt_i = jnp.where(adv, -1.0, lt_i)
            done = done | (need2 & ~oks)
            alive = alive & ~(need2 & ~oks)
            paused = paused | adv
            progress = progress | emit | adv
            if _k in refetch_at:
                tn_t, hit_t = fetch_rows(cur)
                paused = jnp.zeros_like(done)

        keys_ref[rl, :, :] = jnp.concatenate(key_list, axis=0)

        # ---- eager-termination bound: a LOWER bound on the t_near of
        # every candidate this lane has NOT yet emitted.  The driver
        # marks a lane done as soon as best_t <= t_next, instead of
        # spending a full-wavefront extra round just discovering
        # doneness.  Sources (each a true lower bound): remaining
        # candidates in the current tile fetch (exact tns) — or the
        # current supertile's tn when the fetch is stale (paused); and
        # the exact NEXT supertile past the lex cursor (one extra
        # pick_super; supers beyond it are lex-later, so farther).
        cand_r = (hit_t
                  & ((tn_t > lt_t) | ((tn_t == lt_t) & (ids_t > lt_i))))
        tta = jnp.min(jnp.where(cand_r, tn_t, _BIG), axis=0,
                      keepdims=True)
        tta = jnp.where(paused, ls_t, tta)
        st3, _, ok3 = pick_super(ls_t, ls_i)
        beyond = jnp.where(ok3, st3, _BIG)
        t_next = jnp.minimum(tta, beyond)
        tnext_ref[rl, 0:1, :] = t_next

        S_out_ref[rl, :, :] = jnp.concatenate([
            ox, oy, oz, dx, dy, dz, ix, iy, iz, limit, maxt, cur,
            ls_t, ls_i, lt_t, lt_i,
            done.astype(jnp.float32), progress.astype(jnp.float32),
            jnp.zeros_like(ox), jnp.zeros_like(ox)], axis=0)


def _select(S, sup_ab, tile_c, ns_real: int, n_tiles_real: int):
    import os
    nb = S.shape[0]
    grid = (nb // RL,)
    interpret = (jax.default_backend() != "tpu"
                 or bool(os.environ.get("MT_INTERPRET_SELECT")))
    kernel = functools.partial(_select_kernel, ns_real=ns_real,
                               n_tiles_real=n_tiles_real, k_emit=K_EMIT)
    keys, tnext, S_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RL, NCH, GROUP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RL, K_EMIT, GROUP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RL, 1, GROUP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RL, NCH, GROUP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, K_EMIT, GROUP), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, GROUP), jnp.float32),
            jax.ShapeDtypeStruct((nb, NCH, GROUP), jnp.float32),
        ],
        interpret=interpret,
    )(S, sup_ab, tile_c)
    return keys, tnext, S_new


# ---------------------------------------------------------------------------
# Pallas run-sweep kernel (unchanged architecture from v1)
# ---------------------------------------------------------------------------

NBUF = 8            # DMA ring depth (runs in flight): the chunked MT
                    # sweep is ~0.8 us/run, so 7 runs of lead time are
                    # needed to hide multi-us HBM DMA latency
CHUNK = 16          # rays per sweep sub-block (MT stays vreg-resident)
NSTEP = GROUP // CHUNK


def _run_sweep_kernel(runs_ref, bnds_ref, rays_ref, tris_hbm,
                      t_ref, id_ref,
                      scratch, rt, dma_sem, *, any_hit: bool):
    """One invocation covers NG_SW groups of GROUP lanes (block shapes
    need >= 8 sublanes).  Each group's lanes are sorted by tile id; the
    group walks its DISTINCT tiles: DMA the tile (one contiguous 8 KB
    block, NBUF-deep ring), dense Moller-Trumbore sweep.

    Two measured poisons shaped this version (round-4 diagnostics):

    * The per-group run list arrives PRECOMPUTED in SMEM (``runs_ref``,
      built by one vectorized XLA pass in the driver).  The previous
      kernel derived each run with masked vector reductions read back
      to scalars — ~2.2 us of vector->SMEM round-trip latency PER RUN,
      which dominated the whole sweep (17.9 of 24.8 ms with the MT
      math deleted).  An SMEM word load is a few cycles.
    * Rays arrive channel-major (8, blk): the slot-major (blk, 8)
      layout was lane-padded 8 -> 128 by Mosaic, so every grid step
      DMA'd 512 KB instead of 32 KB (measured as an 8.7 us/step floor
      with the kernel body empty).  Each group transposes its (8, 128)
      ray block ONCE into VMEM scratch ``rt``; the chunked sweep then
      reads (CHUNK, 8) sub-blocks from scratch.

    The MT sweep runs in (CHUNK, TILE) ray sub-blocks: at (128, 128)
    every temporary is 16 vregs and the ~25 live intermediates spill to
    VMEM (measured ~4 us per (group, tile) pair); at (16, 128) each
    temporary is 2 vregs and the chain stays in registers.  Outputs are
    written in (CHUNK, NSTEP) layout per group — slot l lives at
    [l % CHUNK, l // CHUNK] — and the driver untangles with one XLA
    transpose.  Only (t, id) are tracked; the driver reconstructs u,v
    once per lane from the winning triangle after tracing completes.

    CHUNK-BOUNDED runs (round 5): a run only sweeps the CHUNK-lane
    sub-blocks its sorted slot span [start, end) overlaps — ``bnds_ref``
    carries packed (c0*16 + c1) chunk bounds per run.  The round-4
    kernel swept all GROUP lanes for every run; with ~12k runs/round of
    mean length well under GROUP, that dense sweep was ~2x the trace's
    whole compute (device-op profile, scripts/prof_binned_attr.py).
    Lanes inside a swept chunk but outside the run still pick up bonus
    hits — genuine intersections that only tighten best-t earlier."""
    B = GROUP
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 1)
    ncol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, NSTEP), 1)
    init_T = jnp.full((CHUNK, NSTEP), _BIG)
    init_I = jnp.full((CHUNK, NSTEP), -1, jnp.int32)

    def start_dma(slot, tid):
        pltpu.make_async_copy(
            tris_hbm.at[jnp.maximum(tid, 0)],
            scratch.at[slot], dma_sem.at[slot]).start()

    def wait_dma(slot, tid):
        pltpu.make_async_copy(
            tris_hbm.at[jnp.maximum(tid, 0)],
            scratch.at[slot], dma_sem.at[slot]).wait()

    def group(g):
        def sweep(slot, tid, c0, c1, T, I):
            """Best-so-far (T, I) live in the while-loop CARRY, not in
            the output refs: per-chunk (CHUNK, 1) column read/writes on
            a lane-width-NSTEP ref were sliver accesses that dominated
            the kernel; as carried values they are register slices.
            Only chunks [c0, c1) — the run's slot span — are swept."""
            def tx(c):
                return scratch[slot, c, :].reshape(1, TILE)

            p0x, p0y, p0z = tx(0), tx(1), tx(2)
            e1x, e1y, e1z = tx(3), tx(4), tx(5)
            e2x, e2y, e2z = tx(6), tx(7), tx(8)

            def chunk_body(rs, carry):
                T, I = carry
                R = rt[rs]                           # (CHUNK, 8)
                ox, oy, oz = R[:, 0:1], R[:, 1:2], R[:, 2:3]
                dx, dy, dz = R[:, 3:4], R[:, 4:5], R[:, 5:6]
                lim = R[:, 6:7]

                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = ox - p0x
                tvy = oy - p0y
                tvz = oz - p0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 0.0) & (t < lim))
                t = jnp.where(hit, t, _BIG)
                tk = jnp.min(t, axis=1, keepdims=True)   # (CHUNK, 1)
                k = jnp.min(jnp.where(t <= tk, cols, jnp.int32(TILE)),
                            axis=1, keepdims=True)
                at = ncol == rs                       # (CHUNK, NSTEP)
                upd = at & (tk < T)
                return (jnp.where(upd, tk, T),
                        jnp.where(upd, tid * TILE + k, I))

            return jax.lax.fori_loop(c0, c1, chunk_body, (T, I))

        @pl.when(runs_ref[g, 0] != SENTINEL)
        def _():
            # the group's rays, re-laid out (NSTEP, CHUNK, 8) once
            rt[:, :, :] = jnp.transpose(
                rays_ref[:, pl.ds(g * B, B)], (1, 0)).reshape(
                    NSTEP, CHUNK, 8)
            # warmup: start the first NBUF tile DMAs
            for j in range(NBUF):
                tj = runs_ref[g, j]

                @pl.when(tj != SENTINEL)
                def _(tj=tj, j=j):
                    start_dma(j, tj)

            def body(carry):
                r, T, I = carry
                tid = runs_ref[g, r]
                b = bnds_ref[g, r]
                slot = jax.lax.rem(r, NBUF)
                wait_dma(slot, tid)
                T, I = sweep(slot, tid, b // 16, b % 16, T, I)
                t_n = runs_ref[g, r + NBUF]

                @pl.when(t_n != SENTINEL)
                def _():
                    start_dma(slot, t_n)

                return (r + 1, T, I)

            _, T, I = jax.lax.while_loop(
                lambda c: runs_ref[g, c[0]] != SENTINEL, body,
                (jnp.int32(0), init_T, init_I))
            t_ref[g, :, :] = T
            id_ref[g, :, :] = I

        @pl.when(runs_ref[g, 0] == SENTINEL)
        def _():
            t_ref[g, :, :] = init_T
            id_ref[g, :, :] = init_I

    for g in range(NG_SW):
        group(g)


def _run_sweep(rays8, tids, tri_soa, any_hit: bool):
    """rays8 (8, N) channel-major sorted slot columns (ox oy oz dx dy
    dz lim _); tids (N,) i32 sorted tile keys.  Returns (t (N,),
    id (N,)) — best-t and global clustered prim id (-1 on miss)."""
    n = rays8.shape[1]
    blk = NG_SW * GROUP
    grid = (n // blk,)
    ngroups = n // GROUP
    # per-group DISTINCT-tile lists (run walk tables), one vectorized
    # pass: runs are maximal same-key spans of the sorted keys, so the
    # distinct tiles of a group are its run-start keys; the row sort
    # left-aligns them ascending (= front-to-back id order) with
    # SENTINEL padding, plus NBUF pad columns for the ring lookahead
    gkey = tids.reshape(ngroups, GROUP)
    is_start = jnp.concatenate(
        [jnp.ones((ngroups, 1), bool), gkey[:, 1:] != gkey[:, :-1]], 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (ngroups, GROUP), 1)
    mkey = jnp.where(is_start, gkey, SENTINEL)
    mpos = jnp.where(is_start, pos, GROUP)
    # lexicographic (key, pos) sort: real run starts left-aligned
    # ascending; a group's sentinel-key run (if any) sorts before the
    # non-start pads, so ends[j] = starts[j+1] is exact for real runs
    runs, starts = jax.lax.sort([mkey, mpos], dimension=1, num_keys=2)
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((ngroups, 1), GROUP, jnp.int32)], 1)
    ends = jnp.minimum(ends, GROUP)
    # packed chunk bounds: c0*16 + c1, chunks [c0, c1) cover the run
    bnds = (starts // CHUNK) * 16 + (jnp.maximum(ends, starts + 1)
                                     + CHUNK - 1) // CHUNK
    runs = jnp.pad(runs, ((0, 0), (0, NBUF)), constant_values=SENTINEL)
    bnds = jnp.pad(bnds, ((0, 0), (0, NBUF)))

    out_spec = pl.BlockSpec((NG_SW, CHUNK, NSTEP), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    import os
    kernel = functools.partial(_run_sweep_kernel, any_hit=any_hit)
    interpret = (jax.default_backend() != "tpu"
                 or bool(os.environ.get("MT_INTERPRET_SWEEP")))
    t, pid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NG_SW, GROUP + NBUF), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NG_SW, GROUP + NBUF), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((ngroups, CHUNK, NSTEP), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, CHUNK, NSTEP), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, 16, TILE), jnp.float32),
            pltpu.VMEM((NSTEP, CHUNK, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(runs, bnds, rays8, tri_soa)
    # slot l of group g sits at [g, l % CHUNK, l // CHUNK]
    t = jnp.transpose(t, (0, 2, 1)).reshape(n)
    pid = jnp.transpose(pid, (0, 2, 1)).reshape(n)
    return (t, pid)


# ---------------------------------------------------------------------------
# driver: round body, staged compaction
# ---------------------------------------------------------------------------

_RAY_CH = [_CH["o"], _CH["o"] + 1, _CH["o"] + 2,
           _CH["d"], _CH["d"] + 1, _CH["d"] + 2,
           _CH["limit"], _CH["limit"]]


def _round_body(carry, soa, sup_ab, tile_c, ns_real, n_tiles_real,
                any_hit):
    S, bt, bid, orig, rounds = carry
    npad = S.shape[0] * GROUP
    keys, tnext, S = _select(S, sup_ab, tile_c, ns_real, n_tiles_real)

    # sort K*N (key, slot) pairs — k-major slots so slot % N = lane
    key_flat = jnp.moveaxis(keys, 1, 0).reshape(K_EMIT * npad)
    slot = jnp.arange(K_EMIT * npad, dtype=jnp.int32)
    skey, sslot = jax.lax.sort([key_flat, slot], num_keys=1)
    lane_of = sslot % npad

    ray_rows = jnp.moveaxis(S[:, jnp.array(_RAY_CH), :], 1, 2)
    ray_rows = ray_rows.reshape(npad, 8)
    t_s, id_s = _run_sweep(ray_rows[lane_of].T, skey, soa, any_hit)

    # un-sort by a second key sort (a slot-indexed scatter measured
    # ~21 ms per round on TPU — the sort is ~10x cheaper)
    _, t_o, id_o = jax.lax.sort([sslot, t_s, id_s], num_keys=1)
    t_o = jnp.where(t_o >= _BIG * 0.5, jnp.inf, t_o).reshape(K_EMIT, npad)
    id_o = id_o.reshape(K_EMIT, npad)
    kbest = jnp.argmin(t_o, axis=0)
    tt_c = jnp.min(t_o, axis=0)
    upd = tt_c < bt
    bt = jnp.where(upd, tt_c, bt)
    oh = jax.lax.broadcasted_iota(jnp.int32, id_o.shape, 0) == kbest[None]
    bid = jnp.where(upd, jnp.sum(jnp.where(oh, id_o, 0), axis=0), bid)

    # write back limit (+ eager termination) into the state: a lane is
    # done as soon as its best hit is nearer than t_next, the select
    # kernel's lower bound on every still-unvisited candidate — without
    # this the done flag lagged a round and round 2 always ran at full
    # wavefront size
    limit = jnp.minimum(
        S[:, _CH["maxt"], :].reshape(npad), bt).reshape(-1, GROUP)
    S = S.at[:, _CH["limit"], :].set(limit)
    tn_flat = tnext.reshape(npad)
    fin = ((bt <= tn_flat) | (tn_flat >= _BIG * 0.5)
           | (tn_flat > S[:, _CH["maxt"], :].reshape(npad)))
    S = S.at[:, _CH["done"], :].max(
        fin.astype(jnp.float32).reshape(-1, GROUP))
    if any_hit:
        hitf = (bid >= 0).astype(jnp.float32).reshape(-1, GROUP)
        S = S.at[:, _CH["done"], :].max(hitf)
    return (S, bt, bid, orig, rounds + 1)


def _active_count(S):
    return jnp.sum((S[:, _CH["done"], :] < 0.5).astype(jnp.int32))


def _progressed(S):
    return jnp.any(S[:, _CH["progress"], :] > 0.5)


def _compact(carry, new_n):
    """Sort lanes by done flag (active first) and shrink to new_n."""
    S, bt, bid, orig, rounds = carry
    n = S.shape[0] * GROUP
    done = (S[:, _CH["done"], :].reshape(n) > 0.5).astype(jnp.int32)
    perm = jnp.argsort(done, stable=True)[:new_n]
    S_flat = jnp.moveaxis(S, 1, 2).reshape(n, NCH)
    S_new = jnp.moveaxis(
        S_flat[perm].reshape(new_n // GROUP, GROUP, NCH), 2, 1)
    return (S_new, bt[perm], bid[perm], orig[perm], rounds)


@functools.partial(jax.jit,
                   static_argnames=("ns_real", "n_tiles_real", "any_hit"))
def ray_triangles_binned(o, d, maxt, tri_soa, sup_ab, tile_c,
                         ns_real: int, n_tiles_real: int,
                         any_hit: bool = False, prim_map=None):
    """Front-to-back binned tracing (module docstring).

    Returns (t, u, v, ordered_prim_id) with t == inf / id == -1 on
    miss; ``prim_map`` (from pack_binned) converts sweep slot ids into
    ordered prim indices (identity when None).  Rays need NO
    pre-sorting: the global per-round key sort provides run coherence
    regardless of ray order.
    """
    n = o.shape[0]
    blk = RL * GROUP
    pad = (-n) % blk
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        maxt = jnp.pad(maxt, (0, pad), constant_values=-1.0)
    npad = n + pad

    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d < 0, -1e-20, 1e-20), d)
    # clamp maxt to the scene-bbox exit (miss lanes terminate as soon
    # as their frontier passes the geometry instead of marching to inf)
    glo = jnp.min(sup_ab[:ns_real, 0:3], axis=0)
    ghi = jnp.max(sup_ab[:ns_real, 3:6], axis=0)
    t_exit = jnp.min(jnp.maximum((glo[None] - o) * inv,
                                 (ghi[None] - o) * inv), axis=-1)
    maxt = jnp.minimum(maxt, jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-4)

    done0 = (maxt <= 0.0).astype(jnp.float32)
    chans = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             inv[:, 0], inv[:, 1], inv[:, 2],
             maxt, maxt,                             # limit, maxt
             jnp.full((npad,), -1.0), jnp.full((npad,), -1.0),
             jnp.full((npad,), -1.0), jnp.full((npad,), -1.0),
             jnp.full((npad,), -1.0),                # cur, ls_t/i, lt_t/i
             done0, jnp.ones((npad,)),               # done, progress
             jnp.zeros((npad,)), jnp.zeros((npad,))]
    S = jnp.moveaxis(
        jnp.stack(chans, 0).reshape(NCH, npad // GROUP, GROUP), 0, 1)

    carry = (S, jnp.full((npad,), jnp.inf),
             jnp.full((npad,), -1, jnp.int32),
             jnp.arange(npad, dtype=jnp.int32), jnp.int32(0))

    max_rounds = n_tiles_real + ns_real + 8
    body = functools.partial(_round_body, soa=tri_soa, sup_ab=sup_ab,
                             tile_c=tile_c, ns_real=ns_real,
                             n_tiles_real=n_tiles_real, any_hit=any_hit)

    # stage sizes: full -> 1/2 -> 1/4 -> 1/16 (multiples of one select
    # block); compaction costs ~2 ms at full wavefront vs ~10+ ms for
    # a full-size round, so compact as soon as half the lanes are done
    sizes = [npad]
    for f in (2, 4, 16):
        s = max((npad // f) // blk * blk, blk)
        if s < sizes[-1]:
            sizes.append(s)

    res_t = jnp.full((npad,), jnp.inf)
    res_id = jnp.full((npad,), -1, jnp.int32)

    for si, size in enumerate(sizes):
        if si:
            carry = _compact(carry, size)
        thr = sizes[si + 1] if si + 1 < len(sizes) else 0

        def cond(c, thr=thr):
            S_c, rounds = c[0], c[4]
            return (_progressed(S_c) & (rounds < max_rounds)
                    & (_active_count(S_c) > thr))

        carry = jax.lax.while_loop(cond, lambda c: body(c), carry)
        _, bt, bid, orig, _ = carry
        res_t = res_t.at[orig].set(bt)
        res_id = res_id.at[orig].set(bid)

    # u,v reconstruction — once per lane, after tracing (the sweep
    # kernel only tracks t+id); same Moller-Trumbore math as the sweep
    tid = jnp.maximum(res_id, 0) // TILE
    col = jnp.maximum(res_id, 0) % TILE
    rows = tri_soa[tid, :, col]                       # (npad, 16)
    p0l, e1l, e2l = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    pv = jnp.cross(d, e2l)
    det = jnp.sum(e1l * pv, -1)
    invd = jnp.where(jnp.abs(det) > 1e-12,
                     1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvv = o - p0l
    uu = jnp.sum(tvv * pv, -1) * invd
    vv = jnp.sum(d * jnp.cross(tvv, e1l), -1) * invd
    hit = res_id >= 0
    uu = jnp.where(hit, uu, 0.0)
    vv = jnp.where(hit, vv, 0.0)
    t = jnp.where(hit, res_t, jnp.inf)
    if prim_map is not None:
        res_id = jnp.where(hit, prim_map[jnp.maximum(res_id, 0)], -1)
    return (t[:n], uu[:n], vv[:n], res_id[:n])
