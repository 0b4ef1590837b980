"""Film: filter-weighted sample splatting + develop.

Replaces ImageBlock/HDRFilm/ReconstructionFilter of the reference
(src/render/imageblock.cpp scatter_reduce splatting, src/films/hdrfilm.cpp
develop, src/rfilters/*).  Accumulation is a pure-functional
scatter-add into an (H, W, C+1) tensor — the last channel holds the
accumulated filter weight, exactly the reference's layout
[R,G,B,W] (SURVEY.md §A.3) — so develop() is differentiable and the raw
accumulator is the checkpointable state (hdrfilm.cpp:308 raw=true).
"""

from __future__ import annotations

import math as pymath

import jax
import jax.numpy as jnp
from flax import struct

F_BOX = 0
F_TENT = 1
F_GAUSSIAN = 2
F_MITCHELL = 3
F_CATMULLROM = 4
F_LANCZOS = 5

_DEFAULT_RADII = {F_BOX: 0.5, F_TENT: 1.0, F_GAUSSIAN: 2.0,
                  F_MITCHELL: 2.0, F_CATMULLROM: 2.0, F_LANCZOS: 3.0}


def filter_eval(ftype: int, radius: float, x):
    """1D filter kernel value at offset x (src/rfilters/*.cpp)."""
    ax = jnp.abs(x)
    if ftype == F_BOX:
        return (ax <= radius).astype(x.dtype)
    if ftype == F_TENT:
        return jnp.maximum(1.0 - ax / radius, 0.0)
    if ftype == F_GAUSSIAN:
        sigma = radius / 2.0
        a = 1.0 / (2.0 * sigma * sigma)
        v = jnp.exp(-a * ax * ax) - pymath.exp(-a * radius * radius)
        return jnp.maximum(v, 0.0)
    if ftype in (F_MITCHELL, F_CATMULLROM):
        if ftype == F_MITCHELL:
            B = C = 1.0 / 3.0
        else:
            B, C = 0.0, 0.5
        x1 = ax * 2.0 / radius  # normalized to [0,2]
        x2 = x1 * x1
        x3 = x2 * x1
        v1 = ((12.0 - 9.0 * B - 6.0 * C) * x3
              + (-18.0 + 12.0 * B + 6.0 * C) * x2 + (6.0 - 2.0 * B)) / 6.0
        v2 = ((-B - 6.0 * C) * x3 + (6.0 * B + 30.0 * C) * x2
              + (-12.0 * B - 48.0 * C) * x1 + (8.0 * B + 24.0 * C)) / 6.0
        return jnp.where(x1 < 1.0, v1, jnp.where(x1 < 2.0, v2, 0.0))
    if ftype == F_LANCZOS:
        t = jnp.pi * ax
        t2 = t / radius
        s = jnp.where(ax < 1e-5, 1.0, jnp.sin(t) / jnp.maximum(t, 1e-20)
                      * jnp.sin(t2) / jnp.maximum(t2, 1e-20))
        return jnp.where(ax < radius, s, 0.0)
    raise ValueError(f"unknown filter {ftype}")


@struct.dataclass
class FilmConfig:
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    ftype: int = struct.field(pytree_node=False, default=F_GAUSSIAN)
    radius: float = struct.field(pytree_node=False, default=2.0)

    @property
    def n_taps(self):
        """Filter footprint half-size in whole pixels."""
        return int(pymath.ceil(self.radius - 0.5 + 1e-6))


def film_prepare(cfg: FilmConfig, channels: int = 3):
    """Fresh accumulator (Film::prepare / ImageBlock::clear)."""
    return jnp.zeros((cfg.height, cfg.width, channels + 1), jnp.float32)


def film_put(cfg: FilmConfig, acc, pos, values, weight=None, active=None,
             normalize: bool = False):
    """Splat samples into the accumulator (ImageBlock::put
    imageblock.cpp:126 scatter_reduce(Add)).

    pos: (N, 2) continuous pixel coordinates (x, y) in [0, W) x [0, H).
    values: (N, C).  weight: per-sample multiplier for the weight channel
    (1 by default; AMVPT adaptive refill uses 1/(n_adapt+1),
    mvpath_multi.h:52-58).  normalize: divide each sample's filter taps
    by their sum (ImageBlock set_normalize(true) — required by additive
    splatting like the particle tracer, where develop() does NOT divide
    by the weight channel).
    """
    H, W, _ = acc.shape
    n = pos.shape[0]
    if weight is None:
        weight = jnp.ones((n,), acc.dtype)
    if active is not None:
        weight = jnp.where(active, weight, 0.0)
        values = jnp.where(active[..., None], values, 0.0)

    data = jnp.concatenate([values * weight[..., None], weight[..., None]], -1)

    if cfg.ftype == F_BOX and cfg.radius <= 0.5 + 1e-6:
        xi = jnp.clip(pos[..., 0].astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(pos[..., 1].astype(jnp.int32), 0, H - 1)
        # INACTIVE lanes go out of bounds and are DROPPED (mode="drop"),
        # not clipped to pixel (0, 0)
        if active is not None:
            yi = jnp.where(active, yi, H)
        # Scatter PER CHANNEL as 1D operations.  The obvious 2D scatter
        # (acc.at[yi, xi].add(data) with (N, 4) updates) compiled to a
        # kCustom scatter fusion with a {0,1:T(4,128)} -> {1,0:T(8,128)}
        # layout-conversion transpose of the 64 MB updates fused INSIDE
        # the scatter emitter — 165 ms of a 233 ms AMVPT pass (round-5
        # HLO forensics, scripts/prof_mvpath_hlo.py; the scatter itself
        # is ~0.1 ms in isolation).  The (N, C) producer's natural
        # layout is {0,1} (columns contiguous), so per-channel columns
        # feed 1D scatters with no relayout at all.
        flat = yi * W + xi          # inactive lanes: >= H*W, dropped
        accf = acc.reshape(H * W, acc.shape[-1])
        cols = []
        for ch in range(data.shape[-1]):
            upd, fl = jax.lax.optimization_barrier((data[:, ch], flat))
            cols.append(accf[:, ch].at[fl].add(upd, mode="drop"))
        return jnp.stack(cols, -1).reshape(H, W, acc.shape[-1])

    # general filter: static K x K tap footprint around the sample
    base_x = jnp.floor(pos[..., 0] - 0.5).astype(jnp.int32)
    base_y = jnp.floor(pos[..., 1] - 0.5).astype(jnp.int32)
    K = 2 * cfg.n_taps
    taps = []
    wsum = jnp.zeros((n,), acc.dtype)
    for dy in range(K):
        for dx in range(K):
            px = base_x + (dx - cfg.n_taps + 1)
            py = base_y + (dy - cfg.n_taps + 1)
            wx = filter_eval(cfg.ftype, cfg.radius,
                             px.astype(acc.dtype) + 0.5 - pos[..., 0])
            wy = filter_eval(cfg.ftype, cfg.radius,
                             py.astype(acc.dtype) + 0.5 - pos[..., 1])
            w = wx * wy
            taps.append((px, py, w))
            wsum = wsum + w
    inv = (1.0 / jnp.maximum(wsum, 1e-12)) if normalize \
        else jnp.ones_like(wsum)
    for (px, py, w) in taps:
        inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        if active is not None:
            inb = inb & active
        # out-of-footprint taps are DROPPED (see box branch: clipped
        # colliding indices serialize the TPU scatter)
        px_c = jnp.clip(px, 0, W - 1)
        py_c = jnp.where(inb, jnp.clip(py, 0, H - 1), H)
        tap = data * (w * inv)[..., None]
        tap, px_c, py_c = jax.lax.optimization_barrier((tap, px_c, py_c))
        acc = acc.at[py_c, px_c].add(tap, mode="drop")
    return acc


def splat_tile_matmul(vh: int, vw: int, yi, xi, data, chunk: int = 32768):
    """Dense box-filter splat of scattered samples into a (vh, vw, CH)
    tile via MXU histogram matmuls — the TPU answer to ImageBlock's
    atomic scatter_reduce (imageblock.cpp:126).

    XLA:TPU lowers scatter-add to a serialized per-update loop
    (~7 ns/update measured on v5e — 4.2M-update AMVPT group splats cost
    ~30 ms *per channel*, round-5 HLO forensics).  The histogram
    identity  tile[r, c, ch] = sum_i 1[y_i==r] * 1[x_i==c] * d[i, ch]
    is two chained one-hot contractions: A = onehot(y) (vh, n) and
    B = onehot(x) * data (n, vw*CH), so tile = A @ B rides the MXU
    instead.  One-hot entries are exact in bf16; the data factor is
    split into bf16 hi + lo components (two DEFAULT-precision matmuls,
    relative error ~2^-16) so the result matches the f32 scatter path
    to ~1e-5 — compared against it in tests.

    Out-of-range yi/xi (inactive lanes) produce all-zero one-hot rows
    and are dropped naturally, matching film_put's mode="drop".

    yi, xi: (n,) int32; data: (n, CH) f32.  Returns (vh, vw, CH) f32.
    """
    n, CH = data.shape
    pad = (-n) % chunk
    if pad:
        yi = jnp.concatenate([yi, jnp.full((pad,), vh, jnp.int32)])
        xi = jnp.concatenate([xi, jnp.zeros((pad,), jnp.int32)])
        data = jnp.concatenate([data, jnp.zeros((pad, CH), data.dtype)])
        n += pad
    nc = n // chunk

    hi = data.astype(jnp.bfloat16)
    lo = (data - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(acc, args):
        yc, xc, hc, lc = args
        oy = (yc[None, :] == jnp.arange(vh)[:, None])            # (vh, c)
        ox = (xc[:, None] == jnp.arange(vw)[None, :])            # (c, vw)
        A = oy.astype(jnp.bfloat16)
        oxb = ox.astype(jnp.bfloat16)
        Bh = (oxb[:, :, None] * hc[:, None, :]).reshape(chunk, vw * CH)
        Bl = (oxb[:, :, None] * lc[:, None, :]).reshape(chunk, vw * CH)
        acc = acc + jax.lax.dot(A, Bh,
                                preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(A, Bl,
                                preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((vh, vw * CH), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0,
        (yi.reshape(nc, chunk), xi.reshape(nc, chunk),
         hi.reshape(nc, chunk, CH), lo.reshape(nc, chunk, CH)))
    return acc.reshape(vh, vw, CH)


def film_put_coalesced(cfg: FilmConfig, acc, jitter, values, spp: int,
                       weight=None, active=None):
    """Scatter-free splat for pixel-ordered wavefronts.

    TPU equivalent of ImageBlock's *coalesced* mode (imageblock.h:91-107):
    when lane i maps to pixel i//spp with sub-pixel offset ``jitter``,
    every filter tap becomes a dense per-pixel reduction followed by a
    statically-shifted add — no scatters touch HBM.  The footprint is the
    conservative (2R+1)^2 pixel neighbourhood, exactly like the
    reference's lockstep traversal.

    jitter: (N, 2) in [0, 1)^2; values: (N, C); N == H*W*spp.
    """
    H, W, CH = acc.shape
    C = CH - 1
    n = values.shape[0]
    if weight is None:
        weight = jnp.ones((n,), acc.dtype)
    if active is not None:
        weight = jnp.where(active, weight, 0.0)
    values = values * weight[..., None]

    R = int(cfg.radius + 0.5 - 1e-6)  # taps offsets -R..R
    jx = jitter[..., 0]
    jy = jitter[..., 1]

    def tap_weight_x(ox):
        return filter_eval(cfg.ftype, cfg.radius, ox + 0.5 - jx)

    def tap_weight_y(oy):
        return filter_eval(cfg.ftype, cfg.radius, oy + 0.5 - jy)

    for oy in range(-R, R + 1):
        wy = tap_weight_y(oy)
        for ox in range(-R, R + 1):
            w = tap_weight_x(ox) * wy                      # (N,)
            data = jnp.concatenate(
                [values * w[..., None], (weight * w)[..., None]], -1)
            img = data.reshape(H, W, spp, C + 1).sum(2)    # dense reduce
            ys0, ys1 = max(oy, 0), H + min(oy, 0)
            xs0, xs1 = max(ox, 0), W + min(ox, 0)
            ts0, ts1 = max(-oy, 0), H + min(-oy, 0)
            us0, us1 = max(-ox, 0), W + min(-ox, 0)
            acc = acc.at[ys0:ys1, xs0:xs1].add(img[ts0:ts1, us0:us1])
    return acc


import functools


@functools.partial(jax.jit, static_argnames=("raw",))
def film_develop(acc, raw: bool = False):
    """Weight division (HDRFilm::develop hdrfilm.cpp:304-400):
    values / select(weight == 0, 1, weight).  Differentiable.

    Jitted: called eagerly it would dispatch op-by-op, which dominates
    wall-clock on remote-attached TPUs."""
    if raw:
        return acc
    w = acc[..., -1:]
    return acc[..., :-1] / jnp.where(w == 0.0, 1.0, w)


def kahan_add(acc, comp, delta):
    """Error-compensated accumulation step (Kahan-Neumaier), the
    reference ImageBlock's ``compensate`` option
    (include/mitsuba/render/imageblock.h:108-114 +
    src/films/hdrfilm.cpp:227): fp32 accumulators at high spp x many
    passes lose low-order bits; carrying the rounding residual in a
    twin ``comp`` tensor restores ~fp64-grade sums at fp32 cost.

    Returns (acc', comp').  Relies on XLA's default strict fp semantics
    (no reassociation), which JAX guarantees without fast-math flags.
    """
    y = delta - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp
