"""Pallas TPU kernel for dense histogram film splatting.

Device-side replacement for ImageBlock's atomic scatter_reduce
(reference src/render/imageblock.cpp:126) at multi-view (AMVPT) scale.
XLA:TPU scatter-add serializes at ~7 ns/update, and the XLA histogram-
matmul formulation (film.splat_tile_matmul) must materialize the
one-hot-times-data operand in HBM — ~2 KB of traffic per sample
(measured ~17 GB for the 8-view bench quilt).  This kernel builds both
one-hot factors in VMEM per (view, chunk) grid cell and contracts them
on the MXU, so HBM sees only the packed samples once and the
(CH*vh, vw) accumulators at the end.

Math (per view tile): tile[r, c, ch] = sum_i 1[y_i==r] 1[x_i==c] d[i,ch].
The data factor rides the A side, stacked over (hi/lo, channel):
  A_all[(p, ch, r), i] = 1[y_i == r] * d_pch[i]       (2*CH*vh, chunk)
  B[i, c]              = 1[x_i == c]                   (chunk, vw)
  out = A_all @ B  -> reshape (2, CH*vh, vw) -> hi + lo
One-hot entries are exact in bf16; d is split into bf16 hi + lo parts
in-kernel (relative error ~2^-16 vs the f32 scatter path).

Inputs are packed as ONE (N, 8, n) f32 array with rows
[d0, d1, d2, d3, y, x, 0, 0] so every block is (8, chunk)
sublane-aligned (Mosaic requires last-two block dims divisible by
(8, 128)); y/x are exact in f32 below 2^24.

Out-of-range y (inactive lanes, pad) produce all-zero one-hot columns
and are dropped naturally, matching film_put's mode="drop" semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splat_kernel(a_ref, out_ref, *, vh: int, vw: int, ch: int,
                  chunk: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    aux = a_ref[0]                                        # (8, chunk) f32
    d = aux[0:ch]                                         # (CH, chunk)
    y = aux[ch]                                           # (chunk,)
    x = aux[ch + 1]
    hi = d.astype(jnp.bfloat16)
    lo = (d - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dall = jnp.concatenate([hi, lo], axis=0)              # (2*CH, chunk)

    yi = y.astype(jnp.int32)
    xi = x.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (vh, chunk), 0)
    A = (rows == yi[None, :]).astype(jnp.bfloat16)        # (vh, chunk)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, vw), 1)
    B = (cols == xi[:, None]).astype(jnp.bfloat16)        # (chunk, vw)
    A_all = (A[None] * dall[:, None, :]).reshape(2 * ch * vh, chunk)
    out = jnp.dot(A_all, B, preferred_element_type=jnp.float32)
    out = out.reshape(2, ch * vh, vw)
    out_ref[...] += (out[0] + out[1])[None]


@functools.partial(jax.jit, static_argnames=("vh", "vw", "chunk"))
def splat_tiles_pallas(vh: int, vw: int, yi, xi, data, chunk: int = 1024):
    """Batched dense box splat: N view tiles at once.

    yi, xi: (N, n) int32 tile-local pixel coords (out-of-range rows are
    dropped); data: (N, n, CH) f32.  Returns (N, vh, vw, CH) f32.

    Off-TPU falls back to the XLA histogram matmul (same math, HBM
    operand materialization is irrelevant at test scale).
    """
    N, n, CH = data.shape
    if jax.default_backend() != "tpu":
        from ..render.film import splat_tile_matmul
        return jnp.stack([
            splat_tile_matmul(vh, vw, yi[v], xi[v], data[v])
            for v in range(N)])
    assert CH <= 6, "packed layout holds CH data rows + y + x in 8"

    pad = (-n) % chunk
    if pad:
        yi = jnp.concatenate(
            [yi, jnp.full((N, pad), vh, jnp.int32)], axis=1)
        xi = jnp.concatenate(
            [xi, jnp.zeros((N, pad), jnp.int32)], axis=1)
        data = jnp.concatenate(
            [data, jnp.zeros((N, pad, CH), data.dtype)], axis=1)
        n += pad
    nc = n // chunk

    packed = jnp.concatenate(
        [jnp.moveaxis(data, -1, 1),                   # (N, CH, n)
         yi[:, None].astype(jnp.float32),
         xi[:, None].astype(jnp.float32),
         jnp.zeros((N, 8 - CH - 2, n), jnp.float32)], axis=1)

    out = pl.pallas_call(
        functools.partial(_splat_kernel, vh=vh, vw=vw, ch=CH, chunk=chunk),
        grid=(N, nc),
        in_specs=[pl.BlockSpec((1, 8, chunk), lambda v, c: (v, 0, c))],
        out_specs=pl.BlockSpec((1, CH * vh, vw), lambda v, c: (v, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, CH * vh, vw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(packed)
    # (N, CH*vh, vw) -> (N, vh, vw, CH)
    return jnp.moveaxis(out.reshape(N, CH, vh, vw), 1, -1)
