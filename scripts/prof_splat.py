"""Microbenchmark: TPU film-splat strategies at AMVPT scale.

Round-5 question (VERDICT r4 #2): the 8-view group splat is a 4.2M-lane
scatter-add; the NOSPLAT pass delta was ~165 ms.  Hypothesis: XLA:TPU
serializes scatter updates (~40 ns each) regardless of collisions.
Candidate replacement: histogram-matmul splat — image[r, c] =
sum_i 1[y_i = r] * 1[x_i = c] * d_i as onehot_y @ (onehot_x * data),
chunked over samples, MXU-bound instead of scatter-bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    VH, VW = 256, 256
    S = 8
    n = 524288            # bench wavefront per pass (8 views, 256^2, spp1)
    key = jax.random.PRNGKey(0)
    ky, kx, kd = jax.random.split(key, 3)
    # per-view sample sets (S slots x n lanes -> per-view n samples)
    y = jax.random.randint(ky, (S, n), 0, VH, jnp.int32)
    x = jax.random.randint(kx, (S, n), 0, VW, jnp.int32)
    d = jax.random.uniform(kd, (S, n, 4), jnp.float32)

    # ---- 1. plain scatter-add (current film_put box path), quilt-wide
    @jax.jit
    def scatter(y, x, d):
        acc = jnp.zeros((VH, VW * S, 4), jnp.float32)
        xg = x + (jnp.arange(S) * VW)[:, None]
        yf = y.reshape(-1)
        xf = xg.reshape(-1)
        df = d.reshape(-1, 4)
        df, xf, yf = jax.lax.optimization_barrier((df, xf, yf))
        return acc.at[yf, xf].add(df, mode="drop")

    ms, ref = timeit(scatter, y, x, d)
    print(f"scatter 4.2M:                 {ms:8.2f} ms", flush=True)

    # ---- 2. histogram-matmul, per view, chunked over samples
    def dense_one(yv, xv, dv, chunk, prec):
        # (n,) (n,) (n,4) -> (VH, VW, 4)
        def body(acc, args):
            yc, xc, dc = args
            oy = (yc[:, None] == jnp.arange(VH)[None, :])
            ox = (xc[:, None] == jnp.arange(VW)[None, :])
            A = oy.astype(jnp.bfloat16).T                      # (VH, c)
            B = (ox[:, :, None] * dc[:, None, :]).astype(
                jnp.bfloat16).reshape(chunk, VW * 4)           # (c, VW*4)
            acc = acc + jax.lax.dot(A, B,
                                    precision=prec,
                                    preferred_element_type=jnp.float32)
            return acc, None
        nc = yv.shape[0] // chunk
        acc0 = jnp.zeros((VH, VW * 4), jnp.float32)
        acc, _ = jax.lax.scan(
            body, acc0, (yv.reshape(nc, chunk), xv.reshape(nc, chunk),
                         dv.reshape(nc, chunk, 4)))
        return acc.reshape(VH, VW, 4)

    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        for chunk in (4096, 8192, 16384):
            @jax.jit
            def dense_all(y, x, d, chunk=chunk, prec=prec):
                tiles = jax.vmap(lambda a, b, c: dense_one(a, b, c, chunk,
                                                           prec))(y, x, d)
                # (S, VH, VW, 4) -> quilt by static concat
                return jnp.concatenate(list(tiles), axis=1)

            ms, out = timeit(dense_all, y, x, d)
            err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(ref))
            print(f"matmul prec={str(prec):28s} chunk={chunk:6d}: "
                  f"{ms:8.2f} ms   rel_err={err:.2e}", flush=True)

    # ---- 3. scatter with sorted segments (refill-style: groups of 4
    # consecutive lanes share a pixel, pre-reduced -> 131k unique sorted)
    @jax.jit
    def scatter_sorted(y, x, d):
        yf = y[0].reshape(-1, 4)[:, 0]
        xf = x[0].reshape(-1, 4)[:, 0]
        df = d[0].reshape(-1, 4, 4).sum(1)
        acc = jnp.zeros((VH, VW, 4), jnp.float32)
        return acc.at[yf, xf].add(df, mode="drop")

    ms, _ = timeit(scatter_sorted, y, x, d)
    print(f"scatter 131k pre-reduced:     {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
