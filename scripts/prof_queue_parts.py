"""Microbench the coordination pieces of the round-5 queue-tracer
design (K=1, state-in-sorted-order): per-round key sort, state-row
permute gather, and elementwise merge — vs the round-4 design's
sort/gather/unsort at K_EMIT slots.

Run on the real chip: python scripts/prof_queue_parts.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 131072
NCH = 36


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (N,), 0, 8192, dtype=jnp.int32)
    slot = jnp.arange(N, dtype=jnp.int32)
    S = jax.random.normal(key, (N, NCH), dtype=jnp.float32)
    S_cm = jnp.moveaxis(S.reshape(N // 128, 128, NCH), 2, 1)  # (NB,NCH,128)
    perm = jax.random.permutation(key, N)

    f_sort = jax.jit(lambda k, s: jax.lax.sort([k, s], num_keys=1))
    print(f"sort (i32,i32) {N}: {timeit(f_sort, keys, slot):.3f} ms")

    f_gather = jax.jit(lambda S, p: S[p])
    print(f"row gather ({N},{NCH}) f32: {timeit(f_gather, S, perm):.3f} ms")

    f_gather8 = jax.jit(lambda S, p: S[:, :8][p])
    print(f"row gather ({N},8) f32: {timeit(f_gather8, S, perm):.3f} ms")

    # channel-major permute: moveaxis->rows->gather->back
    def cm_permute(S_cm, p):
        flat = jnp.moveaxis(S_cm, 1, 2).reshape(N, NCH)
        out = flat[p]
        return jnp.moveaxis(out.reshape(N // 128, 128, NCH), 2, 1)
    f_cmp = jax.jit(cm_permute)
    print(f"cm-state permute ({N},{NCH}): {timeit(f_cmp, S_cm, perm):.3f} ms")

    # merge: elementwise min + where over (N,) arrays
    bt = jnp.abs(S[:, 0])
    t_new = jnp.abs(S[:, 1])
    f_merge = jax.jit(lambda bt, t: (jnp.minimum(bt, t), t < bt))
    print(f"elementwise merge: {timeit(f_merge, bt, t_new):.3f} ms")

    # reference: K=6 sort + gather + unsort (round-4 design costs)
    K = 6
    keys6 = jax.random.randint(key, (K * N,), 0, 8192, dtype=jnp.int32)
    slot6 = jnp.arange(K * N, dtype=jnp.int32)

    def old_round(k, s, S):
        sk, ss = jax.lax.sort([k, s], num_keys=1)
        rays = S[:, :8][ss % N]
        t = rays[:, 0]
        i = ss
        _, t_o, i_o = jax.lax.sort([ss, t, i], num_keys=1)
        return t_o, i_o
    f_old = jax.jit(old_round)
    print(f"OLD round coord (K=6 sort+gather+unsort): "
          f"{timeit(f_old, keys6, slot6, S):.3f} ms")

    # scatter-min probe (alternative merge)
    f_scat = jax.jit(lambda r, i, v: r.at[i].min(v))
    res = jnp.full((N,), 1e30)
    print(f"scatter-min {N}: {timeit(f_scat, res, perm, bt):.3f} ms")


if __name__ == "__main__":
    main()
