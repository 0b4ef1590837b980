"""Careful re-probe: full-width payloads, all outputs returned, and a
786k standalone sort — checking whether round-4's 42 ns/slot
coordination roofline was real or a measurement artifact."""
import time

import jax
import jax.numpy as jnp

N = 131072
K = 6


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
    keys6 = jax.random.randint(key, (K * N,), 0, 8192, dtype=jnp.int32)
    slot6 = jnp.arange(K * N, dtype=jnp.int32)
    S = jax.random.normal(key, (N, 8), dtype=jnp.float32)

    f1 = jax.jit(lambda k, s: jax.lax.sort([k, s], num_keys=1))
    print(f"sort (i32,i32) {K*N}: {timeit(f1, keys6, slot6):.3f} ms")

    def gather_full(S, ss):
        return S[ss % N]          # (786k, 8) full rows, returned whole
    f2 = jax.jit(gather_full)
    sk, ss = f1(keys6, slot6)
    print(f"row gather ({K*N},8): {timeit(f2, S, ss):.3f} ms")

    tvals = jax.random.uniform(key, (K * N,))
    ivals = jax.random.randint(key, (K * N,), 0, 1 << 20, jnp.int32)
    f3 = jax.jit(lambda s, t, i: jax.lax.sort([s, t, i], num_keys=1))
    print(f"unsort (i32,f32,i32) {K*N}: {timeit(f3, ss, tvals, ivals):.3f} ms")

    # chained, like the real round (dependencies, no interleave slack)
    def chain(k, s, S, tv, iv):
        sk, ss = jax.lax.sort([k, s], num_keys=1)
        rays = S[ss % N]
        t2 = tv * rays.sum(-1)
        _, t_o, i_o = jax.lax.sort([ss, t2, iv], num_keys=1)
        return sk, rays, t_o, i_o
    f4 = jax.jit(chain)
    print(f"chained round coord: {timeit(f4, keys6, slot6, S, tvals, ivals):.3f} ms")


if __name__ == "__main__":
    main()
