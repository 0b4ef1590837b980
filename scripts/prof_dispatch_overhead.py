"""Separate per-dispatch (axon relay) overhead from true device cost:
time each coordination op (a) dispatched singly, (b) looped 10x inside
one jit via lax.fori_loop (data-dependent chain so nothing elides)."""
import sys
import time

import jax
import jax.numpy as jnp

N = 131072
K = 6


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    # realistic key distribution: ~half sentinel, rest clustered tiles
    kf = jax.random.randint(key, (K * N,), 0, 10927, dtype=jnp.int32)
    sent = jax.random.uniform(key, (K * N,)) < 0.5
    kf = jnp.where(sent, jnp.int32(0x7FFFFFFF), kf)
    slot = jnp.arange(K * N, dtype=jnp.int32)

    def one(kf):
        sk, ss = jax.lax.sort([kf, slot], num_keys=1)
        return sk, ss

    def ten(kf):
        def body(i, c):
            sk, ss = jax.lax.sort([c, slot], num_keys=1)
            return sk ^ (ss & 1)          # data dep, same distribution-ish
        return jax.lax.fori_loop(0, 10, body, kf)

    print(f"sort single-dispatch: {timeit(jax.jit(one), kf):.3f} ms")
    print(f"sort in-jit x10:      {timeit(jax.jit(ten), kf)/10:.3f} ms/iter")

    S = jax.random.normal(key, (N, 8), dtype=jnp.float32)
    perm = jax.random.permutation(key, K * N) % N

    def gone(p):
        return S[p].T

    def gten(p):
        def body(i, c):
            r = S[(p + i) % N]
            return p + (r[:, 0] > 0).astype(jnp.int32)
        return jax.lax.fori_loop(0, 10, body, p)

    print(f"gather single-dispatch: {timeit(jax.jit(gone), perm):.3f} ms")
    print(f"gather in-jit x10:      {timeit(jax.jit(gten), perm)/10:.3f} ms/iter")


if __name__ == "__main__":
    main()
