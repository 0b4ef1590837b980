"""Pin down the true device cost of each coordination variant:
- row gather (786k,8) by random index, output row-major
- same + transpose to (8,786k) channel-major (what _run_sweep wants)
- lane-axis gather on a channel-major (8,N) source
- sort with uniform vs half-sentinel key distributions
Each measured as an in-jit x8 chain with full-width data deps.
"""
import time

import jax
import jax.numpy as jnp

N = 131072
M = 6 * N


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def chain8(step):
    """Run step 8x with a full-width additive data dep."""
    def f(idx, S):
        def body(i, c):
            out = step(idx, S)           # same op each iter
            # full-width dep: fold out into a scalar added to idx
            return c + (out.ravel()[0] > 0).astype(jnp.int32)
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))
    return f


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
    S = jax.random.normal(key, (N, 8), dtype=jnp.float32)
    S_cm = S.T.copy()                    # (8, N)

    v = {
        "gather rows (M,8)": lambda i, S=S: S[i],
        "gather rows + .T -> (8,M)": lambda i, S=S: S[i].T,
        "cm lane-gather (8,N)[:,i]": lambda i, S=S_cm: S_cm[:, i],
        "gather col0 only (M,)": lambda i, S=S: S[i, 0],
    }
    for name, step in v.items():
        f = jax.jit(chain8(step))
        print(f"{name:30s} {timeit(f, idx, S)/8:.3f} ms/op")

    # plain transpose cost
    R = S[idx]
    f_t = jax.jit(chain8(lambda i, R=R: R.T))
    print(f"{'transpose (M,8)->(8,M)':30s} {timeit(f_t, idx, S)/8:.3f} ms/op")

    # sorts
    slot = jnp.arange(M, dtype=jnp.int32)
    k_uni = jax.random.randint(key, (M,), 0, 10927, dtype=jnp.int32)
    k_sent = jnp.where(jax.random.uniform(key, (M,)) < 0.5,
                       jnp.int32(0x7FFFFFFF), k_uni)
    k_sorted = jnp.sort(k_uni)
    for name, k in (("sort uniform", k_uni), ("sort half-sentinel", k_sent),
                    ("sort presorted", k_sorted)):
        f = jax.jit(chain8(lambda i, k=k: jax.lax.sort([k, slot],
                                                       num_keys=1)[1]))
        print(f"{name:30s} {timeit(f, idx, S)/8:.3f} ms/op")


if __name__ == "__main__":
    main()
