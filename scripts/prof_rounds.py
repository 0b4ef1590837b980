"""Diagnose round structure: active lanes after each round at full
wavefront, on the 1M bench scene."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from prof_binned_attr import build


def main():
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt
    o, dd, maxt, soa, sup_ab, tile_c, ns, nt, pmap = build()
    n = o.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20,
                          jnp.where(dd < 0, -1e-20, 1e-20), dd)
    glo = jnp.min(sup_ab[:ns, 0:3], axis=0)
    ghi = jnp.max(sup_ab[:ns, 3:6], axis=0)
    t_exit = jnp.min(jnp.maximum((glo[None] - o) * inv,
                                 (ghi[None] - o) * inv), axis=-1)
    mt = jnp.minimum(maxt, jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-4)
    chans = [o[:, 0], o[:, 1], o[:, 2], dd[:, 0], dd[:, 1], dd[:, 2],
             inv[:, 0], inv[:, 1], inv[:, 2], mt, mt,
             jnp.full((n,), -1.0), jnp.full((n,), -1.0),
             jnp.full((n,), -1.0), jnp.full((n,), -1.0),
             jnp.full((n,), -1.0),
             jnp.zeros((n,)), jnp.ones((n,)),
             jnp.zeros((n,)), jnp.zeros((n,))]
    S = jnp.moveaxis(
        jnp.stack(chans, 0).reshape(bt.NCH, n // 128, 128), 0, 1)

    carry = (S, jnp.full((n,), jnp.inf), jnp.full((n,), -1, jnp.int32),
             jnp.arange(n, dtype=jnp.int32), jnp.int32(0))

    import functools
    body = jax.jit(functools.partial(
        bt._round_body, soa=soa, sup_ab=sup_ab, tile_c=tile_c,
        ns_real=ns, n_tiles_real=nt, any_hit=False))

    for r in range(8):
        carry = body(carry)
        S_c = carry[0]
        act = int(jnp.sum((S_c[:, bt._CH["done"], :] < 0.5)))
        hits = int(jnp.sum(carry[2] >= 0))
        print(f"round {r+1}: active {act} ({act/n:.1%})  "
              f"hits {hits}", flush=True)


if __name__ == "__main__":
    main()
