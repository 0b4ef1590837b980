"""Source-attributed device-op profile of the full binned trace on the
1M bench scene with a realistic incoherent bounce wavefront."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def build():
    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt
    from mitsuba3_amvpt_tpu.accel.build import build_bvh, treelet_tiles

    d = sphere_field(1_000_000)
    v = d["spheres"]["vertices"]
    f = d["spheres"]["faces"]
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, meta_b, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]

    n = 1 << 17
    rng = np.random.default_rng(1)
    ti = rng.integers(0, p0.shape[0], n)
    b1 = rng.random(n).astype(np.float32)
    b2 = rng.random(n).astype(np.float32)
    sw = b1 + b2 > 1
    b1 = np.where(sw, 1 - b1, b1)
    b2 = np.where(sw, 1 - b2, b2)
    pt = p0[ti] + (p1[ti] - p0[ti]) * b1[:, None] + \
        (p2[ti] - p0[ti]) * b2[:, None]
    nrm = np.cross(p1[ti] - p0[ti], p2[ti] - p0[ti])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    dr = rng.normal(size=(n, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
    flip = (dr * nrm).sum(-1) < 0
    dr = np.where(flip[:, None], -dr, dr).astype(np.float32)
    o = jnp.asarray(pt + 1e-3 * nrm)
    dd = jnp.asarray(dr)
    maxt = jnp.full((n,), jnp.inf)

    starts = treelet_tiles(meta_b, p0.shape[0], bt.TILE)
    soa, sup_ab, tile_c, ns, nt, pmap = bt.pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        tile_starts=starts)
    return (jax.device_put(o), jax.device_put(dd), maxt,
            jax.device_put(soa), jax.device_put(sup_ab),
            jax.device_put(tile_c), ns, nt, jax.device_put(pmap))


def main():
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt
    from prof_attr import profile_attr
    o, dd, maxt, soa, sup_ab, tile_c, ns, nt, pmap = build()

    def full(o, dd, maxt):
        return bt.ray_triangles_binned(o, dd, maxt, soa, sup_ab, tile_c,
                                       ns, nt, prim_map=pmap)

    profile_attr(full, (o, dd, maxt), top=40, label="binned")


if __name__ == "__main__":
    main()
