"""Validate the binned tracer ON TPU against the XLA BVH traversal
(trusted reference) — CPU tests run the kernels in interpret mode, so
a Mosaic-only miscompile would slip through without this."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 15

    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt
    from mitsuba3_amvpt_tpu.accel.build import build_bvh
    from mitsuba3_amvpt_tpu.accel import traverse as tv

    d = sphere_field(n_target)
    v = d["spheres"]["vertices"]
    f = d["spheres"]["faces"]
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, meta_b, order = build_bvh(lo, hi)
    p0o, p1o, p2o = p0[order], p1[order], p2[order]

    rng = np.random.default_rng(7)
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

    from mitsuba3_amvpt_tpu.accel.build import treelet_tiles
    starts = treelet_tiles(meta_b, p0o.shape[0], bt.TILE)
    soa, sup_ab, tile_c, ns, nt, pmap = bt.pack_binned(
        jnp.asarray(p0o), jnp.asarray(p1o), jnp.asarray(p2o),
        tile_starts=starts)
    t_b, u_b, v_b, id_b = bt.ray_triangles_binned(
        o, dd, maxt, soa, sup_ab, tile_c, ns, nt, prim_map=pmap)
    t_b, id_b = np.asarray(t_b), np.asarray(id_b)

    # reference: dense scan-based brute over ordered tris (float exact)
    def brute_chunk(o_c, d_c):
        t, u, v, hit = tv.ray_triangle(
            o_c[:, None, :], d_c[:, None, :],
            jnp.asarray(p0o)[None], jnp.asarray(p1o)[None],
            jnp.asarray(p2o)[None])
        t = jnp.where(hit, t, jnp.inf)
        return jnp.min(t, axis=1), jnp.argmin(t, axis=1)

    ts, ids = [], []
    # chunk so the (C, F, 3) brute broadcast fits HBM at 1M tris
    C = max(64, min(2048, (1 << 31) // max(p0.shape[0], 1)))
    bc = jax.jit(brute_chunk)
    for i in range(0, n, C):
        tt, ii = bc(o[i:i + C], dd[i:i + C])
        ts.append(np.asarray(tt))
        ids.append(np.asarray(ii))
    t_r = np.concatenate(ts)
    id_r = np.concatenate(ids)

    hit_b = np.isfinite(t_b)
    hit_r = np.isfinite(t_r)
    mism = hit_b != hit_r
    # separate knife-edge degeneracies (t within ~the self-intersection
    # offset scale) from REAL disagreements
    t_any = np.where(hit_r, t_r, t_b)
    real = mism & (t_any > 1e-2)
    print(f"lanes {n}  hit_b {hit_b.mean():.5f}  hit_r {hit_r.mean():.5f}"
          f"  hit mismatches {mism.sum()} (real: {real.sum()})")
    both = hit_b & hit_r & (t_r > 1e-2)
    dt = np.abs(t_b[both] - t_r[both])
    rel = dt / t_r[both]
    bad = rel > 1e-3
    print(f"t relerr (t>1e-2): mean {rel.mean():.2e} max {rel.max():.2e}"
          f" >1e-3: {bad.sum()}")
    same_id = (id_b[both] == id_r[both]).mean()
    print(f"id agreement {same_id:.5f}")
    for j in np.where(real)[0][:6]:
        print("  real miss:", j, "t_b", t_b[j], "t_r", t_r[j])
    badi = np.where(both)[0][np.where(bad)[0][:6]] if bad.any() else []
    for j in badi:
        print("  bad t:", j, "t_b", t_b[j], "t_r", t_r[j],
              "id_b", id_b[j], "id_r(ordered)", id_r[j])


if __name__ == "__main__":
    main()
