"""Emulate the stream kernel's cull+pop bookkeeping in pure jnp to
count admitted tiles / expected pops per block for each ray set."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 260_000
    wf_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 17

    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    from mitsuba3_amvpt_tpu.ops import stream_trace as st
    from mitsuba3_amvpt_tpu.accel.traverse import _ray_sort_keys
    from mitsuba3_amvpt_tpu.accel.build import build_bvh

    d = sphere_field(n_target)
    v = d["spheres"]["vertices"]
    f = d["spheres"]["faces"]
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, _, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]

    tb = np.asarray(st.tile_bounds16(jnp.asarray(p0), jnp.asarray(p1),
                                     jnp.asarray(p2)))
    n_tiles = tb.shape[1]
    print("tiles", n_tiles)

    n = 1 << wf_log2
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
    o = (pt + 1e-3 * nrm).astype(np.float32)

    keys = np.asarray(_ray_sort_keys(jnp.asarray(o), jnp.asarray(dr),
                                     jnp.asarray(lo.min(0)),
                                     jnp.asarray(hi.max(0))))
    perm = np.argsort(keys)
    o, dr = o[perm], dr[perm]

    # bbox-exit clamped maxt
    glo, ghi = tb[0:3].min(1), tb[3:6].max(1)
    inv = 1.0 / np.where(np.abs(dr) < 1e-20,
                         np.where(dr < 0, -1e-20, 1e-20), dr)
    t_exit = np.minimum.reduce(np.maximum((glo - o) * inv,
                                          (ghi - o) * inv).T).T
    t_exit = np.max(np.maximum((glo[None] - o) * inv,
                               (ghi[None] - o) * inv), -1)
    t_exit = np.min(np.maximum((glo[None] - o) * inv,
                               (ghi[None] - o) * inv), axis=-1)
    maxt = np.maximum(t_exit, 0.0) * 1.0001 + 1e-4

    B = st.RAY_BLOCK
    NG = st.NG
    GS = B // NG
    nb = n // B
    admitted = np.zeros(nb, np.int32)
    per_group = np.zeros((nb, NG), np.int32)
    for b in range(nb):
        adm = np.zeros(n_tiles, bool)
        for g in range(NG):
            s = b * B + g * GS
            og = o[s:s + GS]
            dg = dr[s:s + GS]
            invg = inv[perm][...] if False else \
                1.0 / np.where(np.abs(dg) < 1e-20,
                               np.where(dg < 0, -1e-20, 1e-20), dg)
            tmax_g = maxt[s:s + GS].max()
            olo, ohi = og.min(0), og.max(0)
            ilo, ihi = invg.min(0), invg.max(0)
            nearlo = np.zeros(n_tiles)
            farhi = np.zeros(n_tiles)
            nl_t = np.full(n_tiles, -np.inf)
            fh_t = np.full(n_tiles, np.inf)
            nears = []
            fars = []
            for ax in range(3):
                lo_t = tb[ax]
                hi_t = tb[3 + ax]
                mixed = (ilo[ax] < 0) & (ihi[ax] > 0)
                cands1 = [(lo_t - ohi[ax]) * ilo[ax],
                          (lo_t - ohi[ax]) * ihi[ax],
                          (lo_t - olo[ax]) * ilo[ax],
                          (lo_t - olo[ax]) * ihi[ax]]
                cands2 = [(hi_t - ohi[ax]) * ilo[ax],
                          (hi_t - ohi[ax]) * ihi[ax],
                          (hi_t - olo[ax]) * ilo[ax],
                          (hi_t - olo[ax]) * ihi[ax]]
                t1lo = np.minimum.reduce(cands1)
                t1hi = np.maximum.reduce(cands1)
                t2lo = np.minimum.reduce(cands2)
                t2hi = np.maximum.reduce(cands2)
                nearax = np.minimum(t1lo, t2lo)
                farax = np.maximum(t1hi, t2hi)
                if mixed:
                    nearax = np.full(n_tiles, -1e30)
                    farax = np.full(n_tiles, 1e30)
                nears.append(nearax)
                fars.append(farax)
            tnear = np.maximum(np.maximum.reduce(nears), 0.0)
            tfar = np.minimum.reduce(fars)
            hit_g = (tfar >= tnear) & (tnear < tmax_g)
            per_group[b, g] = hit_g.sum()
            adm |= hit_g
        admitted[b] = adm.sum()
    print("admitted tiles/block: mean %.0f p50 %.0f p90 %.0f max %d"
          % (admitted.mean(), np.percentile(admitted, 50),
             np.percentile(admitted, 90), admitted.max()))
    print("per-group admitted:   mean %.0f max %d"
          % (per_group.mean(), per_group.max()))
    print("group dir spread (deg, mean):",
          np.mean([np.degrees(np.arccos(np.clip(
              (dr[i * GS:(i + 1) * GS] @ dr[i * GS:(i + 1) * GS].mean(0)
               / max(np.linalg.norm(dr[i * GS:(i + 1) * GS].mean(0)),
                     1e-9)).min(), -1, 1)))
              for i in range(0, 200)]))


if __name__ == "__main__":
    main()
