"""Measure the TRUE front-to-back tile-visit distribution for the
binned tracer at several tile sizes: for each sampled ray, how many
treelet tiles must be swept (in t_near order) before its closest hit
is confirmed (best_t <= every remaining tile's entry t)?  Drives the
TILE / K_EMIT design math (ideal slot budget = sum of visits)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    from mitsuba3_amvpt_tpu.accel.build import build_bvh, treelet_tiles

    d = sphere_field(n_target)
    v = d["spheres"]["vertices"]
    f = d["spheres"]["faces"]
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, meta, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    F = p0.shape[0]

    rng = np.random.default_rng(1)
    ti = rng.integers(0, F, n_rays)
    b1 = rng.random(n_rays).astype(np.float32)
    b2 = rng.random(n_rays).astype(np.float32)
    sw = b1 + b2 > 1
    b1 = np.where(sw, 1 - b1, b1)
    b2 = np.where(sw, 1 - b2, b2)
    pt = p0[ti] + (p1[ti] - p0[ti]) * b1[:, None] \
        + (p2[ti] - p0[ti]) * b2[:, None]
    nrm = np.cross(p1[ti] - p0[ti], p2[ti] - p0[ti])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    dr = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
    flip = (dr * nrm).sum(-1) < 0
    dr = np.where(flip[:, None], -dr, dr).astype(np.float32)
    o = (pt + 1e-3 * nrm).astype(np.float32)

    for tile in (128, 256, 512, 1024):
        starts = treelet_tiles(meta, F, tile)
        nt = len(starts) - 1
        tlo = np.full((nt, 3), np.inf)
        thi = np.full((nt, 3), -np.inf)
        for t in range(nt):
            s, e = starts[t], starts[t + 1]
            if e > s:
                pts = np.concatenate([p0[s:e], p1[s:e], p2[s:e]])
                tlo[t] = pts.min(0)
                thi[t] = pts.max(0)
        fill = F / (nt * tile)

        inv = 1.0 / np.where(np.abs(dr) < 1e-20, 1e-20, dr)
        glo, ghi = tlo.min(0), thi.max(0)
        t_exit = np.minimum(
            np.maximum((glo[None] - o) * inv, (ghi[None] - o) * inv),
            1e30).min(-1)

        t0 = (tlo[None] - o[:, None]) * inv[:, None]     # (R, T, 3)
        t1 = (thi[None] - o[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(-1).clip(0.0)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tf >= tn) & (tn <= t_exit[:, None] * 1.0001 + 1e-4)
        tn = np.where(hit, tn, np.inf)

        visits = np.zeros(n_rays, np.int32)
        slab_hits = hit.sum(1)
        ordt = np.argsort(tn, axis=1)
        for r in range(n_rays):
            best = np.inf
            cnt = 0
            for t_idx in ordt[r]:
                if tn[r, t_idx] >= min(best, t_exit[r] * 1.0001 + 1e-4):
                    break
                s, e = starts[t_idx], starts[t_idx + 1]
                cnt += 1
                # MT against the tile's tris
                e1 = p1[s:e] - p0[s:e]
                e2 = p2[s:e] - p0[s:e]
                pv = np.cross(dr[r], e2)
                det = (e1 * pv).sum(-1)
                okd = np.abs(det) > 1e-12
                invd = np.where(okd, 1.0 / np.where(det == 0, 1, det), 0)
                tv = o[r] - p0[s:e]
                u = (tv * pv).sum(-1) * invd
                qv = np.cross(tv, e1)
                vv = (dr[r] * qv).sum(-1) * invd
                tt = (e2 * qv).sum(-1) * invd
                ok = okd & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > 0)
                if ok.any():
                    best = min(best, tt[ok].min())
            visits[r] = cnt
        print(f"TILE={tile:5d} tiles={nt:6d} fill={fill:.2f} "
              f"slab-hits/ray mean={slab_hits.mean():6.1f} "
              f"visits/ray mean={visits.mean():5.2f} "
              f"p50={np.percentile(visits, 50):4.0f} "
              f"p90={np.percentile(visits, 90):4.0f} "
              f"p99={np.percentile(visits, 99):4.0f} "
              f"max={visits.max():4d}", flush=True)


if __name__ == "__main__":
    main()
