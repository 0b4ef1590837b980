"""Device-op profile of one binned-tracer bounce call (jax.profiler)."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 260_000
    wf_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 17

    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt
    from mitsuba3_amvpt_tpu.accel.build import build_bvh

    d = sphere_field(n_target)
    v = d["spheres"]["vertices"]
    f = d["spheres"]["faces"]
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, _, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]

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
    ob = jnp.asarray(pt + 1e-3 * nrm)
    db = jnp.asarray(dr)
    maxt = jnp.full((n,), jnp.inf)

    soa, sup_ab, tile_c, ns, nt, pmap = bt.pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    f2 = lambda o, d, m: bt.ray_triangles_binned(o, d, m, soa, sup_ab,
                                                 tile_c, ns, nt, prim_map=pmap)
    t = f2(ob, db, maxt)[0]
    jax.block_until_ready(t)
    print("hit", float(jnp.isfinite(t).mean()), flush=True)

    tmpdir = "/tmp/bt_prof"
    os.system(f"rm -rf {tmpdir}")
    with jax.profiler.trace(tmpdir):
        t0 = time.time()
        jax.block_until_ready(f2(ob + 1e-4, db, maxt)[0])
        wall = time.time() - t0
    print(f"wall {wall*1e3:.1f} ms", flush=True)

    # aggregate device ops from the trace
    files = glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for fp in files:
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            pidname = ev.get("pid")
            dur = ev.get("dur", 0) / 1e3   # ms
            args = ev.get("args", {})
            # device ops live on TPU track; host python skipped by name
            if "run_id" in args or "program_id" in args or True:
                agg[name] += dur
                cnt[name] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:28]
    for name, ms in top:
        print(f"{ms:9.2f} ms  x{cnt[name]:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
