"""Device-op breakdown of one Veach-MIS render pass on the real TPU
(VERDICT r4: find where the 5x vs Cornell goes).  Aggregates the xprof
trace by op name; also times cornell at the same wavefront for the
reference ratio."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def aggregate(tmpdir, top=24):
    files = glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for fp in files:
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            agg[ev.get("name", "")] += ev.get("dur", 0) / 1e3
            cnt[ev.get("name", "")] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    for name, ms in rows[:top]:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:90]}", flush=True)
    return agg


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.utils import scenes

    which = sys.argv[1] if len(sys.argv) > 1 else "veach"
    W = H = 512
    SPP = 16
    DEPTH = 4
    if which == "veach":
        scene = mt.load_dict(scenes.veach_mis(res=W))
    else:
        d = scenes.cornell_box(res=W)
        scene = mt.load_dict(d)

    def frame(seed):
        return mt.render(scene, spp=SPP, max_depth=DEPTH, seed=seed)

    jax.block_until_ready(frame(0))
    t0 = time.perf_counter()
    jax.block_until_ready(frame(1))
    dt = time.perf_counter() - t0
    print(f"{which}: {dt*1e3:.1f} ms  "
          f"{W*H*SPP*DEPTH*2/dt/1e6:.1f} Mrays/s billed", flush=True)

    tmpdir = f"/tmp/veach_prof_{which}"
    os.system(f"rm -rf {tmpdir}")
    with jax.profiler.trace(tmpdir):
        jax.block_until_ready(frame(2))
    aggregate(tmpdir)


if __name__ == "__main__":
    main()
