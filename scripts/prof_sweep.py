"""Characterize the sweep kernel: cost vs run count, device trace."""

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


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt

    n_tiles = 7776
    F = n_tiles * bt.TILE
    rng = np.random.default_rng(0)
    # synthetic triangle soup, tile-major layout
    soa = jnp.asarray(rng.random((n_tiles, 16, bt.TILE), np.float32))

    n = 1 << 19   # 524288 slots, like round 1 at 131k lanes K=4
    rays = jnp.asarray(rng.random((8, n), np.float32))

    sweep = jax.jit(lambda r, k: bt._run_sweep(r, k, soa, False))

    for runlen in (1, 4, 16, 64, 128):
        # keys: blocks of `runlen` identical tiles, sorted
        nk = n // runlen
        base = np.sort(rng.integers(0, n_tiles, nk))
        keys = jnp.asarray(np.repeat(base, runlen).astype(np.int32))
        dt = timeit(f"sweep runlen={runlen:4d} ({n//runlen} runs)",
                    sweep, rays, keys)

    # all-sentinel (skip cost)
    keys = jnp.full((n,), bt.SENTINEL, jnp.int32)
    timeit("sweep all-sentinel", sweep, rays, keys)

    # device trace of the runlen=16 case
    base = np.sort(rng.integers(0, n_tiles, n // 16))
    keys = jnp.asarray(np.repeat(base, 16).astype(np.int32))
    tmpdir = "/tmp/sweep_prof"
    os.system(f"rm -rf {tmpdir}")
    with jax.profiler.trace(tmpdir):
        jax.block_until_ready(sweep(rays, keys))
    files = glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for fp in files:
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            agg[ev.get("name", "")] += ev.get("dur", 0) / 1e3
            cnt[ev.get("name", "")] += 1
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:80]}")


if __name__ == "__main__":
    main()
