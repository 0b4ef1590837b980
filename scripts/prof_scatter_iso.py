"""Why is an isolated 4.2M scatter-add ~0.1 ms when the identical
scatter inside the AMVPT pass costs 30 ms/channel?  Profile the
isolated scatter and dump its HLO."""

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


def aggregate(tmpdir, top=12):
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
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:100]}", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    n = 4194304
    HW = 524288
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, HW, jnp.int32)
    upd = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)

    @jax.jit
    def scat(idx, upd):
        acc = jnp.zeros((HW,), jnp.float32)
        return acc.at[idx].add(upd, mode="drop")

    c = scat.lower(idx, upd).compile()
    with open("/tmp/scat_iso.hlo", "w") as fh:
        fh.write(c.as_text())
    out = scat(idx, upd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = scat(idx, upd)
    jax.block_until_ready(out)
    print(f"isolated 1D scatter 4.2M: {(time.perf_counter()-t0)/5*1e3:.3f} ms",
          flush=True)
    tmpdir = "/tmp/scat_prof"
    os.system(f"rm -rf {tmpdir}")
    with jax.profiler.trace(tmpdir):
        jax.block_until_ready(scat(idx, upd))
    aggregate(tmpdir)


if __name__ == "__main__":
    main()


def honest():
    """Per-rep block + chained dependency timing."""
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    n = 4194304
    HW = 524288
    idx = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, HW, jnp.int32)
    upd = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)

    @jax.jit
    def scat(idx, upd, prev):
        acc = jnp.zeros((HW,), jnp.float32) + prev
        return acc.at[idx].add(upd, mode="drop")

    prev = jnp.zeros((HW,), jnp.float32)
    out = scat(idx, upd, prev)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = scat(idx, upd, out)      # chained: each dep on previous
    jax.block_until_ready(out)
    print(f"chained 1D scatter: {(time.perf_counter()-t0)/5*1e3:.3f} ms")

    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(scat(idx, upd, prev))   # block each rep
    print(f"blocked 1D scatter: {(time.perf_counter()-t0)/5*1e3:.3f} ms")


if len(sys.argv) > 1 and sys.argv[1] == "honest":
    honest()
    sys.exit(0)
