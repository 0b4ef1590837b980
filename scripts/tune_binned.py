"""Scan (K_EMIT, REFETCH_STRIDE) full-trace wall clock on the real TPU
for the incoherent 1M-tri wavefront.  Each config runs in a fresh
subprocess (the knobs are import-time module constants)."""

import os
import subprocess
import sys

INNER = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
from mitsuba3_amvpt_tpu.ops import binned_trace as bt
from mitsuba3_amvpt_tpu.accel.build import build_bvh, treelet_tiles

d = sphere_field(1_000_000)
v = d["spheres"]["vertices"]; f = d["spheres"]["faces"]
p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
lo = np.minimum(np.minimum(p0, p1), p2)
hi = np.maximum(np.maximum(p0, p1), p2)
_, meta, order = build_bvh(lo, hi)
p0, p1, p2 = p0[order], p1[order], p2[order]
n = 1 << 17
rng = np.random.default_rng(1)
ti = rng.integers(0, p0.shape[0], n)
b1 = rng.random(n).astype(np.float32); b2 = rng.random(n).astype(np.float32)
sw = b1 + b2 > 1; b1 = np.where(sw, 1-b1, b1); b2 = np.where(sw, 1-b2, b2)
pt = p0[ti] + (p1[ti]-p0[ti])*b1[:,None] + (p2[ti]-p0[ti])*b2[:,None]
nrm = np.cross(p1[ti]-p0[ti], p2[ti]-p0[ti])
nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
dr = rng.normal(size=(n,3)).astype(np.float32)
dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
flip = (dr*nrm).sum(-1) < 0
dr = np.where(flip[:,None], -dr, dr).astype(np.float32)
o = jnp.asarray(pt + 1e-3*nrm); dd = jnp.asarray(dr)
maxt = jnp.full((n,), jnp.inf)
starts = treelet_tiles(meta, p0.shape[0], bt.TILE)
soa, sup_ab, tile_c, ns, nt, pmap = bt.pack_binned(
    jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), tile_starts=starts)
tr = jax.jit(lambda o, d, m: bt.ray_triangles_binned(
    o, d, m, soa, sup_ab, tile_c, ns, nt, prim_map=pmap))
out = tr(o, dd, maxt); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    out = tr(o, dd, maxt)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 3
hits = float(jnp.mean(out[3] >= 0))
print(f"RESULT K={bt.K_EMIT} stride={bt._REFETCH_STRIDE} "
      f"full={dt*1e3:8.2f} ms  {n/dt/1e6:6.2f} Mrays/s  hitfrac={hits:.4f}",
      flush=True)
"""


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    configs = [(8, 1), (8, 4), (6, 1), (4, 1), (4, 2), (12, 1), (6, 2)]
    if len(sys.argv) > 1:
        configs = [tuple(map(int, c.split(","))) for c in sys.argv[1:]]
    for k, s in configs:
        env = dict(os.environ, MT_K_EMIT=str(k), MT_REFETCH=str(s))
        r = subprocess.run([sys.executable, "-c", INNER % {"root": root}],
                           env=env, capture_output=True, text=True,
                           timeout=900)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
        if r.returncode:
            print(f"K={k} stride={s} FAILED:",
                  r.stderr.strip().splitlines()[-1:], flush=True)


if __name__ == "__main__":
    main()
