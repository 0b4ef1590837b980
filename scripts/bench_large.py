"""Dev benchmark: large-scene tracer throughput on the real TPU.

Builds a ~N-triangle scene (grid of tessellated UV spheres in a box
with an area light) and measures (a) raw closest-hit query throughput
and (b) full path-render throughput.

Usage: python scripts/bench_large.py [n_tris_target] [wavefront_log2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    wf_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 18

    import jax
    import jax.numpy as jnp
    import mitsuba3_amvpt_tpu as mt

    t0 = time.time()
    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    d = sphere_field(n_target)
    print(f"scene: {len(d['spheres']['faces'])} triangles", flush=True)
    scene = mt.load_dict(d)
    print(f"load+BVH: {time.time()-t0:.1f}s  accel={scene.geom.accel_mode}",
          flush=True)

    # --- raw closest-hit query ---
    from mitsuba3_amvpt_tpu.accel.traverse import ray_intersect_prelim
    from mitsuba3_amvpt_tpu.render.records import Ray

    n = 1 << wf_log2
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ext = 15.0
    o = jax.random.uniform(k1, (n, 3), minval=-ext, maxval=ext)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray(o=o, d=d, maxt=jnp.full((n,), jnp.inf))

    @jax.jit
    def q(o, d):
        r = Ray(o=o, d=d, maxt=jnp.full((n,), jnp.inf))
        pi = ray_intersect_prelim(scene.geom, r)
        return pi.t, pi.prim_index

    t0 = time.time()
    t, pid = q(o, d)
    jax.block_until_ready(t)
    print(f"compile+first query: {time.time()-t0:.1f}s", flush=True)
    reps = 3
    t0 = time.time()
    for i in range(reps):
        t, pid = q(o + 0.001 * i, d)
    jax.block_until_ready(t)
    dt = (time.time() - t0) / reps
    print(f"closest-hit: {n/dt/1e6:.2f} Mrays/s  ({dt*1e3:.1f} ms, "
          f"{n} rays, hit frac {float((pid>=0).mean()):.3f})", flush=True)

    # --- full render ---
    W = H = 256
    spp = 4
    depth = 4
    t0 = time.time()
    img = mt.render(scene, spp=spp, max_depth=depth, seed=0)
    jax.block_until_ready(img)
    print(f"render compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    img = mt.render(scene, spp=spp, max_depth=depth, seed=1)
    jax.block_until_ready(img)
    dt = time.time() - t0
    rays = W * H * spp * depth * 2
    print(f"render: {rays/dt/1e6:.2f} Mrays/s ({dt:.2f}s) "
          f"mean={float(img.mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
