"""Dev validation + micro-bench for ops/stream_trace.py on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def random_tris(n, extent=30.0, size=0.3, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.random((n, 3)).astype(np.float32) * extent
    p0 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    p1 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    p2 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    return p0, p1, p2


def main():
    n_tri = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_ray = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    from mitsuba3_amvpt_tpu.ops.stream_trace import (
        ray_triangles_streamed, pack_tri_soa16, tile_bounds16)
    from mitsuba3_amvpt_tpu.accel.build import build_bvh
    from mitsuba3_amvpt_tpu.accel.traverse import (
        intersect_brute, _ray_sort_keys)
    from mitsuba3_amvpt_tpu.ops.isect import pack_tri_soa

    p0, p1, p2 = random_tris(n_tri)
    # spatially coherent order via BVH leaf order
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    t0 = time.time()
    _, _, order = build_bvh(lo, hi)
    print(f"bvh order: {time.time()-t0:.2f}s", flush=True)
    p0, p1, p2 = p0[order], p1[order], p2[order]

    soa16 = pack_tri_soa16(p0, p1, p2)
    tb = jnp.asarray(tile_bounds16(p0, p1, p2))
    print(f"tiles: {tb.shape[1]}", flush=True)

    rng = np.random.default_rng(1)
    o = rng.random((n_ray, 3)).astype(np.float32) * 30.0
    d = rng.normal(size=(n_ray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    maxt = jnp.full((n_ray,), jnp.inf)

    # sort rays for coherence (as the production path does)
    keys = _ray_sort_keys(o, d, jnp.zeros(3), jnp.full(3, 30.0))
    perm = jnp.argsort(keys)
    o_s, d_s = o[perm], d[perm]

    def timeit(name, fn, reps=3):
        _ = float(fn(0)[0].sum())        # compile + warm
        t0 = time.time()
        for i in range(reps):
            _ = float(fn(i + 1)[0].sum())   # forced readback sync
        dt = (time.time() - t0) / reps
        print(f"{name}: {n_ray/dt/1e6:8.2f} Mrays/s ({dt*1e3:.2f} ms)",
              flush=True)

    t0 = time.time()
    t, u, v, cid = ray_triangles_streamed(o_s, d_s, maxt, soa16, tb)
    jax.block_until_ready(t)
    print(f"stream compile+run: {time.time()-t0:.1f}s "
          f"hit {float(jnp.isfinite(t).mean()):.3f}", flush=True)
    timeit("stream closest", lambda i: ray_triangles_streamed(
        o_s + 1e-4 * i, d_s, maxt, soa16, tb))

    # any-hit
    timeit("stream anyhit ", lambda i: ray_triangles_streamed(
        o_s + 1e-4 * i, d_s, maxt, soa16, tb, any_hit=True))
    ta, _, _, cida = ray_triangles_streamed(o_s, d_s, maxt, soa16, tb,
                                            any_hit=True)

    if os.environ.get("OLD_HBM"):
        from mitsuba3_amvpt_tpu.ops.isect import (pack_tiles,
                                                  ray_triangles_tiled_hbm)
        soa_old, tb_old = pack_tiles(jnp.asarray(p0), jnp.asarray(p1),
                                     jnp.asarray(p2))
        timeit("old hbm       ", lambda i: ray_triangles_tiled_hbm(
            o_s + 1e-4 * i, d_s, maxt, soa_old, tb_old))

    # reference: VMEM pallas brute sweep (only valid up to its cap)
    if n_tri * 36 <= (6 << 20):
        soa = pack_tri_soa(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
        from mitsuba3_amvpt_tpu.ops.isect import ray_triangles_pallas
        t_ref, u_ref, v_ref, id_ref = ray_triangles_pallas(
            o_s, d_s, maxt, soa)
        jax.block_until_ready(t_ref)

        tn = np.asarray(t)
        tr = np.asarray(t_ref)
        both = np.isfinite(tn) & np.isfinite(tr)
        print("hit agree:", (np.isfinite(tn) == np.isfinite(tr)).mean(),
              " t max err:", np.abs(tn[both] - tr[both]).max() if both.any()
              else 0.0,
              " id agree:", (np.asarray(cid)[both]
                             == np.asarray(id_ref)[both]).mean(),
              flush=True)
        # any-hit consistency: occluded wherever closest hit exists
        occ = np.asarray(cida) >= 0
        print("anyhit==closesthit presence:",
              (occ == np.isfinite(tn)).mean(), flush=True)


if __name__ == "__main__":
    main()
