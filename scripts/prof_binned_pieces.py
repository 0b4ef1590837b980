"""Microbench each piece of one binned-tracer round on the real TPU:
select kernel, key sort, ray-row gather, sweep, scatter/merge."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
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
    _, meta_b, order = build_bvh(lo, hi)
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
    o = jnp.asarray(pt + 1e-3 * nrm)
    dd = jnp.asarray(dr)
    maxt = jnp.full((n,), jnp.inf)

    from mitsuba3_amvpt_tpu.accel.build import treelet_tiles
    starts = treelet_tiles(meta_b, p0.shape[0], bt.TILE)
    print(f"treelet tiles: {len(starts)-1} (dense would be "
          f"{-(-p0.shape[0] // bt.TILE)})", flush=True)
    soa, sup_ab, tile_c, ns, nt, pmap = bt.pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        tile_starts=starts)
    soa = jax.device_put(soa)
    sup_ab = jax.device_put(sup_ab)
    tile_c = jax.device_put(tile_c)
    print(f"tiles {nt}  supers {ns}  lanes {n}", flush=True)

    # build an initial state like the driver does
    inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20,
                          jnp.where(dd < 0, -1e-20, 1e-20), dd)
    npad = n
    chans = [o[:, 0], o[:, 1], o[:, 2], dd[:, 0], dd[:, 1], dd[:, 2],
             inv[:, 0], inv[:, 1], inv[:, 2],
             maxt, maxt,
             jnp.full((npad,), -1.0), jnp.full((npad,), -1.0),
             jnp.full((npad,), -1.0), jnp.full((npad,), -1.0),
             jnp.full((npad,), -1.0),
             jnp.zeros((npad,)), jnp.ones((npad,)),
             jnp.zeros((npad,)), jnp.zeros((npad,))]
    S = jnp.moveaxis(
        jnp.stack(chans, 0).reshape(bt.NCH, npad // 128, 128), 0, 1)
    S = jax.device_put(S)

    sel = jax.jit(lambda S: bt._select(S, sup_ab, tile_c, ns, nt))
    keys, _tn, S1 = timeit("select", sel, S)

    K = bt.K_EMIT
    kf = jnp.moveaxis(keys, 1, 0).reshape(K * npad)
    slot = jnp.arange(K * npad, dtype=jnp.int32)

    def dosort(kf):
        return jax.lax.sort([kf, slot], num_keys=1)
    skey, sslot = timeit("sort", jax.jit(dosort), kf)

    lane_of = sslot % npad
    ray_rows = jnp.moveaxis(S[:, jnp.array(bt._RAY_CH), :], 1, 2)
    ray_rows = ray_rows.reshape(npad, 8)

    def dogather(lane_of, ray_rows):
        return ray_rows[lane_of].T
    rows8 = timeit("gather rows8", jax.jit(dogather), lane_of, ray_rows)

    def dosweep(rows8, skey):
        return bt._run_sweep(rows8, skey, soa, False)
    t_s, id_s = timeit("sweep", jax.jit(dosweep), rows8, skey)

    def domerge(t_s, id_s, sslot):
        _, t_o, id_o = jax.lax.sort([sslot, t_s, id_s], num_keys=1)
        t_o = t_o.reshape(K, npad)
        kbest = jnp.argmin(t_o, axis=0)
        return (jnp.take_along_axis(t_o, kbest[None], 0)[0],
                jnp.take_along_axis(id_o.reshape(K, npad), kbest[None], 0))
    timeit("unsort+merge", jax.jit(domerge), t_s, id_s, sslot)

    # full trace end-to-end
    def full(o, dd, maxt):
        return bt.ray_triangles_binned(o, dd, maxt, soa, sup_ab, tile_c,
                                       ns, nt, prim_map=pmap)
    jfull = jax.jit(full)
    tt = timeit("FULL closest", jfull, o, dd, maxt, reps=3)
    print("hit frac", float(jnp.isfinite(tt[0]).mean()), flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        r = jfull(o, dd, maxt)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"closest-hit incoherent: {n/dt/1e6:.2f} Mrays/s", flush=True)

    def fullah(o, dd, maxt):
        return bt.ray_triangles_binned(o, dd, maxt, soa, sup_ab, tile_c,
                                       ns, nt, any_hit=True, prim_map=pmap)
    jah = jax.jit(fullah)
    timeit("FULL any-hit", jah, o, dd, maxt, reps=3)
    t0 = time.perf_counter()
    for i in range(3):
        r = jah(o, dd, maxt)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"any-hit incoherent:     {n/dt/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
