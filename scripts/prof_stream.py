"""Profile the large-scene streamed tracer on realistic ray sets (TPU).

Builds sphere_field geometry directly (no scene load), derives
(a) camera-like primary rays, (b) diffuse-bounce secondary rays and
(c) shadow rays toward the top light, and times the streamed tracer
under different RAY_BLOCK / TILE / NG settings (monkeypatched).

Usage: python scripts/prof_stream.py [n_tris] [wf_log2] [cfgs...]
  cfg format: RB,TILE,NG e.g. 1024,512,8
"""

import os
import sys
import functools
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    wf_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    cfgs = []
    for a in sys.argv[3:]:
        rb, tile, ng = (int(x) for x in a.split(","))
        cfgs.append((rb, tile, ng))
    if not cfgs:
        cfgs = [(1024, 512, 8)]

    from mitsuba3_amvpt_tpu.utils.scenes import sphere_field
    from mitsuba3_amvpt_tpu.ops import stream_trace as st
    from mitsuba3_amvpt_tpu.accel.traverse import _ray_sort_keys
    from mitsuba3_amvpt_tpu.accel.build import build_bvh

    t0 = time.time()
    d = sphere_field(n_target)
    v = d["spheres"]["vertices"]
    f = d["spheres"]["faces"]
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, _, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    print(f"geom+bvh {time.time()-t0:.1f}s tris={len(f)}", flush=True)

    n = 1 << wf_log2
    ext = 7.5
    rng = np.random.default_rng(1)

    # primary: pinhole at z=-2.8*ext looking at origin, ~60 deg fov
    res = 512
    px = np.arange(n) % (res * res)
    x = (px % res + rng.random(n)) / res * 2 - 1
    y = (px // res + rng.random(n)) / res * 2 - 1
    dp = np.stack([x * 0.577, y * 0.577, np.ones(n)], -1).astype(np.float32)
    dp /= np.linalg.norm(dp, axis=-1, keepdims=True)
    op = np.broadcast_to(np.array([0, 0, -ext * 2.8], np.float32), (n, 3))

    # bounce: cosine-ish random dirs from sphere surface points
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
    ob = (pt + 1e-3 * nrm).astype(np.float32)

    # shadow: surface -> random point on top light plane
    lt = np.stack([rng.uniform(-ext, ext, n), np.full(n, ext * 1.2),
                   rng.uniform(-ext, ext, n)], -1).astype(np.float32)
    dsh = lt - pt
    dist = np.linalg.norm(dsh, axis=-1, keepdims=True)
    dsh = (dsh / dist).astype(np.float32)

    inf = jnp.full((n,), jnp.inf)

    tb_sort = None
    if os.environ.get("FTSORT"):
        tb_sort = st.tile_bounds16(jnp.asarray(p0), jnp.asarray(p1),
                                   jnp.asarray(p2))

    def sortrays(o, d, maxt):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        glo = jnp.asarray(lo.min(0))
        ghi = jnp.asarray(hi.max(0))
        keys = _ray_sort_keys(o, d, glo, ghi)
        if tb_sort is not None:
            from mitsuba3_amvpt_tpu.ops.stream_trace import first_tile_key
            inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                                    jnp.where(d < 0, -1e-20, 1e-20), d)
            t_exit = jnp.min(jnp.maximum((glo[None] - o) * inv_d,
                                         (ghi[None] - o) * inv_d), -1)
            maxt_c = jnp.minimum(maxt, jnp.maximum(t_exit, 0.0)
                                 * 1.0001 + 1e-4)
            ft = first_tile_key(o, d, maxt_c, tb_sort)
            maxt = jnp.where(ft < 0, 0.0, maxt)
            ftb = int(tb_sort.shape[1] + 1).bit_length()
            keys = ((ft + 1).astype(jnp.uint32) << (32 - ftb)) \
                | (keys >> ftb)
        perm = jnp.argsort(keys)
        return o[perm], d[perm], maxt[perm]

    sets = {
        "primary": sortrays(op, dp, inf),
        "bounce": sortrays(ob, dr, inf),
        "shadow": sortrays(ob, dsh, jnp.asarray(dist[:, 0] * 0.999)),
    }
    for k in sets:
        jax.block_until_ready(sets[k][0])

    if os.environ.get("BINNED"):
        from mitsuba3_amvpt_tpu.ops import binned_trace as bt
        soa, ta, sa, trows = bt.pack_binned(jnp.asarray(p0),
                                            jnp.asarray(p1),
                                            jnp.asarray(p2))
        jax.block_until_ready(soa)
        print(f"--- binned TILE={bt.TILE} SUPER={bt.SUPER} "
              f"tiles={ta.shape[1]} supers={sa.shape[1]}", flush=True)
        for name, (o, d, maxt) in sets.items():
            ah = name == "shadow"
            f2 = jax.jit(functools.partial(bt.ray_triangles_binned,
                                           any_hit=ah))
            t0 = time.time()
            t = f2(o, d, maxt, soa, ta, sa, trows)[0]
            jax.block_until_ready(t)
            tc = time.time() - t0
            ts = []
            for i in range(3):
                t0 = time.time()
                jax.block_until_ready(
                    f2(o + 1e-4 * (i + 1), d, maxt, soa, ta, sa, trows)[0])
                ts.append(time.time() - t0)
            dt = min(ts)
            hit = float(jnp.mean(jnp.isfinite(t)))
            print(f"  {name:8s} {n/dt/1e6:8.2f} Mrays/s "
                  f"({dt*1e3:7.1f} ms, compile {tc:.0f}s, hit {hit:.3f})",
                  flush=True)
        return

    for rb, tile, ng in cfgs:
        st.RAY_BLOCK, st.TILE, st.NG = rb, tile, ng
        soa = st.pack_tri_soa16(jnp.asarray(p0), jnp.asarray(p1),
                                jnp.asarray(p2))
        tb = st.tile_bounds16(jnp.asarray(p0), jnp.asarray(p1),
                              jnp.asarray(p2))
        jax.block_until_ready(soa)
        print(f"--- RB={rb} TILE={tile} NG={ng} "
              f"tiles={soa.shape[1]//tile}", flush=True)
        for name, (o, d, maxt) in sets.items():
            ah = name == "shadow"
            f2 = jax.jit(
                lambda o, d, m, soa, tb, ah=ah: st.ray_triangles_streamed(
                    o, d, m, soa, tb, any_hit=ah))
            t0 = time.time()
            t = f2(o, d, maxt, soa, tb)[0]
            jax.block_until_ready(t)
            tc = time.time() - t0
            ts = []
            for i in range(3):
                t0 = time.time()
                jax.block_until_ready(
                    f2(o + 1e-4 * (i + 1), d, maxt, soa, tb)[0])
                ts.append(time.time() - t0)
            dt = min(ts)
            hit = float(jnp.mean(jnp.isfinite(t) if not ah else (t == 0.0)))
            print(f"  {name:8s} {n/dt/1e6:8.2f} Mrays/s "
                  f"({dt*1e3:7.1f} ms, compile {tc:.0f}s, hit {hit:.3f})",
                  flush=True)


if __name__ == "__main__":
    main()
