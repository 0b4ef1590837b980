"""Round-5 forensics for the AMVPT splat tail (VERDICT r4 #2a): the
full pass runs ~233 ms but a NOSPLAT variant runs ~68 ms, and no
isolated scatter repro shows the delta.  --xla_dump_to fails through
the axon relay, but lowered.compile().as_text() works — dump the
optimized/scheduled HLO of both variants, xprof-profile the full pass,
and cross-reference the hottest op names against the HLO text.
"""

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


def aggregate(tmpdir, top=30):
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
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    for name, ms in rows[:top]:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:100]}", flush=True)
    return agg


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.render.film import film_prepare
    from mitsuba3_amvpt_tpu.render.integrators import mvpath as mv
    from mitsuba3_amvpt_tpu.utils import scenes

    VIEWS, RES, SPP = 8, 256, 1
    d = scenes.cornell_box(res=RES)
    d["sensor"] = {
        "type": "grid", "grid": [VIEWS, 1], "mode": "cone",
        "fov": 39.3077, "focus_distance": 3.9, "cone_deg": 25.0,
        "to_world": {"lookat": {"origin": [0, 0, 3.9],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": RES * VIEWS, "height": RES,
                 "rfilter": {"type": "box"}}}
    scene = mt.load_dict(d)
    W, H = scene.sensor.film_resolution
    n = W * H * SPP

    # full pass (exact tv_pdf, no refill) vs NOSPLAT (sum the splat
    # inputs instead of film_put-ing them)
    def full(scene, seed):
        acc = film_prepare(scene.film)
        out = mv.mvpath_pass(scene, acc, seed, SPP, 6, 5, 0, True,
                             True, 0, fast_mis=False)
        return out[0].sum() + out[1]

    def nosplat(scene, seed):
        from mitsuba3_amvpt_tpu.core.rng import Sampler
        sensor = scene.sensor
        sampler = Sampler.seed(seed, n)
        idx = jnp.arange(n)
        pixel = idx
        px = (pixel % W).astype(jnp.float32)
        py = (pixel // W).astype(jnp.float32)
        u_pos, sampler = sampler.next_2d()
        pos = jnp.stack([px, py], -1) + u_pos
        pos_uv = pos / jnp.array([W, H], jnp.float32)
        p_view, uv = sensor.quilt_decode(pos_uv)
        u_lens, sampler = sampler.next_2d()
        ray, rweight = sensor.sample_ray(p_view, uv, u_lens)
        splats, group, sampler2, adapt_mask, nq = mv._sample_multi(
            scene, ray, pos, p_view, sampler, 8, 6, 5, True,
            u_lens, fast_mis=False)
        (spos, val, fw, sact) = splats[0]
        return spos.sum() + val.sum() + fw.sum() + sact.sum() + nq

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in (("full", full), ("nosplat", nosplat)):
        if which not in (name, "all"):
            continue
        f = jax.jit(fn)
        lowered = f.lower(scene, jnp.uint32(0))
        compiled = lowered.compile()
        txt = compiled.as_text()
        path = f"/tmp/mvpath_{name}.hlo"
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: HLO {len(txt)} bytes -> {path}", flush=True)
        out = f(scene, jnp.uint32(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(scene, jnp.uint32(1))
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)
        if name == "full":
            tmpdir = "/tmp/mvpath_prof"
            os.system(f"rm -rf {tmpdir}")
            with jax.profiler.trace(tmpdir):
                jax.block_until_ready(f(scene, jnp.uint32(2)))
            aggregate(tmpdir)


if __name__ == "__main__":
    main()
