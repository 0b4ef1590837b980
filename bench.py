"""Benchmark harness (driver-run on real TPU at end of round).

Prints one JSON line per metric; the final line is the round-over-round
headline (Cornell primal Mrays/s, tracked since round 1).

Metrics (BASELINE.json):
* ``bigscene_1m_mrays_per_s`` — primal throughput on a ~1M-triangle
  scene (HBM-streaming tracer; config-5 single-chip scale proxy).
* ``cornell_fwdbwd_64spp_mrays_per_s`` — PRB fwd+bwd at 64 spp, the
  BASELINE headline ("Mrays/s/chip fwd+bwd").  Ray count is the primal
  query count (W*H*spp*depth*2); time is a full value_and_grad step.
* ``cornell_256_64spp_d6_mrays_per_s`` — primal Cornell headline.

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against a 100 Mrays/s nominal single-device target so the
driver can track round-over-round progress on identical hardware.
"""

from __future__ import annotations

import json
import time

NOMINAL_MRAYS = 100.0


def emit(metric, mrays):
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NOMINAL_MRAYS, 4),
    }), flush=True)


def bench_bigscene(mt, jax, jnp):
    from mitsuba3_amvpt_tpu.utils import scenes
    W = H = 256
    SPP = 4
    DEPTH = 4
    scene = mt.load_dict(scenes.sphere_field(1_000_000, res=W))
    img = mt.render(scene, spp=SPP, max_depth=DEPTH, seed=0)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img = mt.render(scene, spp=SPP, max_depth=DEPTH, seed=1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    emit("bigscene_1m_mrays_per_s", W * H * SPP * DEPTH * 2 / dt / 1e6)


def bench_fwdbwd(mt, jax, jnp, scene):
    from mitsuba3_amvpt_tpu.ad import render_ad, traverse, update_scene
    W = H = 256
    SPP = 64
    DEPTH = 6
    base = traverse(scene)["materials.albedo"]

    @jax.jit
    def loss_grad(theta, seed):
        sc = update_scene(scene, {"materials.albedo": base * theta})
        img = render_ad(sc, spp=SPP, max_depth=DEPTH, seed=seed)
        return jnp.mean(img)

    g = jax.jit(jax.grad(loss_grad))
    jax.block_until_ready(g(1.0, 0))
    t0 = time.perf_counter()
    jax.block_until_ready(g(1.0, 1))
    dt = time.perf_counter() - t0
    emit("cornell_fwdbwd_64spp_mrays_per_s",
         W * H * SPP * DEPTH * 2 / dt / 1e6)


def main():
    import jax
    # persistent compile cache: the large-scene render programs take
    # minutes to compile cold (Mosaic + XLA on the remote helper); the
    # cache is primed in-repo so driver runs skip straight to execution
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.render.film import film_prepare
    from mitsuba3_amvpt_tpu.render.integrators.api import render_passes
    from mitsuba3_amvpt_tpu.utils import scenes

    try:
        bench_bigscene(mt, jax, jnp)
    except Exception as e:  # keep the headline alive no matter what
        print(f"# bigscene bench failed: {type(e).__name__}: {e}")

    W = H = 256
    SPP = 64
    DEPTH = 6
    scene = mt.load_dict(scenes.cornell_box(res=W))

    try:
        bench_fwdbwd(mt, jax, jnp, scene)
    except Exception as e:
        print(f"# fwdbwd bench failed: {type(e).__name__}: {e}")

    spp_pass = 16
    n_passes = SPP // spp_pass

    def frame(seed):
        # all passes + develop fused into one XLA dispatch
        acc = film_prepare(scene.film)
        return render_passes(scene, acc, jnp.uint32(seed), n_passes,
                             spp_pass, "path", DEPTH, 5)

    # warmup / compile
    jax.block_until_ready(frame(0))

    t0 = time.perf_counter()
    img = frame(1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    raw = W * H * SPP * DEPTH * 2 / dt / 1e6
    emit("cornell_256_64spp_d6_mrays_per_s", raw)

    # useful-ray accounting (VERDICT round-2 #7): the raw metric bills
    # every lane for max_depth closest+shadow traces whether or not it
    # survived; scale by the measured live-query fraction (path.sample
    # counts live closest-hit + live NEE queries per bounce)
    try:
        from mitsuba3_amvpt_tpu.core.rng import Sampler
        from mitsuba3_amvpt_tpu.render.integrators import api as rapi
        from mitsuba3_amvpt_tpu.render.integrators import path as rpath

        @jax.jit
        def live_fraction(scene):
            n = W * H * spp_pass
            sampler = Sampler.seed(jnp.uint32(0), n)
            ray, wgt, pos, view, sampler = rapi.sample_rays(scene, sampler)
            _, _, aovs, _ = rpath.sample(scene, ray, sampler,
                                         max_depth=DEPTH, rr_depth=5)
            return aovs["n_queries"] / (n * DEPTH * 2)

        frac = float(live_fraction(scene))
        emit("cornell_useful_mrays_per_s", raw * frac)
    except Exception as e:
        print(f"# useful-ray metric failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
