"""Benchmark harness (driver-run on real TPU at end of round).

Prints one JSON line per metric; the final line is the round-over-round
headline (Cornell primal Mrays/s, tracked since round 1).

Metrics — one per BASELINE.json config:
* ``bigscene_1m_mrays_per_s`` — primal throughput on a ~1M-triangle
  scene (binned tracer; config-5 single-chip scale proxy).
* ``cornell_fwdbwd_64spp_mrays_per_s`` — PRB fwd+bwd at 64 spp, the
  BASELINE headline ("Mrays/s/chip fwd+bwd", config 4).  Ray count is
  the primal query count (W*H*spp*depth*2); time is a full
  value_and_grad step.
* ``veach_512_128spp_mrays_per_s`` — MIS/NEE-heavy Veach scene
  (config 2): area emitters + rough conductors at 512^2 @ 128 spp.
* ``amvpt_8view_quilt_mrays_per_s`` — 8-view AMVPT quilt with sample
  reuse in the reference configuration (exact tv_pdf MIS, adaptive
  refill on; config 3).  Ray count bills the base wavefront
  (views*W*H*spp*depth*2) — reuse amplifies effective samples at
  constant query count, so this is a throughput (not quality) metric.
* ``texture_recovery_step_ms`` — one Adam step of albedo-texture
  recovery (config 4's optimization loop), value_and_grad end-to-end.
* ``cornell_256_64spp_d6_mrays_per_s`` — primal Cornell headline
  (config 1).

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against a 100 Mrays/s nominal single-device target (and a
100 ms nominal recovery step) so the driver can track round-over-round
progress on identical hardware.
"""

from __future__ import annotations

import json
import time

NOMINAL_MRAYS = 100.0
NOMINAL_STEP_MS = 100.0


def emit(metric, mrays):
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NOMINAL_MRAYS, 4),
    }), flush=True)


def emit_ms(metric, ms):
    print(json.dumps({
        "metric": metric,
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(NOMINAL_STEP_MS / max(ms, 1e-9), 4),
    }), flush=True)


def useful_fraction(jax, jnp, scene, W, H, spp, depth):
    """Measured live-query fraction of the billed W*H*spp*depth*2
    denominator (path.sample counts live closest-hit + NEE queries)."""
    from mitsuba3_amvpt_tpu.core.rng import Sampler
    from mitsuba3_amvpt_tpu.render.integrators import api as rapi
    from mitsuba3_amvpt_tpu.render.integrators import path as rpath

    @jax.jit
    def frac(scene):
        n = W * H * spp
        sampler = Sampler.seed(jnp.uint32(0), n)
        ray, wgt, pos, view, sampler = rapi.sample_rays(scene, sampler)
        _, _, aovs, _ = rpath.sample(scene, ray, sampler,
                                     max_depth=depth, rr_depth=5)
        return aovs["n_queries"] / (n * depth * 2)

    return float(frac(scene))


def bench_bigscene(mt, jax, jnp):
    from mitsuba3_amvpt_tpu.utils import scenes
    W = H = 256
    SPP = 4
    DEPTH = 4
    scene = mt.load_dict(scenes.sphere_field(1_000_000, res=W))
    img = mt.render(scene, spp=SPP, max_depth=DEPTH, seed=0)
    jax.block_until_ready(img)
    # guard against timing a black frame (the r1-r3 scene had its area
    # light facing away; a benchmark must render a real image)
    assert float(img.mean()) > 1e-3, "bigscene renders black"
    t0 = time.perf_counter()
    img = mt.render(scene, spp=SPP, max_depth=DEPTH, seed=1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    raw = W * H * SPP * DEPTH * 2 / dt / 1e6
    emit("bigscene_1m_mrays_per_s", raw)
    try:
        emit("bigscene_1m_useful_mrays_per_s",
             raw * useful_fraction(jax, jnp, scene, W, H, 1, DEPTH))
    except Exception as e:
        print(f"# bigscene useful failed: {type(e).__name__}: {e}")


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
    raw = W * H * SPP * DEPTH * 2 / dt / 1e6
    emit("cornell_fwdbwd_64spp_mrays_per_s", raw)
    try:
        emit("cornell_fwdbwd_useful_mrays_per_s",
             raw * useful_fraction(jax, jnp, scene, W, H, 16, DEPTH))
    except Exception as e:
        print(f"# fwdbwd useful failed: {type(e).__name__}: {e}")


def bench_veach(mt, jax, jnp):
    from mitsuba3_amvpt_tpu.utils import scenes
    W = H = 512
    SPP = 128
    DEPTH = 4
    scene = mt.load_dict(scenes.veach_mis(res=W))
    img = mt.render(scene, spp=SPP, max_depth=DEPTH, seed=0)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img = mt.render(scene, spp=SPP, max_depth=DEPTH, seed=1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    raw = W * H * SPP * DEPTH * 2 / dt / 1e6
    emit("veach_512_128spp_mrays_per_s", raw)
    try:
        emit("veach_useful_mrays_per_s",
             raw * useful_fraction(jax, jnp, scene, W, H, 8, DEPTH))
    except Exception as e:
        print(f"# veach useful failed: {type(e).__name__}: {e}")


def bench_volpath(mt, jax, jnp):
    """Media throughput on device (VERDICT r4 weak #6: 'media
    throughput has never been measured' — now it is).  Cornell box
    filled with a scattering homogeneous HG fog; volpath,
    128^2 x 32spp x depth 6.  Measured 89.5 Mrays/s on v5e.

    The heterogeneous delta-tracking variant FAULTS the TPU through
    the axon relay (UNAVAILABLE device error, reproducible in
    isolation; poisons the process's device handle) — see GAPS.md
    round-5 close-out — so the bench pins to the homogeneous path,
    which exercises the same medium.py fetch/phase code."""
    from mitsuba3_amvpt_tpu.utils import scenes
    W = H = 128
    SPP = 32
    DEPTH = 6
    d = scenes.cornell_box(res=W)
    d["sensor"]["medium"] = {
        "type": "homogeneous", "sigma_t": 0.15, "albedo": 0.7,
        "phase": {"type": "hg", "g": 0.4}}
    scene = mt.load_dict(d)
    img = mt.render(scene, spp=SPP, max_depth=DEPTH,
                    integrator="volpath", seed=0)
    jax.block_until_ready(img)
    assert float(img.mean()) > 1e-3, "volpath bench renders black"
    t0 = time.perf_counter()
    img = mt.render(scene, spp=SPP, max_depth=DEPTH,
                    integrator="volpath", seed=1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    emit("volpath_128_32spp_mrays_per_s",
         W * H * SPP * DEPTH * 2 / dt / 1e6)


def bench_amvpt(mt, jax, jnp):
    """8-view quilt, reference configuration: reuse on (S=8), exact
    tv_pdf (fast_mis=False, mvpath.h:126) and adaptive refill
    (n_adapt>0, mvpath.h:127)."""
    from mitsuba3_amvpt_tpu.render.integrators.mvpath import render_mvpath
    from mitsuba3_amvpt_tpu.utils import scenes
    VIEWS = 8
    RES = 256
    SPP = 16
    DEPTH = 6
    d = scenes.cornell_box(res=RES)
    d["sensor"] = {
        "type": "grid", "grid": [VIEWS, 1], "mode": "cone",
        "fov": 39.3077, "focus_distance": 3.9, "cone_deg": 25.0,
        "to_world": {"lookat": {"origin": [0, 0, 3.9],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": RES * VIEWS, "height": RES,
                 "rfilter": {"type": "box"}}}
    scene = mt.load_dict(d)

    def frame(seed):
        return render_mvpath(scene, spp=SPP, max_depth=DEPTH, seed=seed,
                             fast_mis=False, n_adapt=max(1, SPP // 4),
                             with_queries=True)

    jax.block_until_ready(frame(0)[0])
    t0 = time.perf_counter()
    img, nq = frame(1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    emit("amvpt_8view_quilt_mrays_per_s",
         VIEWS * RES * RES * SPP * DEPTH * 2 / dt / 1e6)
    emit("amvpt_8view_useful_mrays_per_s", float(nq) / dt / 1e6)


def bench_amvpt_equal_time(mt, jax, jnp):
    """Does AMVPT reuse beat N independent per-view renders at EQUAL
    WALL-CLOCK (the only framing under which the fork's 'ideally Ns x
    larger effective sample count at minimal runtime cost' claim,
    mvpath.h:70-73, means anything on this hardware)?  Renders the same
    8-view quilt (a) with reuse at SPP_R spp, (b) independently (plain
    path through the same grid sensor) at an spp budget matched to
    (a)'s measured wall-clock, and compares MSE against a converged
    independent reference.  mse_reuse / mse_indep < 1 == reuse wins."""
    from mitsuba3_amvpt_tpu.render.integrators.mvpath import render_mvpath
    from mitsuba3_amvpt_tpu.utils import scenes
    VIEWS, RES, SPP_R, DEPTH = 8, 128, 16, 6
    d = scenes.cornell_box(res=RES)
    d["sensor"] = {
        "type": "grid", "grid": [VIEWS, 1], "mode": "cone",
        "fov": 39.3077, "focus_distance": 3.9, "cone_deg": 25.0,
        "to_world": {"lookat": {"origin": [0, 0, 3.9],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": RES * VIEWS, "height": RES,
                 "rfilter": {"type": "box"}}}
    scene = mt.load_dict(d)

    def reuse(seed):
        return render_mvpath(scene, spp=SPP_R, max_depth=DEPTH,
                             seed=seed, fast_mis=False)

    def indep(seed, spp):
        return mt.render(scene, spp=spp, max_depth=DEPTH, seed=seed)

    jax.block_until_ready(reuse(0))
    t0 = time.perf_counter()
    img_r = reuse(1)
    jax.block_until_ready(img_r)
    t_reuse = time.perf_counter() - t0

    jax.block_until_ready(indep(0, SPP_R))
    t0 = time.perf_counter()
    jax.block_until_ready(indep(1, SPP_R))
    t_ind = time.perf_counter() - t0
    spp_eq = max(1, int(round(SPP_R * t_reuse / t_ind)))
    img_i = indep(2, spp_eq)

    import numpy as np
    ref = np.asarray(indep(7, 512))
    r = np.asarray(img_r)
    i = np.asarray(img_i)
    mse_r = float(np.mean((r - ref) ** 2))
    mse_i = float(np.mean((i - ref) ** 2))
    print(json.dumps({
        "metric": "amvpt_equal_time_mse_ratio",
        "value": round(mse_r / max(mse_i, 1e-12), 4),
        "unit": f"mse_reuse/mse_indep @ equal wall-clock "
                f"(reuse {SPP_R}spp {t_reuse*1e3:.0f}ms vs indep "
                f"{spp_eq}spp)",
        "vs_baseline": round(mse_i / max(mse_r, 1e-12), 4),
    }), flush=True)


def bench_amvpt_equal_time_bigscene(mt, jax, jnp):
    """Equal-wall-clock AMVPT A/B where SUFFIX COST DOMINATES (VERDICT
    r4 next #2d): the diffuse Cornell A/B is the reuse claim's worst
    case (cheap suffixes); config-5 geometry — a ~200k-triangle sphere
    field behind an 8-view grid sensor — is where 'Ns x effective
    samples at minimal runtime cost' (mvpath.h:70-73) should actually
    pay, because every reused suffix saves an expensive trace."""
    from mitsuba3_amvpt_tpu.render.integrators.mvpath import render_mvpath
    from mitsuba3_amvpt_tpu.utils import scenes
    VIEWS, RES, SPP_R, DEPTH = 8, 128, 4, 3
    d = scenes.sphere_field(200_000, res=RES)
    dist = 6 * 2.5 * 1.4           # sphere_field camera distance
    d["sensor"] = {
        "type": "grid", "grid": [VIEWS, 1], "mode": "cone",
        "fov": 60.0, "focus_distance": dist, "cone_deg": 10.0,
        "to_world": {"lookat": {"origin": [0, 0.0, -dist],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": RES * VIEWS, "height": RES,
                 "rfilter": {"type": "box"}}}
    scene = mt.load_dict(d)

    def reuse(seed):
        return render_mvpath(scene, spp=SPP_R, max_depth=DEPTH,
                             seed=seed, fast_mis=False)

    def indep(seed, spp):
        return mt.render(scene, spp=spp, max_depth=DEPTH, seed=seed)

    jax.block_until_ready(reuse(0))
    t0 = time.perf_counter()
    img_r = reuse(1)
    jax.block_until_ready(img_r)
    t_reuse = time.perf_counter() - t0

    jax.block_until_ready(indep(0, SPP_R))
    t0 = time.perf_counter()
    jax.block_until_ready(indep(1, SPP_R))
    t_ind = time.perf_counter() - t0
    spp_eq = max(1, int(round(SPP_R * t_reuse / t_ind)))
    img_i = indep(2, spp_eq)

    import numpy as np
    ref = np.asarray(indep(7, 64))
    r = np.asarray(img_r)
    i = np.asarray(img_i)
    mse_r = float(np.mean((r - ref) ** 2))
    mse_i = float(np.mean((i - ref) ** 2))
    print(json.dumps({
        "metric": "amvpt_equal_time_bigscene_mse_ratio",
        "value": round(mse_r / max(mse_i, 1e-12), 4),
        "unit": f"mse_reuse/mse_indep @ equal wall-clock, 200k-tri "
                f"field (reuse {SPP_R}spp {t_reuse*1e3:.0f}ms vs "
                f"indep {spp_eq}spp)",
        "vs_baseline": round(mse_i / max(mse_r, 1e-12), 4),
    }), flush=True)


def bench_bigscene_spectral_16view(mt, jax, jnp):
    """Single-chip BASELINE config-5 proxy: spectral 4-wavelength
    integrator x ~1M-triangle scene x 16-view grid sensor in one
    program (previously these three axes were never exercised
    together, VERDICT r3 #5)."""
    from mitsuba3_amvpt_tpu.render.integrators.spectral import \
        render_spectral
    from mitsuba3_amvpt_tpu.utils import scenes
    VIEWS, RES, SPP, DEPTH = 16, 128, 2, 3
    d = scenes.sphere_field(1_000_000, res=RES, max_depth=DEPTH)
    ext = 6 * 2.5
    d["sensor"] = {
        "type": "grid", "grid": [VIEWS, 1], "mode": "cone",
        "fov": 60.0, "focus_distance": ext * 1.4, "cone_deg": 20.0,
        "to_world": {"lookat": {"origin": [0, 0, -ext * 1.4],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": RES * VIEWS, "height": RES,
                 "rfilter": {"type": "box"}}}
    scene = mt.load_dict(d)

    def frame(seed):
        return render_spectral(scene, spp=SPP, max_depth=DEPTH, seed=seed)

    jax.block_until_ready(frame(0))
    t0 = time.perf_counter()
    jax.block_until_ready(frame(1))
    dt = time.perf_counter() - t0
    emit("bigscene_spectral_16view_mrays_per_s",
         VIEWS * RES * RES * SPP * DEPTH * 2 / dt / 1e6)


def bench_texrec(mt, jax, jnp):
    """One Adam step (value_and_grad) of albedo-texture recovery."""
    from mitsuba3_amvpt_tpu.ad.prb import prb_pass
    from mitsuba3_amvpt_tpu.ad import update_scene
    from mitsuba3_amvpt_tpu.render.film import film_develop
    RES = 128
    SPP = 16

    scene = mt.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"lookat": {"origin": [0, 2.0, 2.0],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": RES,
                            "height": RES,
                            "rfilter": {"type": "box"}}},
        "floor": {"type": "rectangle",
                  "to_world": {"ops": [{"rotate": {"axis": [1, 0, 0],
                                                   "angle": -90}},
                                       {"scale": [1.5, 1.5, 1.5]}]},
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "checkerboard",
                                           "color0": [0.7, 0.2, 0.1],
                                           "color1": [0.1, 0.3, 0.7],
                                           "res": 32}}},
        "light": {"type": "point", "position": [0, 3, 1],
                  "intensity": 25.0}})
    target = film_develop(prb_pass(scene, jnp.uint32(7), SPP, 2, 8))
    tex0 = scene.textures.texels

    @jax.jit
    def step(texels, seed):
        def loss(t):
            s = update_scene(scene, {"textures.texels": t})
            img = film_develop(prb_pass(s, seed, SPP, 2, 8))
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(texels)

    t_init = jnp.full_like(tex0, 0.4)
    jax.block_until_ready(step(t_init, jnp.uint32(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(step(t_init, jnp.uint32(1)))
    dt = time.perf_counter() - t0
    emit_ms("texture_recovery_step_ms", dt * 1e3)


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

    # volpath runs LAST: a TPU-side fault poisons the process's device
    # handle (observed once: UNAVAILABLE cascaded to every later metric)
    for name, fn in (("veach", bench_veach), ("amvpt", bench_amvpt),
                     ("amvpt_equal_time", bench_amvpt_equal_time),
                     ("amvpt_equal_time_bigscene",
                      bench_amvpt_equal_time_bigscene),
                     ("bigscene_spectral_16view",
                      bench_bigscene_spectral_16view),
                     ("texrec", bench_texrec)):
        try:
            fn(mt, jax, jnp)
        except Exception as e:
            print(f"# {name} bench failed: {type(e).__name__}: {e}")

    # volpath runs after every other fan-out metric (see note above)
    # but before the cornell headline, which stays the final line
    try:
        bench_volpath(mt, jax, jnp)
    except Exception as e:
        print(f"# volpath bench failed: {type(e).__name__}: {e}")

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
