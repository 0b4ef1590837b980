"""Stage-cut timing of the AMVPT batched estimator on the real TPU:
time jits that run _sample_multi_batched's pipeline up to successive
cut points (cumulative), so the per-stage cost is the difference.
Uses the bench configuration (8 views, 256^2, exact tv_pdf)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.core import math as m
    from mitsuba3_amvpt_tpu.core.rng import Sampler
    from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                 bsdf_flags_delta,
                                                 bsdf_pdf_matrix,
                                                 bsdf_sample,
                                                 eval_roughness)
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
    sensor = scene.sensor
    W, H = sensor.film_resolution
    n = W * H * SPP
    S = 8

    def upto(stage):
        def fn(scene, seed):
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
            if stage == 0:
                return ray.o.sum()
            si = scene.ray_intersect(ray)
            p_hit = si.is_valid
            if stage == 1:
                return si.p.sum()
            u_nee, sampler = sampler.next_2d()
            ds, em_weight = scene.sample_emitter_direction(si, u_nee)
            rand_1, sampler = sampler.next_1d()
            rand_2, sampler = sampler.next_2d()
            bs0 = bsdf_sample(scene, si, rand_1, rand_2)
            alpha = eval_roughness(scene, si)
            if stage == 2:
                return bs0.wo.sum() + ds.pdf.sum() + alpha.sum()
            group_base = (p_view // S) * S
            p_local = p_view % S
            cams = (group_base[None, :]
                    + (p_local[None, :] + jnp.arange(S)[:, None]) % S)
            p_rep = jnp.tile(si.p, (S, 1))
            n_rep = jnp.tile(si.sh_n, (S, 1))
            ul_rep = jnp.tile(u_lens, (S, 1))
            surf = sensor.sample_surface(cams.reshape(-1), p_rep, n_rep,
                                         ul_rep)
            if stage == 3:
                return surf["Jp"].sum() + surf["uv"].sum()
            s_p = surf["p"].reshape(S, n, 3)
            wi_k = m.frame_to_local(si.sh_n[None], si.sh_s[None],
                                    si.sh_t[None],
                                    surf["d"].reshape(S, n, 3))
            wi_k = wi_k.at[0].set(si.wi)
            wo_r = m.reflect(wi_k.reshape(-1, 3)).reshape(S, n, 3)
            si_all = mv._tile_si(si, S)
            si_all = si_all.replace(wi=wi_k.reshape(-1, 3))
            if stage == 4:
                return wo_r.sum()
            wos = jnp.broadcast_to(wo_r[:, None], (S, S, n, 3))
            P = bsdf_pdf_matrix(scene, si_all,
                                wos.reshape(S, S * n, 3)).reshape(S, S, n)
            if stage == 5:
                return P.sum()
            si_rep = mv._tile_si(si, S - 1)
            cam_rays = si_rep.spawn_ray_to(s_p[1:].reshape(-1, 3))
            occluded = scene.ray_test(cam_rays).reshape(S - 1, n)
            if stage == 6:
                return occluded.sum()
            f_nee, pdf_nee = bsdf_eval_pdf(scene, si_all,
                                           jnp.tile(si.to_local(ds.d),
                                                    (S, 1)))
            bs_all = bsdf_sample(scene, si_all, jnp.tile(rand_1, S),
                                 jnp.tile(rand_2, (S, 1)))
            if stage == 7:
                return f_nee.sum() + bs_all.wo.sum()
            f_ind, pdf_ind = bsdf_eval_pdf(scene, si_all,
                                           jnp.tile(bs0.wo, (S, 1)))
            if stage == 8:
                return f_ind.sum() + pdf_ind.sum()
            # ---- the rest of the real estimator, via the actual
            # entry point with feature subsets toggled
            return jnp.float32(0)
        return jax.jit(fn)

    # full-pass variants through the REAL mvpath_pass
    from mitsuba3_amvpt_tpu.render.film import film_prepare

    def pass_fn(**kw):
        def fn(scene, seed):
            acc = film_prepare(scene.film)
            out = mv.mvpath_pass(scene, acc, seed, SPP, 6, 5, 0, True,
                                 **kw)
            return out[0].sum() + out[1]
        return fn

    for name, kw in (
            ("full pass d6 exact+refill4",
             dict(sa_mis=True, n_adapt=4, fast_mis=False)),
            ("full pass d6 exact no-refill",
             dict(sa_mis=True, n_adapt=0, fast_mis=False)),
            ("full pass d1 exact no-refill (no suffix)",
             dict(sa_mis=True, n_adapt=0, fast_mis=False, max_depth=1)),
            ("full pass d6 no-mis no-refill",
             dict(sa_mis=False, n_adapt=0, fast_mis=False)),
    ):
        kw2 = dict(kw)
        md = kw2.pop("max_depth", 6)

        def fn(scene, seed, kw2=kw2, md=md):
            acc = film_prepare(scene.film)
            out = mv.mvpath_pass(scene, acc, seed, SPP, md, 5, 0, True,
                                 kw2["sa_mis"], kw2["n_adapt"],
                                 fast_mis=kw2["fast_mis"])
            return out[0].sum() + out[1]
        f = jax.jit(fn)
        out = f(scene, jnp.uint32(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(scene, jnp.uint32(1))
        jax.block_until_ready(out)
        print(f"{name:42s} {(time.perf_counter()-t0)/3*1e3:8.2f} ms",
              flush=True)

    prev = 0.0
    for stage in range(9):
        f = upto(stage)
        out = f(scene, jnp.uint32(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(scene, jnp.uint32(1))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 * 1e3
        names = ["rays", "+primary isect", "+nee/bsdf0/alpha",
                 "+sample_surface(Sxn)", "+wi_k/tile_si", "+P matrix SxSxn",
                 "+shadow trace (S-1)n", "+f_nee+bs_all (Sxn)",
                 "+f_ind (Sxn)"]
        print(f"stage {stage} {names[stage]:24s} cum {dt:8.2f} ms  "
              f"delta {dt - prev:8.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
