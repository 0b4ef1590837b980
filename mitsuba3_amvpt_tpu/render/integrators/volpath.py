"""Volumetric path tracer.

Wavefront equivalent of src/integrators/volpath.cpp (561 LoC) +
volpathmis.cpp (692): free-flight distance sampling with uniform
spectral channel selection (volpath.cpp:83), medium/surface event
split, phase-function NEE with MIS, and medium transitions at
transmissive boundaries.  The per-channel spectral MIS weighting (the
volpathmis accumulators) is carried analytically for homogeneous media
via the channel-averaged pdfs in medium.sample_interaction.

Current media model: homogeneous (analytic transmittance); shadow rays
attenuate by the shading point's own medium over the full segment —
medium-boundary crossing mid-shadow-ray is a later-round refinement
(heterogeneous + null-scattering ratio tracking, volpath.cpp:239-247).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..medium import (phase_eval, phase_sample, sample_interaction,
                      transmittance)
from ..records import Ray
from . import path as path_mod
from .api import register_integrator

mis_weight = path_mod.mis_weight


def sample(scene, ray: Ray, sampler: Sampler, max_depth: int = 6,
           rr_depth: int = 5, active=None):
    """Volumetric L estimate (volpath.cpp ``sample``, loop at :171)."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    if not scene.has_media:
        return path_mod.sample(scene, ray, sampler, max_depth, rr_depth,
                               active)
    media = scene.media
    has_env = scene.emitters.env_index >= 0

    state = dict(
        o=ray.o, d=ray.d,
        throughput=jnp.ones((n, 3)),
        L=jnp.zeros((n, 3)),
        eta=jnp.ones((n,)),
        active=active,
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray.o,
        medium=jnp.full((n,), scene.camera_medium, jnp.int32),
        first_t=jnp.full((n,), jnp.inf),
        sampler=sampler,
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        ray_i = Ray.make(s["o"], s["d"])
        si = scene.ray_intersect(ray_i)
        active_i = s["active"]
        valid = si.is_valid
        med = s["medium"]
        in_medium = med >= 0

        # ---- free-flight sampling inside media
        u_ch, smp = smp.next_1d()
        u_t, smp = smp.next_1d()
        seg_len = jnp.where(valid, si.t, jnp.full((n,), 1e8))
        t_med, is_med_event, w_flight, sigma_s = sample_interaction(
            media, med, u_ch, u_t, seg_len)
        med_event = active_i & in_medium & is_med_event
        surf_event = active_i & valid & (~in_medium | ~is_med_event)
        escaped = active_i & ~valid & ~med_event
        thr = s["throughput"] * jnp.where(in_medium[..., None], w_flight, 1.0)

        s["first_t"] = jnp.where((it == 0) & valid, si.t, s["first_t"])

        # ---- escaped -> environment
        if has_env:
            pdf_env = scene.pdf_environment_direction(s["d"])
            w_mis = jnp.where(s["prev_delta"], 1.0,
                              mis_weight(s["prev_pdf"], pdf_env))
            Lenv = scene.eval_environment(s["d"])
            s["L"] = s["L"] + jnp.where(escaped[..., None],
                                        thr * Lenv * w_mis[..., None], 0.0)

        # ---- surface emitter hit
        Le = scene.eval_emitter(si, surf_event)
        pdf_nee_hit = scene.pdf_emitter_hit(s["prev_p"], si)
        w_mis = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee_hit))
        s["L"] = s["L"] + jnp.where(surf_event[..., None],
                                    thr * Le * w_mis[..., None], 0.0)

        active_next = (med_event | surf_event) & (it + 1 < max_depth)

        # ---- NEE from the event point (medium or surface)
        p_med = ray_i.at(t_med)
        si_evt = si.replace(
            p=jnp.where(med_event[..., None], p_med, si.p),
            n=jnp.where(med_event[..., None],
                        -s["d"], si.n))   # spawn offset dir for medium
        u_nee, smp = smp.next_2d()
        ds, spec = scene.sample_emitter_direction(si_evt, u_nee)
        # shadow transmittance through the local medium
        Tr_sh = transmittance(media, med, ds.dist)
        spec = spec * Tr_sh
        wo_nee = si.to_local(ds.d)
        f_surf, pdf_surf_b = bsdf_eval_pdf(scene, si, wo_nee)
        sid = jnp.maximum(med, 0)
        f_phase = phase_eval(media.phase_type[sid], media.g[sid],
                             s["d"], ds.d)
        f_nee = jnp.where(med_event[..., None], f_phase[..., None], f_surf)
        pdf_b = jnp.where(med_event, f_phase, pdf_surf_b)
        w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        smooth = ~bsdf_flags_delta(scene, si) | med_event
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        s["L"] = s["L"] + jnp.where(nee_ok[..., None],
                                    thr * spec * f_nee * w_em[..., None],
                                    0.0)

        # ---- continuation: phase sample (medium) or BSDF sample (surface)
        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        wo_phase, pdf_phase = phase_sample(media.phase_type[sid],
                                           media.g[sid], s["d"], u2)
        d_surf = si.to_world(bs.wo)
        d_new = jnp.where(med_event[..., None], wo_phase, d_surf)
        o_new = jnp.where(med_event[..., None],
                          p_med + d_new * 1e-5,
                          si.spawn_ray(d_surf).o)
        w_cont = jnp.where(med_event[..., None],
                           jnp.ones((n, 3)),     # phase: f/pdf == 1
                           bs.weight)
        pdf_cont = jnp.where(med_event, pdf_phase, bs.pdf)
        delta_cont = jnp.where(med_event, False, bs.sampled_delta)

        # ---- medium transition at transmissive surfaces
        crossed = surf_event & (bs.sampled_transmission
                                | (m.dot(d_surf, si.n) * m.cos_theta(si.wi) < 0))
        sh = jnp.maximum(si.shape_index, 0)
        entering = m.dot(d_surf, si.n) < 0.0
        new_med = jnp.where(entering, scene.shape_interior[sh],
                            scene.shape_exterior[sh])
        med_next = jnp.where(crossed, new_med, med)

        thr = thr * w_cont
        active_next = active_next & (pdf_cont > 0.0) \
            & (jnp.max(jnp.abs(thr), axis=-1) > 0.0)

        # ---- RR
        u_rr, smp = smp.next_1d()
        eta_n = s["eta"] * jnp.where(med_event, 1.0, bs.eta)
        thr_max = jnp.max(jax.lax.stop_gradient(thr), -1) * eta_n * eta_n
        q = jnp.minimum(thr_max, 0.95)
        do_rr = it + 1 >= rr_depth
        survive = ~do_rr | (u_rr < q)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / jnp.maximum(jax.lax.stop_gradient(q),
                                          1e-8)[..., None], thr)

        s["o"] = o_new
        s["d"] = d_new
        s["throughput"] = jnp.where(active_next[..., None], thr,
                                    s["throughput"])
        s["eta"] = eta_n
        s["prev_pdf"] = pdf_cont
        s["prev_delta"] = delta_cont
        s["prev_p"] = jnp.where(med_event[..., None], p_med, si.p)
        s["medium"] = med_next
        s["active"] = active_next & survive
        s["sampler"] = smp
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    aovs = dict(depth=state["first_t"])
    return state["L"], jnp.isfinite(state["first_t"]), aovs, state["sampler"]


register_integrator("volpath")(sample)
register_integrator("volpathmis")(sample)
