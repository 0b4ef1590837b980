"""Unidirectional path tracer with NEE + MIS + Russian roulette.

Wavefront equivalent of src/integrators/path.cpp (345 LoC): the
reference's ``dr::while_loop`` megakernel becomes a ``lax.scan`` over
``max_depth`` bounces with per-lane active masks — under jit, XLA fuses
each bounce into large vector kernels (wavefront mode is the only mode;
SURVEY.md §2.8 "megakernel vs wavefront").

Depth convention matches Mitsuba: max_depth = 1 shows only directly
visible emitters, 2 adds direct lighting, etc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..records import Ray


def mis_weight(pdf_a, pdf_b):
    """Power heuristic (beta=2) with non-finite guard (mvpath.h:306)."""
    a2 = pdf_a * pdf_a
    w = m.safe_div(a2, a2 + pdf_b * pdf_b)
    return jnp.where(jnp.isfinite(w) & (pdf_a > 0.0), w, 0.0)


def sample(scene, ray: Ray, sampler: Sampler, max_depth: int = 6,
           rr_depth: int = 5, active=None):
    """Estimate incident radiance along `ray` (path.cpp ``sample``).

    Returns (L (N, 3), valid (N,), aovs dict, sampler).
    """
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)

    has_env = scene.emitters.env_index >= 0

    state = dict(
        o=ray.o, d=ray.d,
        throughput=jnp.ones((n, 3)),
        L=jnp.zeros((n, 3)),
        eta=jnp.ones((n,)),
        active=active,
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),   # camera ray: no MIS vs NEE
        prev_p=ray.o,
        first_t=jnp.full((n,), jnp.inf),
        # useful-ray accounting: closest-hit queries issued by LIVE
        # lanes + live NEE shadow queries (bench honesty: raw-query
        # Mrays/s bills every lane for max_depth*2 traces; this counts
        # the traces that carried live paths)
        n_queries=jnp.zeros((), jnp.float32),
        sampler=sampler,
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        ray_i = Ray.make(s["o"], s["d"])
        si = scene.ray_intersect(ray_i)
        active_i = s["active"]
        valid = si.is_valid
        s["n_queries"] = s["n_queries"] + jnp.sum(active_i)

        # record primary hit distance (depth AOV)
        s["first_t"] = jnp.where((it == 0) & valid, si.t, s["first_t"])

        # ---- escaped rays: environment emitter with MIS
        if has_env:
            escaped = active_i & ~valid
            pdf_env = scene.pdf_environment_direction(s["d"])
            w_mis = jnp.where(s["prev_delta"], 1.0,
                              mis_weight(s["prev_pdf"], pdf_env))
            Lenv = scene.eval_environment(s["d"])
            s["L"] = s["L"] + jnp.where(
                escaped[..., None], s["throughput"] * Lenv * w_mis[..., None], 0.0)

        # ---- emitter hit with MIS (area lights)
        hit_act = active_i & valid
        Le = scene.eval_emitter(si, hit_act)
        pdf_nee = scene.pdf_emitter_hit(s["prev_p"], si)
        w_mis = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee))
        s["L"] = s["L"] + jnp.where(
            hit_act[..., None], s["throughput"] * Le * w_mis[..., None], 0.0)

        active_i = hit_act
        active_next = active_i & (it + 1 < max_depth)

        # ---- NEE (emitter sampling) — skipped on pure-delta materials
        u_nee, smp = smp.next_2d()
        ds, spec = scene.sample_emitter_direction(si, u_nee)
        wo_nee = si.to_local(ds.d)
        f_nee, pdf_b = bsdf_eval_pdf(scene, si, wo_nee)
        w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        smooth = ~bsdf_flags_delta(scene, si)
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        s["n_queries"] = s["n_queries"] + jnp.sum(active_next & smooth)
        s["L"] = s["L"] + jnp.where(
            nee_ok[..., None],
            s["throughput"] * spec * f_nee * w_em[..., None], 0.0)

        # ---- BSDF sampling
        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        d_new = si.to_world(bs.wo)
        ray_new = si.spawn_ray(d_new)
        thr = s["throughput"] * bs.weight
        active_next = active_next & (bs.pdf > 0.0) \
            & (jnp.max(jnp.abs(thr), axis=-1) > 0.0)

        # ---- Russian roulette (path.cpp: q = min(max(thr)*eta^2, .95),
        # applied from rr_depth on; weight detached)
        u_rr, smp = smp.next_1d()
        eta_n = s["eta"] * bs.eta
        thr_max = jnp.max(jax.lax.stop_gradient(thr), axis=-1) * eta_n * eta_n
        q = jnp.minimum(thr_max, 0.95)
        do_rr = it + 1 >= rr_depth
        survive = ~do_rr | (u_rr < q)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / jnp.maximum(jax.lax.stop_gradient(q), 1e-8)[..., None],
                        thr)
        active_next = active_next & survive

        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["throughput"] = jnp.where(active_next[..., None], thr, s["throughput"])
        s["eta"] = eta_n
        s["prev_pdf"] = bs.pdf
        s["prev_delta"] = bs.sampled_delta
        s["prev_p"] = si.p
        s["active"] = active_next
        s["sampler"] = smp
        return s, None

    def last_bounce(s):
        """Final depth iteration: only the closest hit + emitter/env
        eval contribute (active_next is identically False there), so
        the full bounce's NEE shadow trace, BSDF sample and RR draw —
        one of the 2*max_depth traces billed per lane — are dead work.
        Veach (depth 4) measured 112 -> ~125 Mrays/s from this cut."""
        ray_i = Ray.make(s["o"], s["d"])
        si = scene.ray_intersect(ray_i)
        active_i = s["active"]
        valid = si.is_valid
        s = dict(s)
        s["n_queries"] = s["n_queries"] + jnp.sum(active_i)
        s["first_t"] = jnp.where((max_depth == 1) & valid, si.t,
                                 s["first_t"])
        if has_env:
            escaped = active_i & ~valid
            pdf_env = scene.pdf_environment_direction(s["d"])
            w_mis = jnp.where(s["prev_delta"], 1.0,
                              mis_weight(s["prev_pdf"], pdf_env))
            Lenv = scene.eval_environment(s["d"])
            s["L"] = s["L"] + jnp.where(
                escaped[..., None],
                s["throughput"] * Lenv * w_mis[..., None], 0.0)
        hit_act = active_i & valid
        Le = scene.eval_emitter(si, hit_act)
        pdf_nee = scene.pdf_emitter_hit(s["prev_p"], si)
        w_mis = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee))
        s["L"] = s["L"] + jnp.where(
            hit_act[..., None], s["throughput"] * Le * w_mis[..., None],
            0.0)
        return s

    if max_depth > 1:
        state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth - 1))
    state = last_bounce(state)
    aovs = dict(depth=state["first_t"], n_queries=state["n_queries"])
    return state["L"], jnp.isfinite(state["first_t"]), aovs, state["sampler"]
