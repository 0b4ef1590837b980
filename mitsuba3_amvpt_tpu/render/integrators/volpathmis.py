"""Volumetric path tracer with full spectral MIS (``volpathmis``).

TPU-native reimplementation of the reference's distinct estimator
(src/integrators/volpathmis.cpp, 692 LoC; Miller et al. 2019
null-scattering path integral framework).  Unlike ``volpath`` — which
carries a single throughput spectrum and channel-MIS flight weights —
this integrator carries two per-lane 3x3 "p over f" weight matrices:

* ``Mu`` (p_over_f): entry [i, j] = product over all path events of
  (pdf the event would have had if channel j drove the sampling) /
  (event contribution in channel i).  The balance heuristic over the 3
  channel-sampling techniques is w[i] = 3 / sum_j Mu[i, j]
  (volpathmis.cpp:623-637).
* ``Mn`` (p_over_f_nee): the same products but with free-flight /
  null-collision pdfs replaced by the NEE sampling strategy's pdfs
  (distances unsampled -> pdf 1); reset to ``Mu`` at every real
  scattering vertex (volpathmis.cpp:338,419).

Emitter hits weight with wm_mis2(Mu, Mn') (NEE vs unidirectional per
channel, volpathmis.cpp:375-381); NEE connections symmetrically build
both end matrices through the shadow march (sample_emitter,
volpathmis.cpp:437-556).  This matters for chromatic extinction: the
per-channel pdf ratios are exact, where volpath's scalar channel
average loses the spectral correlation.

Sampling structure (wavefront ``lax.scan`` + inner tracking
``while_loop``s) mirrors volpath.py; media with null boundaries and
heterogeneous grids are supported through the same SoA tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler, sample_tea_32
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..bsdfs.registry import D_NULL
from ..medium import (ff_spectral_mis, phase_eval, phase_sample,
                      shadow_spectral_mis, wm_identity, wm_mis, wm_mis2,
                      wm_update)
from ..records import Ray
from . import path as path_mod
from .api import register_integrator
from .volpath import NULL_BUDGET, SHADOW_SEGMENTS


def _nee_march(scene, si_evt, ds, med, key, channel, Mn, Mu):
    """Shadow march p -> ds.p through media + null boundaries, updating
    the two NEE end matrices (volpathmis.cpp sample_emitter loop).
    Opaque hits zero both matrices (eval_null_transmission == 0)."""
    ray = si_evt.spawn_ray_to(ds.p)
    o, d = ray.o, ray.d
    remaining = ray.maxt
    n = remaining.shape[0]
    cur = med
    active = (ds.pdf > 0.0) & (remaining > 0.0)
    n_seg = SHADOW_SEGMENTS if scene.has_null_boundaries else 1
    zero = jnp.zeros((n, 3, 3))

    for seg in range(n_seg):
        seg_key = sample_tea_32(key, jnp.uint32(seg + 7), rounds=4)[0]
        si2 = scene.ray_intersect(Ray.make(o, d, remaining))
        hit = si2.is_valid
        seg_len = jnp.where(hit, si2.t, remaining)
        Mn_m, Mu_m = shadow_spectral_mis(scene.media, scene.volumes, cur,
                                         o, d, seg_len, seg_key, channel)
        am = active[:, None, None]
        Mn = jnp.where(am, Mn * Mn_m, Mn)
        Mu = jnp.where(am, Mu * Mu_m, Mu)
        mat = jnp.maximum(si2.material_index, 0)
        is_null = hit & (scene.materials.mtype[mat] == D_NULL)
        blocked = active & hit & ~is_null
        Mn = jnp.where(blocked[:, None, None], zero, Mn)
        Mu = jnp.where(blocked[:, None, None], zero, Mu)
        if seg + 1 == n_seg:
            # budget exhausted mid-march: conservative occlusion
            ex = (active & hit & is_null)[:, None, None]
            Mn = jnp.where(ex, zero, Mn)
            Mu = jnp.where(ex, zero, Mu)
            break
        sh = jnp.maximum(si2.shape_index, 0)
        entering = m.dot(d, si2.n) < 0.0
        new_med = jnp.where(entering, scene.shape_interior[sh],
                            scene.shape_exterior[sh])
        cur = jnp.where(active & is_null, new_med, cur)
        o = jnp.where(hit[..., None], si2.spawn_ray(d).o, o)
        remaining = jnp.maximum(remaining - seg_len, 0.0)
        active = active & hit & is_null & (remaining > 1e-6)
    return Mn, Mu


def sample(scene, ray: Ray, sampler: Sampler, max_depth: int = 6,
           rr_depth: int = 5, active=None):
    """Spectral-MIS volumetric L estimate (volpathmis.cpp ``sample``)."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    if not scene.has_media:
        return path_mod.sample(scene, ray, sampler, max_depth, rr_depth,
                               active)
    media = scene.media
    has_env = scene.emitters.env_index >= 0
    n_iter = max_depth + (NULL_BUDGET if scene.has_null_boundaries else 0)

    # one channel-sampling technique per path (volpathmis.cpp:156-159)
    u_ch, sampler = sampler.next_1d()
    channel = jnp.clip((u_ch * 3).astype(jnp.int32), 0, 2)

    state = dict(
        o=ray.o, d=ray.d,
        Mu=wm_identity(n), Mn=wm_identity(n),
        L=jnp.zeros((n, 3)),
        eta=jnp.ones((n,)),
        active=active,
        depth=jnp.zeros((n,), jnp.int32),
        specular_chain=jnp.ones((n,), bool),
        prev_p=ray.o,
        medium=jnp.full((n,), scene.camera_medium, jnp.int32),
        first_t=jnp.full((n,), jnp.inf),
        sampler=sampler,
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        Mu, Mn = s["Mu"], s["Mn"]
        ray_i = Ray.make(s["o"], s["d"])
        si = scene.ray_intersect(ray_i)
        active_i = s["active"]
        med = s["medium"]
        valid = si.is_valid
        in_medium = med >= 0

        # ---- free flight with weight-matrix updates
        seg_len = jnp.where(valid, si.t, jnp.full((n,), 1e8))
        key, smp = smp.next_key()
        t_med, real_med, Mu_m, Mn_m = ff_spectral_mis(
            media, scene.volumes, med, s["o"], s["d"], seg_len, key,
            channel)
        am = (active_i & in_medium)[:, None, None]
        Mu = jnp.where(am, Mu * Mu_m, Mu)
        Mn = jnp.where(am, Mn * Mn_m, Mn)
        med_event = active_i & in_medium & real_med
        surf_event = active_i & valid & (~in_medium | ~real_med)
        escaped = active_i & ~valid & ~med_event
        # Mn resets to the post-scatter Mu at real medium vertices
        # *after* NEE (volpathmis.cpp:338); stash the pre-NEE value
        s["first_t"] = jnp.where((it == 0) & valid, si.t, s["first_t"])

        count_direct = s["specular_chain"] | (s["depth"] == 0)

        # ---- escaped -> environment (volpathmis.cpp:366-382 w/ env)
        if has_env:
            pdf_env = scene.pdf_environment_direction(s["d"])
            Mn_env = wm_update(Mn, pdf_env[..., None], jnp.ones((n, 3)),
                               escaped & ~count_direct)
            w_env = jnp.where(count_direct[..., None], wm_mis(Mu),
                              wm_mis2(Mu, Mn_env))
            Lenv = scene.eval_environment(s["d"])
            s["L"] = s["L"] + jnp.where(escaped[..., None],
                                        w_env * Lenv, 0.0)

        # ---- surface emitter hit
        Le = scene.eval_emitter(si, surf_event)
        pdf_hit = scene.pdf_emitter_hit(s["prev_p"], si)
        Mn_hit = wm_update(Mn, pdf_hit[..., None], jnp.ones((n, 3)),
                           surf_event & ~count_direct)
        w_hit = jnp.where(count_direct[..., None], wm_mis(Mu),
                          wm_mis2(Mu, Mn_hit))
        s["L"] = s["L"] + jnp.where(surf_event[..., None], w_hit * Le, 0.0)

        mat = jnp.maximum(si.material_index, 0)
        is_null_srf = surf_event & (scene.materials.mtype[mat] == D_NULL)
        depth_inc = jnp.where(is_null_srf | ~(med_event | surf_event), 0, 1)
        depth_n = s["depth"] + jnp.where(active_i, depth_inc, 0)
        active_next = (med_event | surf_event) & (depth_n < max_depth)

        # ---- NEE from the event vertex (medium or surface)
        p_med = ray_i.at(t_med)
        si_evt = si.replace(
            p=jnp.where(med_event[..., None], p_med, si.p),
            n=jnp.where(med_event[..., None], -s["d"], si.n))
        u_nee, smp = smp.next_2d()
        ds, spec = scene.sample_emitter_direction(si_evt, u_nee,
                                                  test_visibility=False)
        emitted = spec * ds.pdf[..., None]   # emitter_val (:444)
        Mn_end = wm_update(Mu, ds.pdf[..., None], jnp.ones((n, 3)),
                           jnp.ones((n,), bool))
        Mu_end = Mu
        nkey, smp = smp.next_key()
        Mn_end, Mu_end = _nee_march(scene, si_evt, ds, med, nkey, channel,
                                    Mn_end, Mu_end)
        wo_nee = si.to_local(ds.d)
        f_surf, pdf_surf_b = bsdf_eval_pdf(scene, si, wo_nee)
        sid = jnp.maximum(med, 0)
        f_phase = phase_eval(media, sid, s["d"], ds.d)
        f_nee = jnp.where(med_event[..., None], f_phase[..., None], f_surf)
        pdf_b = jnp.where(med_event, f_phase, pdf_surf_b)
        ok = jnp.ones((n,), bool)
        Mn_end = wm_update(Mn_end, jnp.ones((n, 3)), f_nee, ok)
        Mu_end = wm_update(Mu_end,
                           jnp.where(ds.delta, 0.0, pdf_b)[..., None],
                           f_nee, ok)
        smooth = (~bsdf_flags_delta(scene, si) & ~is_null_srf) | med_event
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        s["L"] = s["L"] + jnp.where(nee_ok[..., None],
                                    wm_mis2(Mn_end, Mu_end) * emitted, 0.0)

        # ---- continuation sampling
        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        wo_phase, pdf_phase = phase_sample(media, sid, s["d"], u2)
        d_surf = si.to_world(bs.wo)
        d_new = jnp.where(med_event[..., None], wo_phase, d_surf)
        o_new = jnp.where(med_event[..., None], p_med + d_new * 1e-5,
                          si.spawn_ray(d_surf).o)
        # phase: weight*pdf == pdf (weight 1); bsdf: f = weight * pdf
        f_cont = jnp.where(med_event[..., None],
                           pdf_phase[..., None],
                           bs.weight * bs.pdf[..., None])
        pdf_cont = jnp.where(med_event, pdf_phase, bs.pdf)
        delta_cont = jnp.where(med_event, False, bs.sampled_delta)

        # real vertex: reset Mn = Mu then update both (:338-352,417-421)
        real_vtx = (med_event | surf_event) & ~is_null_srf
        Mn = jnp.where(real_vtx[:, None, None], Mu, Mn)
        upd_act = active_next & (pdf_cont > 0.0)
        Mu = wm_update(Mu, pdf_cont[..., None], f_cont, upd_act)
        Mn = wm_update(Mn, jnp.ones((n, 3)), f_cont,
                       upd_act & real_vtx)

        # ---- medium transition
        crossed = surf_event & (bs.sampled_transmission
                                | (m.dot(d_surf, si.n)
                                   * m.cos_theta(si.wi) < 0))
        sh = jnp.maximum(si.shape_index, 0)
        entering = m.dot(d_surf, si.n) < 0.0
        new_med = jnp.where(entering, scene.shape_interior[sh],
                            scene.shape_exterior[sh])
        med_next = jnp.where(crossed, new_med, med)

        thr = wm_mis(Mu)
        active_next = upd_act & (jnp.max(jnp.abs(thr), -1) > 0.0)

        # ---- RR on the MIS throughput (volpathmis.cpp:240-246)
        u_rr, smp = smp.next_1d()
        eta_n = s["eta"] * jnp.where(med_event, 1.0, bs.eta)
        q = jnp.minimum(jnp.max(jax.lax.stop_gradient(thr), -1)
                        * eta_n * eta_n, 0.95)
        do_rr = (depth_n >= rr_depth) & ~is_null_srf
        survive = ~do_rr | (u_rr < q)
        Mu = wm_update(Mu,
                       jnp.broadcast_to(
                           jax.lax.stop_gradient(q)[..., None], (n, 3)),
                       jnp.ones((n, 3)), active_next & do_rr & survive)

        s["o"] = o_new
        s["d"] = d_new
        s["Mu"] = Mu
        s["Mn"] = Mn
        s["eta"] = eta_n
        s["depth"] = depth_n
        s["specular_chain"] = jnp.where(
            real_vtx, delta_cont,
            s["specular_chain"] & ~(surf_event & ~is_null_srf))
        s["prev_p"] = jnp.where(is_null_srf[..., None], s["prev_p"],
                                jnp.where(med_event[..., None], p_med,
                                          si.p))
        s["medium"] = med_next
        s["active"] = active_next & survive
        s["sampler"] = smp
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(n_iter))
    aovs = dict(depth=state["first_t"])
    return state["L"], jnp.isfinite(state["first_t"]), aovs, \
        state["sampler"]


register_integrator("volpathmis")(sample)
