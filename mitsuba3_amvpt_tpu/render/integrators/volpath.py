"""Volumetric path tracer.

Wavefront equivalent of src/integrators/volpath.cpp (561 LoC):
free-flight distance sampling with uniform
spectral channel selection (volpath.cpp:83), medium/surface event
split, phase-function NEE with MIS, medium transitions at transmissive
boundaries, and shadow rays that *cross* null-BSDF medium boundaries
(volpath.cpp NEE loop) accumulating per-segment transmittance.

Media models:
* homogeneous — analytic transmittance + channel-MIS free flight
  (render/medium.py sample_interaction),
* heterogeneous (gridvolume density) — delta-tracking free flight and
  ratio-tracking shadow transmittance against the scalar majorant
  (medium.sample_interaction_dt / transmittance_rt), selected by the
  static ``scene.has_hetero`` flag.

Depth accounting follows the reference: null-BSDF boundary crossings do
NOT consume path depth (volpath.cpp increments depth only on real
scatter events); the wavefront loop therefore runs
``max_depth + NULL_BUDGET`` iterations with a per-lane depth counter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler, sample_tea_32
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..bsdfs.registry import D_NULL
from ..medium import (medium_transmittance, phase_eval, phase_sample,
                      sample_interaction, sample_interaction_dt)
from ..records import Ray
from . import path as path_mod
from .api import register_integrator

mis_weight = path_mod.mis_weight

# extra loop iterations reserved for depth-free null boundary crossings
NULL_BUDGET = 4
# shadow-ray segments when null boundaries are present (nested media
# need one segment per boundary crossed toward the light)
SHADOW_SEGMENTS = 4


def _free_flight(scene, med, o, d, seg_len, smp):
    """Dispatch free-flight sampling on the static hetero flag.
    Returns (t, is_medium_event, weight, sampler)."""
    u_ch, smp = smp.next_1d()
    if scene.has_hetero:
        key, smp = smp.next_key()
        t, is_med, w, _ = sample_interaction_dt(
            scene.media, scene.volumes, med, o, d, seg_len, key, u_ch)
        # keep dimension parity with the homogeneous branch (u_dist)
        _, smp = smp.next_1d()
    else:
        u_t, smp = smp.next_1d()
        t, is_med, w, _ = sample_interaction(scene.media, med, u_ch, u_t,
                                             seg_len)
        _, smp = smp.next_key()
    return t, is_med, w, smp


def nee_transmittance(scene, si_evt, ds, med, smp):
    """Transmittance along the shadow ray si_evt.p -> ds.p, marching
    through null-BSDF medium boundaries (volpath.cpp NEE loop).

    Each segment: closest-hit up to the remaining distance; a hit on a
    null material accumulates the local medium transmittance and crosses
    the boundary; any other hit occludes.  Returns (Tr (N,3), sampler).
    """
    media = scene.media
    key, smp = smp.next_key()
    ray = si_evt.spawn_ray_to(ds.p)
    o, d = ray.o, ray.d
    remaining = ray.maxt
    n = remaining.shape[0]
    Tr = jnp.ones((n, 3))
    cur = med
    active = (ds.pdf > 0.0) & (remaining > 0.0)
    n_seg = SHADOW_SEGMENTS if scene.has_null_boundaries else 1

    for seg in range(n_seg):
        seg_key = sample_tea_32(key, jnp.uint32(seg), rounds=4)[0]
        si2 = scene.ray_intersect(Ray.make(o, d, remaining))
        hit = si2.is_valid
        seg_len = jnp.where(hit, si2.t, remaining)
        Tr_seg = medium_transmittance(media, scene.volumes, cur, o, d,
                                      seg_len, seg_key, scene.has_hetero)
        Tr = jnp.where(active[..., None], Tr * Tr_seg, Tr)
        mat = jnp.maximum(si2.material_index, 0)
        is_null = hit & (scene.materials.mtype[mat] == D_NULL)
        blocked = active & hit & ~is_null
        Tr = jnp.where(blocked[..., None], 0.0, Tr)
        if seg + 1 == n_seg:
            # segment budget exhausted while still marching: conservative 0
            Tr = jnp.where((active & hit & is_null)[..., None], 0.0, Tr)
            break
        # cross the null boundary into the next medium
        sh = jnp.maximum(si2.shape_index, 0)
        entering = m.dot(d, si2.n) < 0.0
        new_med = jnp.where(entering, scene.shape_interior[sh],
                            scene.shape_exterior[sh])
        cur = jnp.where(active & is_null, new_med, cur)
        o = jnp.where(hit[..., None], si2.spawn_ray(d).o, o)
        remaining = jnp.maximum(remaining - seg_len, 0.0)
        active = active & hit & is_null & (remaining > 1e-6)
    return Tr, smp


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
    n_iter = max_depth + (NULL_BUDGET if scene.has_null_boundaries else 0)

    state = dict(
        o=ray.o, d=ray.d,
        throughput=jnp.ones((n, 3)),
        L=jnp.zeros((n, 3)),
        eta=jnp.ones((n,)),
        active=active,
        depth=jnp.zeros((n,), jnp.int32),
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
        seg_len = jnp.where(valid, si.t, jnp.full((n,), 1e8))
        t_med, is_med_event, w_flight, smp = _free_flight(
            scene, med, s["o"], s["d"], seg_len, smp)
        med_event = active_i & in_medium & is_med_event
        surf_event = active_i & valid & (~in_medium | ~is_med_event)
        escaped = active_i & ~valid & ~med_event
        thr = s["throughput"] * jnp.where(in_medium[..., None], w_flight, 1.0)

        s["first_t"] = jnp.where((it == 0) & valid, si.t, s["first_t"])

        # null-BSDF surface hits pass straight through without consuming
        # depth (volpath.cpp null interaction handling)
        mat = jnp.maximum(si.material_index, 0)
        is_null_srf = surf_event & (scene.materials.mtype[mat] == D_NULL)
        depth_inc = jnp.where(is_null_srf | ~(med_event | surf_event), 0, 1)
        depth_n = s["depth"] + jnp.where(active_i, depth_inc, 0)

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

        active_next = (med_event | surf_event) & (depth_n < max_depth)

        # ---- NEE from the event point (medium or surface)
        p_med = ray_i.at(t_med)
        si_evt = si.replace(
            p=jnp.where(med_event[..., None], p_med, si.p),
            n=jnp.where(med_event[..., None],
                        -s["d"], si.n))   # spawn offset dir for medium
        u_nee, smp = smp.next_2d()
        ds, spec = scene.sample_emitter_direction(si_evt, u_nee,
                                                  test_visibility=False)
        Tr_sh, smp = nee_transmittance(scene, si_evt, ds, med, smp)
        spec = spec * Tr_sh
        wo_nee = si.to_local(ds.d)
        f_surf, pdf_surf_b = bsdf_eval_pdf(scene, si, wo_nee)
        sid = jnp.maximum(med, 0)
        f_phase = phase_eval(media, sid, s["d"], ds.d)
        f_nee = jnp.where(med_event[..., None], f_phase[..., None], f_surf)
        pdf_b = jnp.where(med_event, f_phase, pdf_surf_b)
        w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        smooth = (~bsdf_flags_delta(scene, si) & ~is_null_srf) | med_event
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        s["L"] = s["L"] + jnp.where(nee_ok[..., None],
                                    thr * spec * f_nee * w_em[..., None],
                                    0.0)

        # ---- continuation: phase sample (medium) or BSDF sample (surface)
        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        wo_phase, pdf_phase = phase_sample(media, sid, s["d"], u2)
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

        # ---- RR (keyed on real path depth)
        u_rr, smp = smp.next_1d()
        eta_n = s["eta"] * jnp.where(med_event, 1.0, bs.eta)
        thr_max = jnp.max(jax.lax.stop_gradient(thr), -1) * eta_n * eta_n
        q = jnp.minimum(thr_max, 0.95)
        do_rr = depth_n >= rr_depth
        survive = ~do_rr | (u_rr < q)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / jnp.maximum(jax.lax.stop_gradient(q),
                                          1e-8)[..., None], thr)

        s["o"] = o_new
        s["d"] = d_new
        s["throughput"] = jnp.where(active_next[..., None], thr,
                                    s["throughput"])
        s["eta"] = eta_n
        s["depth"] = depth_n
        # a null crossing is not a scattering vertex: the MIS state of the
        # last REAL vertex persists across it (volpath.cpp null handling)
        s["prev_pdf"] = jnp.where(is_null_srf, s["prev_pdf"], pdf_cont)
        s["prev_delta"] = jnp.where(is_null_srf, s["prev_delta"], delta_cont)
        s["prev_p"] = jnp.where(is_null_srf[..., None], s["prev_p"],
                                jnp.where(med_event[..., None], p_med, si.p))
        s["medium"] = med_next
        s["active"] = active_next & survive
        s["sampler"] = smp
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(n_iter))
    aovs = dict(depth=state["first_t"])
    return state["L"], jnp.isfinite(state["first_t"]), aovs, state["sampler"]


register_integrator("volpath")(sample)
