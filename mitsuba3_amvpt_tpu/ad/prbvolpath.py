"""Volumetric Path Replay Backpropagation.

Reimplements the reference's prbvolpath (src/python/python/ad/
integrators/prbvolpath.py, 434 LoC — Vicini et al. 2021 applied to
volumes) as a ``jax.custom_vjp`` around the wavefront volpath primal:

* primal pass: render/integrators/volpath.py sample(), no AD graph,
* backward pass: replay the identical path (same counter-based stream),
  peeling per bounce

    Lo = r_flight * (Le + Lr_dir + L_ind * r_cont)

  where ``r_flight = w_flight_att / detach(w_flight_att)`` re-attaches
  the free-flight weight (sigma_s * Tr / pdf for medium events,
  Tr / pdf for surface events — pdfs detached, "detached sampling") and
  ``r_cont`` is the BSDF-value ratio at surfaces / the phase-value ratio
  at medium events.

Differentiable: homogeneous-medium sigma_t / albedo / HG g, emitter
radiance and surface BSDFs through media, NEE transmittance (analytic,
including across null boundaries).  NOT differentiated here:
heterogeneous density grids — their flight weights come from
delta-tracking ``lax.while_loop``s (no reverse mode); those lanes use
ratio 1 and grid gradients are provided by the dedicated collision-
recorded estimator (ad/voxgrad.py) — mirroring the reference where
prbvolpath also special-cases medium internals.

RNG DISCIPLINE: consumes sampler dimensions in exactly the order of
integrators/volpath.py sample(): flight (u_ch + key + u_t), NEE
next_2d, shadow key, phase/BSDF next_1d+next_2d, RR next_1d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.rng import Sampler
from ..render.bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..render.bsdfs.registry import D_NULL
from ..render.film import film_develop, film_prepare, film_put_coalesced
from ..render.integrators.api import sample_rays
from ..render.integrators import path as path_mod
from ..render.integrators import volpath as volpath_mod
from ..render.medium import phase_eval, phase_sample
from ..render.records import Ray
from .prb import _float_zeros_like

mis_weight = path_mod.mis_weight
sg = jax.lax.stop_gradient


def _flight_weight_attached(media, med, ch, t, is_med):
    """Attached recompute of the homogeneous free-flight weight at the
    *detached* event distance t (medium.sample_interaction math with the
    sampling pdfs detached).  Vacuum lanes return 1."""
    sid = jnp.maximum(med, 0)
    st = media.sigma_t[sid] * media.scale[sid][..., None]
    ss = st * media.albedo[sid]
    Tr = jnp.exp(-st * t[..., None])
    pdf_t = sg(jnp.mean(st * Tr, axis=-1))
    pdf_s = sg(jnp.mean(Tr, axis=-1))
    w_med = ss * Tr / jnp.maximum(pdf_t, 1e-20)[..., None]
    w_srf = Tr / jnp.maximum(pdf_s, 1e-20)[..., None]
    w = jnp.where(is_med[..., None], w_med, w_srf)
    return jnp.where((med >= 0)[..., None], w, 1.0)


def _bounce_detached(scene, s, smp, it, max_depth, rr_depth):
    """Re-walk one volpath bounce exactly as volpath.sample does (same
    sampler consumption), returning every detached intermediate."""
    n = s["o"].shape[0]
    media = scene.media
    ray_i = Ray.make(s["o"], s["d"])
    si = scene.ray_intersect(ray_i)
    active_i = s["active"]
    valid = si.is_valid
    med = s["medium"]
    in_medium = med >= 0

    seg_len = jnp.where(valid, si.t, jnp.full((n,), 1e8))
    # channel id must match _free_flight's consumption for the attached
    # recompute: peek u_ch before delegating
    smp_ch = smp
    u_ch_peek, _ = smp_ch.next_1d()
    ch = jnp.clip((u_ch_peek * 3).astype(jnp.int32), 0, 2)
    t_med, is_med_event, w_flight, smp = volpath_mod._free_flight(
        scene, med, s["o"], s["d"], seg_len, smp)
    med_event = active_i & in_medium & is_med_event
    surf_event = active_i & valid & (~in_medium | ~is_med_event)
    escaped = active_i & ~valid & ~med_event
    w_fl = jnp.where(in_medium[..., None], w_flight, 1.0)

    mat = jnp.maximum(si.material_index, 0)
    is_null_srf = surf_event & (scene.materials.mtype[mat] == D_NULL)
    depth_inc = jnp.where(is_null_srf | ~(med_event | surf_event), 0, 1)
    depth_n = s["depth"] + jnp.where(active_i, depth_inc, 0)
    active_next = (med_event | surf_event) & (depth_n < max_depth)

    # ---- NEE
    p_med = ray_i.at(t_med)
    si_evt = si.replace(
        p=jnp.where(med_event[..., None], p_med, si.p),
        n=jnp.where(med_event[..., None], -s["d"], si.n))
    u_nee, smp = smp.next_2d()
    ds, spec_det = scene.sample_emitter_direction(si_evt, u_nee,
                                                  test_visibility=False)
    smp_shadow = smp   # sampler state entering nee_transmittance
    Tr_sh, smp = volpath_mod.nee_transmittance(scene, si_evt, ds, med, smp)
    wo_nee = si.to_local(ds.d)
    f_surf_nee, pdf_surf_nee = bsdf_eval_pdf(scene, si, wo_nee)
    sid = jnp.maximum(med, 0)
    f_phase_nee = phase_eval(media, sid, s["d"], ds.d)
    pdf_b = jnp.where(med_event, f_phase_nee, pdf_surf_nee)
    w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
    smooth = (~bsdf_flags_delta(scene, si) & ~is_null_srf) | med_event
    nee_ok = active_next & smooth & (ds.pdf > 0.0)

    # ---- continuation
    u1, smp = smp.next_1d()
    u2, smp = smp.next_2d()
    bs = bsdf_sample(scene, si, u1, u2)
    wo_phase, pdf_phase = phase_sample(media, sid, s["d"], u2)
    d_surf = si.to_world(bs.wo)
    d_new = jnp.where(med_event[..., None], wo_phase, d_surf)
    o_new = jnp.where(med_event[..., None], p_med + d_new * 1e-5,
                      si.spawn_ray(d_surf).o)
    w_cont = jnp.where(med_event[..., None], jnp.ones((n, 3)), bs.weight)
    pdf_cont = jnp.where(med_event, pdf_phase, bs.pdf)
    delta_cont = jnp.where(med_event, False, bs.sampled_delta)

    crossed = surf_event & (bs.sampled_transmission
                            | (m.dot(d_surf, si.n) * m.cos_theta(si.wi) < 0))
    sh = jnp.maximum(si.shape_index, 0)
    entering = m.dot(d_surf, si.n) < 0.0
    new_med = jnp.where(entering, scene.shape_interior[sh],
                        scene.shape_exterior[sh])
    med_next = jnp.where(crossed, new_med, med)

    thr_next = s["beta"] * w_fl * w_cont
    active_next = active_next & (pdf_cont > 0.0) \
        & (jnp.max(jnp.abs(thr_next), axis=-1) > 0.0)

    u_rr, smp = smp.next_1d()
    eta_n = s["eta"] * jnp.where(med_event, 1.0, bs.eta)
    thr_max = jnp.max(thr_next, -1) * eta_n * eta_n
    q = jnp.minimum(thr_max, 0.95)
    do_rr = depth_n >= rr_depth
    survive = ~do_rr | (u_rr < q)
    rr_scale = jnp.where(do_rr & survive, 1.0 / jnp.maximum(q, 1e-8), 1.0)
    active_cont = active_next & survive

    # MIS weights for emission at THIS bounce
    pdf_nee_hit = scene.pdf_emitter_hit(s["prev_p"], si)
    w_mis_hit = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee_hit))
    w_mis_env = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"],
                                     scene.pdf_environment_direction(s["d"])))

    return dict(si=si, si_evt=si_evt, ch=ch, t_med=t_med, w_fl=w_fl,
                med_event=med_event, surf_event=surf_event, escaped=escaped,
                is_null_srf=is_null_srf, depth_n=depth_n, u_nee=u_nee,
                ds=ds, smp_shadow=smp_shadow, Tr_sh=Tr_sh, wo_nee=wo_nee,
                w_em=w_em, nee_ok=nee_ok, bs=bs, wo_phase=wo_phase,
                o_new=o_new, d_new=d_new, w_cont=w_cont, pdf_cont=pdf_cont,
                delta_cont=delta_cont, med_next=med_next, p_med=p_med,
                eta_n=eta_n, rr_scale=rr_scale, active_cont=active_cont,
                smooth=smooth, w_mis_hit=w_mis_hit, w_mis_env=w_mis_env,
                smp=smp)


def _replay_backward(scene, ray: Ray, sampler: Sampler, dL, L, max_depth,
                     rr_depth):
    """The volumetric PRB replay loop (prbvolpath.py sample backward)."""
    n = ray.o.shape[0]
    has_env = scene.emitters.env_index >= 0
    media = scene.media
    n_iter = max_depth + (volpath_mod.NULL_BUDGET
                          if scene.has_null_boundaries else 0)

    state = dict(
        o=ray.o, d=ray.d,
        L_rem=L,
        beta=jnp.ones((n, 3)),
        eta=jnp.ones((n,)),
        active=jnp.ones((n,), bool),
        depth=jnp.zeros((n,), jnp.int32),
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray.o,
        medium=jnp.full((n,), scene.camera_medium, jnp.int32),
        sampler=sampler,
        grad=_float_zeros_like(scene),
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        grad = s.pop("grad")
        det = jax.lax.stop_gradient(
            _bounce_detached(scene, s, smp, it, max_depth, rr_depth))
        smp = det.pop("smp")
        smp_shadow = det.pop("smp_shadow")
        si = det["si"]
        bs = det["bs"]
        med = s["medium"]
        sid = jnp.maximum(med, 0)
        beta = s["beta"]
        med_event = det["med_event"]

        def emission_terms(scene_att):
            """Attached Le and Lr_dir at this bounce (beta detached,
            local flight ratio applied by the caller)."""
            b = beta * det["w_fl"]
            Le = b * det["w_mis_hit"][..., None] \
                * scene_att.eval_emitter(si, det["surf_event"])
            if has_env:
                Le = Le + jnp.where(
                    det["escaped"][..., None],
                    b * det["w_mis_env"][..., None]
                    * scene_att.eval_environment(s["d"]), 0.0)
            _, spec_att = scene_att.sample_emitter_direction(
                det["si_evt"], det["u_nee"], test_visibility=False)
            if scene.has_hetero:
                Tr_att = det["Tr_sh"]
            else:
                Tr_att, _ = volpath_mod.nee_transmittance(
                    scene_att, det["si_evt"], det["ds"], med, smp_shadow)
            f_surf_att, _ = bsdf_eval_pdf(scene_att, si, det["wo_nee"])
            f_phase_att = phase_eval(scene_att.media, sid,
                                     s["d"], det["ds"].d)
            f_nee = jnp.where(med_event[..., None],
                              f_phase_att[..., None], f_surf_att)
            Lr_dir = jnp.where(det["nee_ok"][..., None],
                               b * spec_att * Tr_att * f_nee
                               * det["w_em"][..., None], 0.0)
            return Le, Lr_dir

        Le_det, Lr_dir_det = jax.lax.stop_gradient(emission_terms(scene))
        L_after = sg(s["L_rem"] - Le_det - Lr_dir_det)

        def contrib(scene_att):
            # flight-weight ratio (homogeneous analytic; hetero lanes 1)
            if scene.has_hetero:
                r_fl = jnp.ones((n, 3))
            else:
                w_att = _flight_weight_attached(
                    scene_att.media, med, det["ch"], det["t_med"],
                    med_event)
                r_fl = m.safe_div(w_att, sg(w_att), 1.0)
                r_fl = jnp.where((med >= 0)[..., None], r_fl, 1.0)
            Le, Lr_dir = emission_terms(scene_att)
            # continuation ratio: BSDF value at surfaces, phase at media
            f_att, _ = bsdf_eval_pdf(scene_att, si, bs.wo)
            r_bsdf = m.safe_div(f_att, sg(f_att), 1.0)
            p_att = phase_eval(scene_att.media, sid,
                               s["d"], det["d_new"])
            r_phase = m.safe_div(p_att, sg(p_att), 1.0)[..., None]
            r_cont = jnp.where(med_event[..., None], r_phase, r_bsdf)
            r_cont = jnp.where(
                ((det["smooth"] | med_event) & det["active_cont"])[..., None],
                r_cont, 1.0)
            Lo = r_fl * (Le + Lr_dir + L_after * r_cont)
            return jnp.sum(jnp.where(s["active"][..., None], dL * Lo, 0.0))

        _, vjp_fn = jax.vjp(contrib, scene)
        (g,) = vjp_fn(jnp.ones(()))
        grad = jax.tree_util.tree_map(
            lambda a, b: a + jnp.nan_to_num(b)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            grad, g)

        s["o"] = det["o_new"]
        s["d"] = det["d_new"]
        s["L_rem"] = L_after
        s["beta"] = jnp.where(det["active_cont"][..., None],
                              beta * det["w_fl"] * det["w_cont"]
                              * det["rr_scale"][..., None], beta)
        s["eta"] = det["eta_n"]
        s["depth"] = det["depth_n"]
        is_null = det["is_null_srf"]
        s["prev_pdf"] = jnp.where(is_null, s["prev_pdf"], det["pdf_cont"])
        s["prev_delta"] = jnp.where(is_null, s["prev_delta"],
                                    det["delta_cont"])
        s["prev_p"] = jnp.where(is_null[..., None], s["prev_p"],
                                jnp.where(med_event[..., None],
                                          det["p_med"], si.p))
        s["medium"] = det["med_next"]
        s["active"] = det["active_cont"]
        s["sampler"] = smp
        s["grad"] = grad
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(n_iter))
    return state["grad"]


# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def prbvol_pass(scene, seed, spp_pass: int, max_depth: int, rr_depth: int):
    """One spp_pass volumetric render pass with PRB gradients."""
    return _primal(scene, seed, spp_pass, max_depth, rr_depth)


def _primal(scene, seed, spp_pass, max_depth, rr_depth,
            return_radiance: bool = False):
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    L, valid, aovs, sampler = volpath_mod.sample(
        scene, ray, sampler, max_depth=max_depth, rr_depth=rr_depth)
    acc = film_prepare(scene.film)
    jitter = pos - jnp.floor(pos)
    acc = film_put_coalesced(scene.film, acc, jitter, L * weight, spp_pass)
    if return_radiance:
        return acc, L
    return acc


def _fwd(scene, seed, spp_pass, max_depth, rr_depth):
    # save the per-lane primal radiance so the backward skips its
    # primal-recompute walk (see ad/prb.py:_prb_fwd)
    acc, L = _primal(sg(scene), seed, spp_pass, max_depth, rr_depth,
                     return_radiance=True)
    return acc, (sg(scene), seed, sg(L))


def _bwd(spp_pass, max_depth, rr_depth, res, g_acc):
    scene, seed, L = res
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    jitter = pos - jnp.floor(pos)

    def splat(values):
        acc0 = film_prepare(scene.film)
        return film_put_coalesced(scene.film, acc0, jitter, values, spp_pass)

    _, splat_vjp = jax.vjp(splat, jnp.zeros((n, 3)))
    (dL,) = splat_vjp(g_acc)
    dL = sg(dL * weight)

    grad_scene = _replay_backward(scene, ray, sampler, dL, sg(L),
                                  max_depth, rr_depth)
    return (grad_scene, None)


prbvol_pass.defvjp(_fwd, _bwd)
