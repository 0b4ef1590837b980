"""AMVPT — adaptive multi-view path tracing with primary-hit sample
reuse (the fork's centerpiece).

Reimplements the `mvpath` plugin (src/integrators/mvpath.cpp 281 LoC +
mvpath.h 340 + mvpath_multi.h 692 + mvpath_single.h 281; Fraboni et al.
2019 "Adaptive multi-view path tracing") as a TPU wavefront:

  * N cameras render one quilt film; each lane's *primary* camera comes
    from its quilt tile (grid.cpp:269-297 sample_ray_idx),
  * views are partitioned into reuse groups of size S (divisor-of-N
    heuristic preferring >=8, mvpath.cpp:192-217); within a group the
    cameras a lane reuses are the rotation ``group_base + (local+s)%S``
    (mvpath_multi.h:30-38),
  * the primary hit is reprojected into every group camera via the
    fork's ``sensor.sample_surface`` (visibility = frustum + facing +
    shadow ray, mvpath.h:243-256); reuse eligibility requires a smooth,
    non-emitting BSDF (mvpath_multi.h:202-209),
  * camera selection is stochastic with probability
    ``pdf_Mat * pdf_J``: the GGX closed-form material-similarity pdf
    (tv_pdf_fast, mvpath.h:259-270; diffuse forces pdf_Mat=1) times the
    Jacobian probability ``min(J, 1/J)``, ``J = Jp_k / Jp_l``
    (mvpath_multi.h:417-425),
  * per-view MIS weights ``w_k = p(l->k) / sum_j p(j->k)`` with the
    pairwise simplification ``p(j->k) = min((Jp_j/Jp_k)^2, 1)``
    (mvpath_multi.h:466-523, A.8),
  * one shared NEE sample and ONE shared suffix path serve all views;
    the shared continuation direction is reservoir-replaced with prob
    1/n_indir among same-lobe candidates (mvpath_multi.h:445-459), and
    indirect contributions divide by the *mixture* pdf over selected
    views (mvpath_multi.h:275-307),
  * adaptive refill: pixels whose reuse failed (n_indir <= 1 while
    eligible) receive ``n_adapt`` extra independent samples, all
    weighted 1/(n_adapt+1) (mvpath_multi.h:79-115).  On TPU this is a
    masked second wavefront (static shapes) rather than a
    compress/gather — SURVEY.md §7 "dynamic wavefronts" stance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler
from ..bsdfs import (bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample,
                     eval_roughness)
from ..film import film_develop, film_prepare, film_put
from ..records import Ray
from . import path as path_mod

mis_weight = path_mod.mis_weight


def reuse_group_size(n_views: int, requested: int = 0) -> int:
    """Divisor-of-N heuristic preferring sizes >= 8 (mvpath.cpp:192-217)."""
    if requested and n_views % requested == 0:
        return requested
    divisors = [d for d in range(1, n_views + 1) if n_views % d == 0]
    ge8 = [d for d in divisors if d >= 8]
    return min(ge8) if ge8 else max(divisors)


def tv_pdf_fast(rough_l, rough_k, cos_l, cos_k):
    """GGX closed-form material-similarity probability (mvpath.h:259-270):
    replaces the pdf-ratio TV distance with half-vector cos^2 terms.

    rough_*: scalar roughness at the two views' incident directions;
    cos_*: |cos| of the incident directions at the shading point.
    Diffuse (roughness ~1) forces pdf 1 (mvpath_multi.h:397,416)."""
    a2 = jnp.maximum(rough_l * rough_l, 1e-6)
    # ratio of GGX NDF lobes evaluated at each view's half angle proxy
    t_l = cos_l * cos_l * (a2 - 1.0) + 1.0
    t_k = cos_k * cos_k * (a2 - 1.0) + 1.0
    q = jnp.minimum(t_l * t_l, t_k * t_k) / jnp.maximum(
        jnp.maximum(t_l * t_l, t_k * t_k), 1e-12)
    # piecewise-polynomial approx of q^(1/alpha) (mvpath.h:276-293)
    alpha = jnp.clip(rough_l, 1e-3, 1.0)
    lin = jnp.maximum(0.0, 1.0 + (q - 1.0) / jnp.sqrt(alpha)) ** 2
    p = m.lerp(lin, q, alpha)
    diffuse_like = rough_l > 0.99
    return jnp.where(diffuse_like, 1.0, jnp.clip(p, 0.0, 1.0))


@functools.partial(jax.jit,
                   static_argnames=("spp_pass", "max_depth", "rr_depth",
                                    "reuse_count", "sa_reuse", "sa_mis",
                                    "n_adapt"),
                   donate_argnames=("acc",))
def mvpath_pass(scene, acc, seed, spp_pass: int, max_depth: int = 6,
                rr_depth: int = 5, reuse_count: int = 0,
                sa_reuse: bool = True, sa_mis: bool = True,
                n_adapt: int = 0):
    """One multi-view pass over the full quilt wavefront."""
    sensor = scene.sensor
    N = sensor.n_sensors
    S = reuse_group_size(N, reuse_count) if sa_reuse else 1
    W, H = sensor.film_resolution
    n = W * H * spp_pass

    sampler = Sampler.seed(seed, n)
    idx = jnp.arange(n)
    pixel = idx // jnp.maximum(spp_pass, 1)
    px = (pixel % W).astype(jnp.float32)
    py = (pixel // W).astype(jnp.float32)
    u_pos, sampler = sampler.next_2d()
    pos = jnp.stack([px, py], -1) + u_pos
    pos_uv = pos / jnp.array([W, H], jnp.float32)
    p_view, uv = sensor.quilt_decode(pos_uv)
    u_lens, sampler = sampler.next_2d()
    ray, rweight = sensor.sample_ray(p_view, uv, u_lens)

    splats, sampler, adapt_mask = _sample_multi(
        scene, ray, pos, p_view, sampler, S, max_depth, rr_depth, sa_mis,
        u_lens)

    # refill weighting 1/(n_adapt+1) applies to the *primary-pixel*
    # sample of adaptive pixels and to its refills (mvpath_multi.h:52-58);
    # reprojected splats land in other views' pixels and keep weight 1.
    w_adapt = 1.0 / (n_adapt + 1.0)
    for i, (spos, val, sactive) in enumerate(splats):
        wgt = None
        if i == 0 and n_adapt > 0:
            wgt = jnp.where(adapt_mask, w_adapt, 1.0)
        acc = film_put(scene.film, acc, spos, val, weight=wgt,
                       active=sactive)

    # ---- adaptive refill: masked second wavefront ----
    if n_adapt > 0:
        for a in range(n_adapt):
            smp_a = sampler.fork(1000 + a)
            u_pos_a, smp_a = smp_a.next_2d()
            pos_a = jnp.stack([px, py], -1) + u_pos_a
            view_a, uv_a = sensor.quilt_decode(pos_a / jnp.array([W, H], jnp.float32))
            u_lens_a, smp_a = smp_a.next_2d()
            ray_a, rw_a = sensor.sample_ray(view_a, uv_a, u_lens_a)
            L_a, _, _, smp_a = path_mod.sample(
                scene, ray_a, smp_a, max_depth=max_depth, rr_depth=rr_depth,
                active=adapt_mask)
            acc = film_put(scene.film, acc, pos_a, L_a * rw_a,
                           weight=jnp.full((n,), w_adapt),
                           active=adapt_mask)
    return acc


def _sample_multi(scene, ray, pos, p_view, sampler, S, max_depth, rr_depth,
                  sa_mis, u_lens):
    """Core multi-view estimator (mvpath_multi.h:130 sample_multi).

    Returns (list of (pos, value, weight_or_None, active), sampler,
    adapt_mask)."""
    sensor = scene.sensor
    n = ray.o.shape[0]
    W, H = sensor.film_resolution
    vw, vh = sensor.resolution

    si = scene.ray_intersect(ray)
    valid = si.is_valid

    # ---- direct emission -> primary view only (mvpath_multi.h:148-156)
    L_primary = scene.eval_emitter(si, valid)
    env = scene.eval_environment(ray.d)
    L_primary = L_primary + jnp.where((~valid)[..., None], env, 0.0)

    # ---- reuse eligibility (mvpath_multi.h:202-209)
    delta_mat = bsdf_flags_delta(scene, si)
    rough = eval_roughness(scene, si)
    is_emitter = si.emitter_index >= 0
    eligible = valid & ~delta_mat & ~is_emitter & (rough > 0.0)

    group_base = (p_view // S) * S
    p_local = p_view % S

    # ---- shared NEE emitter sample (mvpath_multi.h:174-186)
    u_nee, sampler = sampler.next_2d()
    ds, spec = scene.sample_emitter_direction(si, u_nee)
    wo_nee_world = ds.d

    # ---- per-view reprojection + camera selection ----
    # s = 0 is the primary view itself
    cams, surfs, wi_local = [], [], []
    for s in range(S):
        cam = group_base + (p_local + s) % S
        cams.append(cam)
        if s == 0:
            surfs.append(None)
            wi_local.append(si.wi)
        else:
            u_l, sampler = sampler.next_2d()
            surf = sensor.sample_surface(cam, si.p, si.sh_n, u_l)
            # shadow ray to the camera (mvpath.h:243-256)
            cam_ray = si.spawn_ray_to(surf["p"])
            occluded = scene.ray_test(cam_ray)
            surf["visible"] = surf["visible"] & ~occluded & eligible
            surfs.append(surf)
            wi_local.append(si.to_local(surf["d"]))

    Jp = [None] * S
    Jp[0] = _primary_Jp(sensor, p_view, si)
    for s in range(1, S):
        Jp[s] = surfs[s]["Jp"]

    # stochastic selection (mvpath_multi.h:371-464)
    accepted = [jnp.ones((n,), bool)]   # primary always in
    rough_l = rough
    cos_l = jnp.abs(m.cos_theta(si.wi))
    for s in range(1, S):
        u_sel, sampler = sampler.next_1d()
        cos_k = jnp.abs(m.cos_theta(wi_local[s]))
        pdf_mat = tv_pdf_fast(rough_l, rough_l, cos_l, cos_k)
        J = m.safe_div(Jp[s], Jp[0])
        pdf_J = jnp.minimum(J, m.safe_div(1.0, J))
        p_acc = jnp.clip(pdf_mat * pdf_J, 0.0, 1.0)
        acc_s = surfs[s]["visible"] & (u_sel < p_acc)
        accepted.append(acc_s)
    n_indir = sum(a.astype(jnp.int32) for a in accepted)

    # ---- per-view MIS weights over views (mvpath_multi.h:466-523)
    # p(j->k) = min((Jp_j/Jp_k)^2, 1); w_k = p(0->k) / sum_j p(j->k)
    w_view = []
    for k in range(S):
        num = jnp.minimum(m.safe_div(Jp[0], Jp[k]) ** 2, 1.0)
        den = jnp.zeros((n,))
        for j in range(S):
            pjk = jnp.minimum(m.safe_div(Jp[j], Jp[k]) ** 2, 1.0)
            den = den + jnp.where(accepted[j], pjk, 0.0)
        wk = m.safe_div(num, den) if sa_mis else \
            m.safe_div(jnp.ones((n,)), n_indir.astype(jnp.float32))
        w_view.append(jnp.where(accepted[k], wk, 0.0))

    # ---- NEE contribution per view (mvpath_multi.h:248-267)
    # mixture bsdf pdf over selected views for MIS vs the emitter pdf
    f_nee, pdf_nee_mix = [], jnp.zeros((n,))
    wo_nee_count = jnp.maximum(n_indir.astype(jnp.float32), 1.0)
    for s in range(S):
        si_s = si.replace(wi=wi_local[s])
        f_s, p_s = bsdf_eval_pdf(scene, si_s, si.to_local(wo_nee_world))
        f_nee.append(f_s)
        pdf_nee_mix = pdf_nee_mix + jnp.where(accepted[s], p_s, 0.0)
    pdf_nee_mix = pdf_nee_mix / wo_nee_count
    w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_nee_mix))
    smooth = ~delta_mat

    # ---- shared continuation direction with reservoir replacement ----
    u1, sampler = sampler.next_1d()
    u2, sampler = sampler.next_2d()
    bs0 = bsdf_sample(scene, si, u1, u2)
    wo_shared = bs0.wo
    shared_delta = bs0.sampled_delta
    res_count = jnp.ones((n,))
    for s in range(1, S):
        u_r, sampler = sampler.next_1d()
        u1s, sampler = sampler.next_1d()
        u2s, sampler = sampler.next_2d()
        si_s = si.replace(wi=wi_local[s])
        bs_s = bsdf_sample(scene, si_s, u1s, u2s)
        same_lobe = (bs_s.sampled_delta == shared_delta) \
            & (bs_s.sampled_transmission == bs0.sampled_transmission)
        res_count = res_count + accepted[s].astype(jnp.float32)
        take = accepted[s] & same_lobe & (u_r * res_count < 1.0)
        wo_shared = jnp.where(take[..., None], bs_s.wo, wo_shared)

    # mixture pdf of the shared wo over selected views (mvpath_multi.h:275-307)
    f_ind, pdf_mix = [], jnp.zeros((n,))
    for s in range(S):
        si_s = si.replace(wi=wi_local[s])
        f_s, p_s = bsdf_eval_pdf(scene, si_s, wo_shared)
        f_ind.append(f_s)
        pdf_mix = pdf_mix + jnp.where(accepted[s], p_s, 0.0)
    pdf_mix = pdf_mix / wo_nee_count
    # delta lobes: eval is 0; fall back to primary-only transport
    use_mixture = smooth & ~shared_delta

    # ---- shared suffix path (mvpath_multi.h:526-689) ----
    d_world = si.to_world(wo_shared)
    suffix_ray = si.spawn_ray(d_world)
    L_suffix, prev_pdf_for_suffix = _sample_suffix(
        scene, suffix_ray, sampler, si, pdf_mix, shared_delta,
        max_depth, rr_depth, valid)
    sampler = prev_pdf_for_suffix  # (sampler returned)

    # ---- assemble per-view contributions & splat list ----
    splats = []
    # primary view: emission + NEE + indirect
    nee_ok0 = valid & smooth & (ds.pdf > 0.0) & (max_depth > 1)
    ind0 = jnp.where(
        (valid & (max_depth > 1))[..., None],
        jnp.where(use_mixture[..., None],
                  m.safe_div(f_ind[0], pdf_mix[..., None]) * w_view[0][..., None],
                  bs0.weight) * L_suffix, 0.0)
    val0 = (L_primary
            + jnp.where(nee_ok0[..., None],
                        spec * f_nee[0] * (w_em * w_view[0])[..., None], 0.0)
            + ind0)
    splats.append((pos, val0, None))

    # reused views: splat at the reprojected quilt position
    for s in range(1, S):
        surf = surfs[s]
        tile = sensor.quilt_tile_origin(cams[s]).astype(jnp.float32)
        pos_s = tile + surf["uv"] * jnp.array([vw, vh], jnp.float32)
        act = accepted[s] & valid
        nee_s = jnp.where((act & smooth & (ds.pdf > 0.0))[..., None],
                          spec * f_nee[s] * (w_em * w_view[s])[..., None], 0.0)
        ind_s = jnp.where((act & use_mixture)[..., None],
                          m.safe_div(f_ind[s], pdf_mix[..., None])
                          * w_view[s][..., None] * L_suffix, 0.0)
        splats.append((pos_s, nee_s + ind_s, act))

    # adaptive mask: eligible but reuse failed (mvpath_multi.h:307)
    adapt_mask = eligible & (n_indir <= 1)
    return splats, sampler, adapt_mask


def _primary_Jp(sensor, view, si):
    """Jp of the primary view (camera the ray came from)."""
    surf = sensor.sample_surface(view, si.p, si.sh_n,
                                 jnp.zeros(si.p.shape[:-1] + (2,)))
    return surf["Jp"]


def _sample_suffix(scene, ray, sampler, si_prev, pdf_mix, shared_delta,
                   max_depth, rr_depth, active):
    """Stock PT continuation shared by all views (mvpath_multi.h:526-689).

    Runs the remaining max_depth-2 bounces; the first suffix vertex's
    emitter-hit MIS uses the mixture pdf of the shared direction."""
    n = ray.o.shape[0]
    L, _, _, sampler = _suffix_loop(scene, ray, sampler, pdf_mix,
                                    shared_delta, max_depth - 2, rr_depth,
                                    active)
    return L, sampler


def _suffix_loop(scene, ray, sampler, first_pdf, first_delta, depth_budget,
                 rr_depth, active):
    """path.sample with injected prev_pdf/prev_delta of the shared dir."""
    n = ray.o.shape[0]
    has_env = scene.emitters.env_index >= 0
    state = dict(
        o=ray.o, d=ray.d,
        throughput=jnp.ones((n, 3)),
        L=jnp.zeros((n, 3)),
        eta=jnp.ones((n,)),
        active=active,
        prev_pdf=first_pdf,
        prev_delta=first_delta,
        prev_p=ray.o,
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
        if has_env:
            escaped = active_i & ~valid
            pdf_env = scene.pdf_environment_direction(s["d"])
            w_mis = jnp.where(s["prev_delta"], 1.0,
                              mis_weight(s["prev_pdf"], pdf_env))
            Lenv = scene.eval_environment(s["d"])
            s["L"] = s["L"] + jnp.where(
                escaped[..., None], s["throughput"] * Lenv * w_mis[..., None], 0.0)
        hit_act = active_i & valid
        Le = scene.eval_emitter(si, hit_act)
        pdf_nee = scene.pdf_emitter_hit(s["prev_p"], si)
        w_mis = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee))
        s["L"] = s["L"] + jnp.where(
            hit_act[..., None], s["throughput"] * Le * w_mis[..., None], 0.0)
        active_i = hit_act
        active_next = active_i & (it + 1 < depth_budget + 1)

        u_nee, smp = smp.next_2d()
        ds, spec = scene.sample_emitter_direction(si, u_nee)
        wo_nee = si.to_local(ds.d)
        f_nee, pdf_b = bsdf_eval_pdf(scene, si, wo_nee)
        w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        smooth = ~bsdf_flags_delta(scene, si)
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        s["L"] = s["L"] + jnp.where(
            nee_ok[..., None],
            s["throughput"] * spec * f_nee * w_em[..., None], 0.0)

        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        ray_new = si.spawn_ray(si.to_world(bs.wo))
        thr = s["throughput"] * bs.weight
        active_next = active_next & (bs.pdf > 0.0) \
            & (jnp.max(jnp.abs(thr), axis=-1) > 0.0)
        u_rr, smp = smp.next_1d()
        eta_n = s["eta"] * bs.eta
        thr_max = jnp.max(jax.lax.stop_gradient(thr), axis=-1) * eta_n * eta_n
        q = jnp.minimum(thr_max, 0.95)
        do_rr = it + 1 >= rr_depth
        survive = ~do_rr | (u_rr < q)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / jnp.maximum(jax.lax.stop_gradient(q), 1e-8)[..., None],
                        thr)
        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["throughput"] = jnp.where(active_next[..., None], thr, s["throughput"])
        s["eta"] = eta_n
        s["prev_pdf"] = bs.pdf
        s["prev_delta"] = bs.sampled_delta
        s["prev_p"] = si.p
        s["active"] = active_next & survive
        s["sampler"] = smp
        return s, None

    if depth_budget > 0:
        state, _ = jax.lax.scan(bounce, state, jnp.arange(depth_budget + 1))
    else:
        # still need the first-vertex emission for depth-2 paths
        state, _ = jax.lax.scan(bounce, state, jnp.arange(1))
    return state["L"], None, None, state["sampler"]


def render_mvpath(scene, spp: int = 16, seed: int = 0, max_depth: int = 6,
                  rr_depth: int = 5, reuse_count: int = 0,
                  sa_reuse: bool = True, sa_mis: bool = True,
                  n_adapt: int = 0, spp_per_pass: int = None,
                  raw: bool = False):
    """Multi-view render driver (MVPathIntegrator::render mvpath.cpp:7)."""
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 21) // max(W * H, 1)))
    acc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        acc = mvpath_pass(scene, acc, jnp.uint32(seed + sp * i + done), sp,
                          max_depth, rr_depth, reuse_count, sa_reuse,
                          sa_mis, n_adapt)
        done += sp
        i += 1
    return acc if raw else film_develop(acc)
