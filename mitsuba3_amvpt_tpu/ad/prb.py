"""Path Replay Backpropagation (PRB) as a ``jax.custom_vjp``.

Reimplements the reference's gradient method (src/python/python/ad/
integrators/prb.py:64-258 + the _RenderOp custom op util.py:333-509)
TPU-natively:

* primal pass: the ordinary wavefront render, no AD graph,
* backward pass: (1) differentiate film splat+develop to get per-sample
  adjoints dL, (2) recompute the primal radiance L with the *same*
  counter-based sampler stream, (3) replay the identical path, peeling
  per-bounce ``Lo = Le + Lr_dir + L_ind * f/detach(f)`` and accumulating
  ``vjp(sum(dL * Lo))`` w.r.t. the scene pytree (prb.py:200-248
  ``dr.backward_from(dL * Lo)``).

Memory is O(wavefront), not O(wavefront * depth) — each bounce's vjp is
local (the core PRB property, SURVEY.md §3.4).  Sampling decisions are
detached ("detached sampling", prb.py); differentiable: BSDF parameters
of smooth lobes, emitter radiance, textures.  Not differentiated (gaps,
as in base PRB): delta-lobe parameters, shape/visibility (needs the
projective subsystem, reference ad/projective.py — SURVEY.md §A.10).

RNG DISCIPLINE: the replay loop consumes sampler dimensions in exactly
the order of integrators/path.py:sample — NEE next_2d, BSDF next_1d +
next_2d, RR next_1d per bounce (SURVEY.md §A.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.rng import Sampler
from ..render.bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..render.film import (film_develop, film_prepare, film_put,
                           film_put_coalesced)
from ..render.integrators.api import sample_rays
from ..render.integrators import path as path_mod
from ..render.records import Ray

mis_weight = path_mod.mis_weight
sg = jax.lax.stop_gradient


def _float_zeros_like(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def prb_pass(scene, seed, spp_pass: int, max_depth: int, rr_depth: int):
    """One spp_pass render pass with PRB gradients -> raw film acc."""
    return _primal(scene, seed, spp_pass, max_depth, rr_depth)


def _primal(scene, seed, spp_pass, max_depth, rr_depth,
            return_radiance: bool = False):
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    L, valid, aovs, sampler = path_mod.sample(
        scene, ray, sampler, max_depth=max_depth, rr_depth=rr_depth)
    acc = film_prepare(scene.film)
    jitter = pos - jnp.floor(pos)
    acc = film_put_coalesced(scene.film, acc, jitter, L * weight, spp_pass)
    if return_radiance:
        return acc, L
    return acc


def _prb_fwd(scene, seed, spp_pass, max_depth, rr_depth):
    # stash the per-lane primal radiance L as a residual: the backward
    # then needs ONE scene walk (the replay) instead of two — the
    # reference's two-pass structure (common.py:489+ render_backward:
    # primal radiance is computed once and handed to the replay), at a
    # cost of one (n, 3) array held between fwd and bwd.
    acc, L = _primal(sg(scene), seed, spp_pass, max_depth, rr_depth,
                     return_radiance=True)
    return acc, (sg(scene), seed, sg(L))


def _prb_bwd(spp_pass, max_depth, rr_depth, res, g_acc):
    scene, seed, L = res
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)

    # per-sample adjoint dL: transpose of the film splat at these
    # positions (common.py:216-223 — differentiating put+develop);
    # must be the SAME splat as the primal (coalesced)
    jitter = pos - jnp.floor(pos)

    def splat(values):
        acc0 = film_prepare(scene.film)
        return film_put_coalesced(scene.film, acc0, jitter, values, spp_pass)

    _, splat_vjp = jax.vjp(splat, jnp.zeros((n, 3)))
    (dL,) = splat_vjp(g_acc)
    dL = sg(dL * weight)

    # replay (the primal radiance comes from the forward residuals —
    # same seed, same counter-based stream, so it is exactly the L the
    # old in-backward recompute produced)
    grad_scene = _replay_backward(scene, ray, sampler, dL, sg(L),
                                  max_depth, rr_depth)
    return (grad_scene, None)


def _bounce_detached(scene, s, smp, it, max_depth, rr_depth):
    """Re-walk one bounce exactly as integrators/path.py does, returning
    every detached intermediate the attached evaluation needs."""
    si = scene.ray_intersect(Ray.make(s["o"], s["d"]))
    active_i = s["active"]
    valid = si.is_valid

    u_nee, smp = smp.next_2d()
    ds, spec_det = scene.sample_emitter_direction(si, u_nee)
    wo_nee = si.to_local(ds.d)
    f_det_nee, pdf_b_nee = bsdf_eval_pdf(scene, si, wo_nee)
    u1, smp = smp.next_1d()
    u2, smp = smp.next_2d()
    bs = bsdf_sample(scene, si, u1, u2)
    u_rr, smp = smp.next_1d()

    hit_act = active_i & valid
    escaped = active_i & ~valid
    active_next = hit_act & (it + 1 < max_depth)
    smooth = ~bsdf_flags_delta(scene, si)
    nee_ok = active_next & smooth & (ds.pdf > 0.0)
    w_mis_hit = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"],
                                     scene.pdf_emitter_hit(s["prev_p"], si)))
    w_mis_env = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"],
                                     scene.pdf_environment_direction(s["d"])))
    w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b_nee))

    thr_next = s["beta"] * bs.weight
    eta_n = s["eta"] * bs.eta
    thr_max = jnp.max(jnp.abs(thr_next), axis=-1) * eta_n * eta_n
    q = jnp.minimum(thr_max, 0.95)
    do_rr = it + 1 >= rr_depth
    survive = ~do_rr | (u_rr < q)
    rr_scale = jnp.where(do_rr & survive, 1.0 / jnp.maximum(q, 1e-8), 1.0)
    active_cont = active_next & (bs.pdf > 0.0) & survive \
        & (jnp.max(jnp.abs(thr_next), axis=-1) > 0.0)

    return dict(si=si, u_nee=u_nee, ds=ds, spec_det=spec_det, wo_nee=wo_nee,
                f_det_nee=f_det_nee, bs=bs, hit_act=hit_act, escaped=escaped,
                smooth=smooth, nee_ok=nee_ok, w_mis_hit=w_mis_hit,
                w_mis_env=w_mis_env, w_em=w_em, thr_next=thr_next,
                eta_n=eta_n, rr_scale=rr_scale, active_cont=active_cont,
                smp=smp)


def _replay_backward(scene, ray: Ray, sampler: Sampler, dL, L, max_depth,
                     rr_depth):
    """The PRB replay loop (prb.py:109-258 sample(mode=Backward))."""
    n = ray.o.shape[0]
    has_env = scene.emitters.env_index >= 0

    # Differentiate w.r.t. the declared parameter set only (ad/params.py
    # _PARAM_PATHS) instead of the whole scene pytree: the scan carry
    # then holds param-sized gradient arrays, not a full scene of
    # zeros, and the per-bounce vjp transposes only the parameter ->
    # radiance paths (VERDICT round-1: "restrict the per-bounce jax.vjp
    # to the differentiable leaves").
    from .params import traverse, update_scene
    params0 = traverse(scene)

    state = dict(
        o=ray.o, d=ray.d,
        L_rem=L,                              # remaining global radiance
        beta=jnp.ones((n, 3)),                # detached throughput
        eta=jnp.ones((n,)),
        active=jnp.ones((n,), bool),
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray.o,
        sampler=sampler,
        grad=jax.tree_util.tree_map(jnp.zeros_like, params0),
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        grad = s.pop("grad")
        det = jax.lax.stop_gradient(
            _bounce_detached(scene, s, smp, it, max_depth, rr_depth))
        smp = det.pop("smp")
        si = det["si"]
        bs = det["bs"]
        beta = s["beta"]

        def emission_terms(scene_att):
            """Globally-scaled attached Le and Lr_dir at this bounce."""
            Le = beta * det["w_mis_hit"][..., None] \
                * scene_att.eval_emitter(si, det["hit_act"])
            if has_env:
                Le = Le + jnp.where(
                    det["escaped"][..., None],
                    beta * det["w_mis_env"][..., None]
                    * scene_att.eval_environment(s["d"]), 0.0)
            # NEE with attached radiance (pdf/visibility detached):
            _, spec_att = scene_att.sample_emitter_direction(
                si, det["u_nee"], test_visibility=False)
            f_att, _ = bsdf_eval_pdf(scene_att, si, det["wo_nee"])
            Lr_dir = jnp.where(det["nee_ok"][..., None],
                               beta * spec_att * f_att
                               * det["w_em"][..., None], 0.0)
            return Le, Lr_dir

        # detached versions for the L_rem peel
        Le_det, Lr_dir_det = jax.lax.stop_gradient(emission_terms(scene))
        L_after = sg(s["L_rem"] - Le_det - Lr_dir_det)

        def contrib(p):
            scene_att = update_scene(scene, p)
            Le, Lr_dir = emission_terms(scene_att)
            # indirect: remaining radiance transported through the
            # attached/detached BSDF value ratio (prb.py Lr_ind)
            f_att, _ = bsdf_eval_pdf(scene_att, si, bs.wo)
            ratio = m.safe_div(f_att, sg(f_att), 1.0)
            ratio = jnp.where((det["smooth"] & det["active_cont"])[..., None],
                              ratio, 1.0)
            Lo = Le + Lr_dir + L_after * ratio
            return jnp.sum(jnp.where(s["active"][..., None], dL * Lo, 0.0))

        _, vjp_fn = jax.vjp(contrib, params0)
        (g,) = vjp_fn(jnp.ones(()))
        grad = jax.tree_util.tree_map(
            lambda a, b: a + jnp.nan_to_num(b), grad, g)

        d_new = si.to_world(bs.wo)
        ray_new = si.spawn_ray(d_new)
        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["L_rem"] = L_after
        s["beta"] = jnp.where(det["active_cont"][..., None],
                              det["thr_next"] * det["rr_scale"][..., None],
                              beta)
        s["eta"] = det["eta_n"]
        s["prev_pdf"] = bs.pdf
        s["prev_delta"] = bs.sampled_delta
        s["prev_p"] = si.p
        s["active"] = det["active_cont"]
        s["sampler"] = smp
        s["grad"] = grad
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    # embed the parameter gradients into a scene-shaped cotangent
    # (zeros everywhere else) for the custom_vjp contract
    return update_scene(_float_zeros_like(scene), state["grad"])


prb_pass.defvjp(_prb_fwd, _prb_bwd)


# ---------------------------------------------------------------------------
# Forward-mode PRB (tangent replay) — per-pixel gradient images
# ---------------------------------------------------------------------------


def _replay_forward(scene, tangents, ray, sampler, L, dL_lane0, max_depth,
                    rr_depth):
    """Forward-mode twin of _replay_backward (reference prb.py
    sample(mode=Forward), ad/integrators/prb.py:109-258): walks the
    identical path, accumulating per-lane radiance *tangents*
    dLo = jvp(Le + Lr_dir + L_ind * f/detach(f)) per bounce.  Splatting
    the summed tangent through the film yields the per-pixel gradient
    image dI/dtheta for a scalar- or array-valued parameter tangent."""
    from .params import traverse, update_scene
    params0 = traverse(scene)
    n = ray.o.shape[0]
    has_env = scene.emitters.env_index >= 0

    state = dict(
        o=ray.o, d=ray.d,
        L_rem=L,
        beta=jnp.ones((n, 3)),
        eta=jnp.ones((n,)),
        active=jnp.ones((n,), bool),
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray.o,
        sampler=sampler,
        dL=dL_lane0,                      # (n, 3) accumulated tangent
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        dL = s.pop("dL")
        det = jax.lax.stop_gradient(
            _bounce_detached(scene, s, smp, it, max_depth, rr_depth))
        smp = det.pop("smp")
        si = det["si"]
        bs = det["bs"]
        beta = s["beta"]

        def emission_terms(scene_att):
            Le = beta * det["w_mis_hit"][..., None] \
                * scene_att.eval_emitter(si, det["hit_act"])
            if has_env:
                Le = Le + jnp.where(
                    det["escaped"][..., None],
                    beta * det["w_mis_env"][..., None]
                    * scene_att.eval_environment(s["d"]), 0.0)
            _, spec_att = scene_att.sample_emitter_direction(
                si, det["u_nee"], test_visibility=False)
            f_att, _ = bsdf_eval_pdf(scene_att, si, det["wo_nee"])
            Lr_dir = jnp.where(det["nee_ok"][..., None],
                               beta * spec_att * f_att
                               * det["w_em"][..., None], 0.0)
            return Le, Lr_dir

        Le_det, Lr_dir_det = jax.lax.stop_gradient(emission_terms(scene))
        L_after = sg(s["L_rem"] - Le_det - Lr_dir_det)

        def contrib(p):
            scene_att = update_scene(scene, p)
            Le, Lr_dir = emission_terms(scene_att)
            f_att, _ = bsdf_eval_pdf(scene_att, si, bs.wo)
            ratio = m.safe_div(f_att, sg(f_att), 1.0)
            ratio = jnp.where((det["smooth"] & det["active_cont"])[..., None],
                              ratio, 1.0)
            Lo = Le + Lr_dir + L_after * ratio
            return jnp.where(s["active"][..., None], Lo, 0.0)

        _, dLo = jax.jvp(contrib, (params0,), (tangents,))
        dL = dL + jnp.nan_to_num(dLo)

        d_new = si.to_world(bs.wo)
        ray_new = si.spawn_ray(d_new)
        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["L_rem"] = L_after
        s["beta"] = jnp.where(det["active_cont"][..., None],
                              det["thr_next"] * det["rr_scale"][..., None],
                              beta)
        s["eta"] = det["eta_n"]
        s["prev_pdf"] = bs.pdf
        s["prev_delta"] = bs.sampled_delta
        s["prev_p"] = si.p
        s["active"] = det["active_cont"]
        s["sampler"] = smp
        s["dL"] = dL
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    return state["dL"]


def prb_forward_pass(scene, tangents, seed, spp_pass: int, max_depth: int,
                     rr_depth: int):
    """One pass of forward-mode PRB -> tangent raw film accumulator.

    ``tangents``: pytree matching ad.traverse(scene) — the parameter
    perturbation direction.  Returns d(acc)/d(theta) along it."""
    with m.take_rows_jvp_mode():
        return _prb_forward_pass(scene, tangents, seed, spp_pass,
                                 max_depth, rr_depth)


def _prb_forward_pass(scene, tangents, seed, spp_pass, max_depth, rr_depth):
    scene = sg(scene)
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    L, _, _, _ = path_mod.sample(scene, ray, sampler, max_depth=max_depth,
                                 rr_depth=rr_depth)
    dL = _replay_forward(scene, tangents, ray, sampler, sg(L),
                         jnp.zeros((n, 3)), max_depth, rr_depth)
    acc = film_prepare(scene.film)
    jitter = pos - jnp.floor(pos)
    return film_put_coalesced(scene.film, acc, jitter, dL * weight, spp_pass)


def render_ad_forward(scene, tangents, spp: int = 16, seed: int = 0,
                      max_depth: int = 6, rr_depth: int = 5,
                      spp_per_pass: int = None):
    """Forward-mode differentiable render: the per-pixel gradient image
    dI/dtheta for the parameter direction ``tangents`` (reference
    render_forward, common.py:112-168).  Weight-channel tangent is zero
    (sampling detached), so develop reduces to dividing by the primal
    weight accumulator."""
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 21) // max(W * H, 1)))
    dacc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        dacc = dacc + prb_forward_pass(scene, tangents,
                                       jnp.uint32(seed + sp * i + done), sp,
                                       max_depth, rr_depth)
        done += sp
        i += 1
    # tangent of develop: d(values/weight) = dvalues/weight — the
    # weight channel is detached (sampling decisions carry no tangent),
    # and the tangent acc's own weight channel equals the primal one
    # (film_put_coalesced splats filter weights independent of values)
    w = dacc[..., -1:]
    return dacc[..., :-1] / jnp.where(w == 0.0, 1.0, w)


def render_ad(scene, spp: int = 16, seed: int = 0, max_depth: int = 6,
              rr_depth: int = 5, spp_per_pass: int = None, raw: bool = False,
              integrator: str = "path"):
    """Differentiable render (mi.render equivalent): gradients w.r.t.
    the scene pytree flow through PRB, O(1)-memory in depth.

    ``integrator="volpath"`` on a scene with media uses the volumetric
    PRB (ad/prbvolpath.py); like the primal volpath it falls back to the
    surface PRB on media-free scenes."""
    if integrator == "volpath" and scene.has_media:
        from .prbvolpath import prbvol_pass as pass_fn
    else:
        pass_fn = prb_pass
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 21) // max(W * H, 1)))
    acc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        acc = acc + pass_fn(scene, jnp.uint32(seed + sp * i + done), sp,
                            max_depth, rr_depth)
        done += sp
        i += 1
    return acc if raw else film_develop(acc)
