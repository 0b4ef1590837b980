"""Polarized path tracing + the ``stokes`` integrator.

TPU-native equivalent of the reference's ``_polarized`` variants
(Spectrum = MuellerMatrix) combined with the ``stokes`` wrapper plugin
(src/integrators/stokes.cpp): radiance is carried as per-channel Stokes
vectors (N, 3, 4) and path throughput as per-channel Mueller matrices
(N, 3, 4, 4) — batched 4x4 products that XLA maps onto the vector/matrix
units directly, instead of Dr.Jit's struct-of-arrays Mueller type.

Polarization-aware interactions (all basis rotations follow
render/mueller.h and SurfaceInteraction::to_world_mueller,
interaction.h:407):

* smooth/rough conductors — complex-Fresnel ``specular_reflection``
  (conductor.cpp:272-301, roughconductor eval at the half-vector),
* smooth dielectrics — ``specular_reflection`` / ``specular_transmission``
  (dielectric.cpp polarized branch),
* linear polarizer / retarder / circular polarizer elements with tilted
  effective axes (polarizer.cpp:120-147 Korger et al. 2013,
  retarder.cpp, circular.cpp),
* everything else (diffuse-like) — ideal depolarizer, matching the
  reference's pplastic/diffuse treatment of subsurface scattering.

Emitters are unpolarized (Stokes (Le, 0, 0, 0)), as in the reference.

The scalar pipeline's importance sampling is reused unchanged: every
bounce's Mueller matrix is normalized by its M00 and scaled by the
scalar weight (f/pdf), so S0 of a fully-depolarizing scene reproduces
the scalar ``path`` image exactly (test_polarized.py asserts this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import mueller as mu
from ...core.rng import Sampler
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..bsdfs.registry import (D_CIRCULAR, D_CONDUCTOR, D_DIELECTRIC,
                              D_MEASURED_POL, D_POLARIZER, D_RETARDER,
                              D_ROUGHCONDUCTOR, D_ROUGHDIELECTRIC,
                              _gather_params)
from ..records import Ray
from .api import register_integrator
from .path import mis_weight

_EYE4 = jnp.eye(4, dtype=jnp.float32)


def _plane_axes(h, wo_hat, wi_hat):
    """Stokes axes perpendicular to the plane of reflection around a
    (microfacet) normal h; collinear fallback (conductor.cpp:286-294)."""
    a_in = jnp.cross(h, -wo_hat)
    a_out = jnp.cross(h, wi_hat)
    collinear = jnp.sum(a_in * a_in, -1) < 1e-12
    fallback = jnp.zeros_like(h).at[..., 0].set(1.0)
    a_in = jnp.where(collinear[..., None], fallback, m.normalize(a_in))
    a_out = jnp.where(collinear[..., None], fallback, m.normalize(a_out))
    return a_in, a_out


def _normalize_m00(M):
    """Divide a Mueller matrix by its M00 so the scalar pipeline's f/pdf
    weight carries the energy; a vanishing M00 (fully absorbed sample,
    weight 0 in the scalar path anyway) falls back to the identity."""
    m00 = M[..., 0:1, 0:1]
    return jnp.where(m00 > 1e-12, M / jnp.maximum(m00, 1e-12),
                     jnp.broadcast_to(_EYE4, M.shape))


def _specular_mueller(p, t, wi, wo, trans_mask):
    """Local-frame polarized Mueller factor (normalized to M00 == 1)
    for a sampled/evaluated direction pair at a specular-ish surface.

    Covers conductor-family reflection (complex eta per channel) and
    dielectric-family reflection/transmission; all other material types
    fall back to the ideal depolarizer."""
    n = wi.shape[0]
    # half-vector; for delta lobes (smooth types) the plane normal is z
    h_rough = m.normalize(wi + wo)
    z_axis = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    is_rough = (t == D_ROUGHCONDUCTOR) | (t == D_ROUGHDIELECTRIC)
    h = jnp.where(is_rough[..., None], h_rough, z_axis)
    # transmission through dielectrics: the "plane normal" stays +z and
    # the Fresnel cosine is taken on the incident side
    wo_hat, wi_hat = wo, wi    # radiance transport (light arrives -wo)
    cos_i = jnp.sum(wo_hat * h, -1)

    is_cond = (t == D_CONDUCTOR) | (t == D_ROUGHCONDUCTOR)
    is_diel = (t == D_DIELECTRIC) | (t == D_ROUGHDIELECTRIC)

    # conductor: per-channel complex eta -> (N, 3, 4, 4)
    M_c = mu.specular_reflection(cos_i[:, None], p["eta_c"], p["k_c"])
    # dielectric reflection / transmission: scalar eta, broadcast to RGB
    M_dr = mu.specular_reflection(cos_i[:, None],
                                  jnp.broadcast_to(p["eta"][:, None], (n, 3)))
    M_dt = mu.specular_transmission(
        cos_i[:, None], jnp.broadcast_to(p["eta"][:, None], (n, 3)))
    M_d = jnp.where(trans_mask[..., None, None, None], M_dt, M_dr)

    M = jnp.where(is_cond[..., None, None, None], M_c,
                  jnp.where(is_diel[..., None, None, None], M_d,
                            jnp.broadcast_to(_EYE4, (n, 3, 4, 4))))
    M = _normalize_m00(M)

    # rotate the reflection-plane frames into the implicit bases
    # (all vectors in the local shading frame; channel dim broadcast)
    a_in, a_out = _plane_axes(h, wo_hat, wi_hat)
    M = mu.rotate_mueller_basis(
        M,
        -wo_hat[:, None, :], a_in[:, None, :],
        mu.stokes_basis(-wo_hat)[:, None, :],
        wi_hat[:, None, :], a_out[:, None, :],
        mu.stokes_basis(wi_hat)[:, None, :])
    is_spec = is_cond | is_diel
    M = jnp.where(is_spec[..., None, None, None], M,
                  jnp.broadcast_to(_EYE4, (n, 3, 4, 4)))
    return M, is_spec


def _element_mueller(p, t, si, d_prev):
    """World-frame Mueller matrix of the polarizer/retarder/circular
    delta elements (normalized by M00; forward = light-travel direction
    -d_prev; polarizer.cpp:120-147, retarder.cpp, circular.cpp)."""
    n = d_prev.shape[0]
    fwd = m.normalize(-d_prev)
    theta = jnp.deg2rad(p["extra"][:, 0])
    delta = jnp.deg2rad(p["extra"][:, 1])
    left = p["extra"][:, 2] > 0.5

    # tilted effective axes (Korger et al. 2013): element axes live in
    # the shading frame
    a_axis = jnp.sin(theta)[..., None] * si.sh_s \
        + jnp.cos(theta)[..., None] * si.sh_t
    eff_a = a_axis - jnp.sum(a_axis * fwd, -1, keepdims=True) * fwd
    degen = jnp.sum(eff_a * eff_a, -1) < 1e-12
    eff_a = jnp.where(degen[..., None],
                      mu.stokes_basis(fwd), m.normalize(eff_a))
    eff_t = jnp.cross(fwd, eff_a)

    M_pol = jnp.broadcast_to(mu.linear_polarizer(jnp.ones((n, 3))),
                             (n, 3, 4, 4))
    M_ret = mu.linear_retarder(jnp.broadcast_to(delta[:, None], (n, 3)))
    M_cir = jnp.where(left[:, None, None, None],
                      mu.left_circular_polarizer((n, 3)),
                      mu.right_circular_polarizer((n, 3)))
    M = jnp.where((t == D_POLARIZER)[..., None, None, None], M_pol,
                  jnp.where((t == D_RETARDER)[..., None, None, None],
                            M_ret, M_cir))
    M = _normalize_m00(M)
    Mw = mu.rotate_mueller_basis_collinear(
        M, fwd[:, None, :], eff_t[:, None, :],
        mu.stokes_basis(fwd)[:, None, :])
    is_elem = (t == D_POLARIZER) | (t == D_RETARDER) | (t == D_CIRCULAR)
    return Mw, is_elem


def _bounce_mueller(scene, si, wo_local, d_prev, trans_mask):
    """Full world-frame, M00-normalized Mueller factor of one surface
    interaction sampled/evaluated in direction wo_local."""
    p = _gather_params(scene, si)
    i = jnp.maximum(si.material_index, 0)
    t = scene.materials.mtype[i]
    n = wo_local.shape[0]

    M_spec, is_spec = _specular_mueller(p, t, si.wi, wo_local, trans_mask)

    # measured pBSDF Mueller tables (bsdfs/measured_polarized.py) share
    # the specular matrices' local implicit bases
    if scene.measured_pol:
        from ..bsdfs.measured_polarized import mp_mueller
        i_mp = scene.materials.child_a[i]
        for k, mb in enumerate(scene.measured_pol):
            mk = (t == D_MEASURED_POL) & (i_mp == k)
            M_k = mp_mueller(mb, si.wi, wo_local)
            M_spec = jnp.where(mk[..., None, None, None], M_k, M_spec)
        is_spec = is_spec | (t == D_MEASURED_POL)

    # local->world implicit-basis conversion for the specular matrices
    in_w = si.to_world(-wo_local)
    out_w = si.to_world(si.wi)
    in_cur = si.to_world(mu.stokes_basis(-wo_local))
    out_cur = si.to_world(mu.stokes_basis(si.wi))
    M_spec = mu.rotate_mueller_basis(
        M_spec,
        in_w[:, None, :], in_cur[:, None, :],
        mu.stokes_basis(in_w)[:, None, :],
        out_w[:, None, :], out_cur[:, None, :],
        mu.stokes_basis(out_w)[:, None, :])

    M_elem, is_elem = _element_mueller(p, t, si, d_prev)

    depol = jnp.broadcast_to(mu.depolarizer(jnp.ones((n, 3))), (n, 3, 4, 4))
    M = jnp.where(is_spec[..., None, None, None], M_spec,
                  jnp.where(is_elem[..., None, None, None], M_elem, depol))
    return M


def sample_stokes(scene, ray: Ray, sampler: Sampler, max_depth: int = 6,
                  rr_depth: int = 5, active=None):
    """Polarized radiance estimate; returns S0 as the RGB image and the
    full per-channel Stokes vectors as AOVs (stokes.cpp:95-116)."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    has_env = scene.emitters.env_index >= 0

    state = dict(
        o=ray.o, d=ray.d,
        M=jnp.tile(_EYE4, (n, 3, 1, 1)),
        thr=jnp.ones((n, 3)),
        S=jnp.zeros((n, 3, 4)),
        eta=jnp.ones((n,)),
        active=active,
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray.o,
        first_t=jnp.full((n,), jnp.inf),
        sampler=sampler,
    )

    def add_emission(s, mask, Le_w):
        """S += M @ (thr*Le, 0, 0, 0) — unpolarized emission picks the
        first column of the throughput Mueller matrix."""
        contrib = s["M"][..., :, 0] * (s["thr"] * Le_w)[..., None]
        return s["S"] + jnp.where(mask[..., None, None], contrib, 0.0)

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        ray_i = Ray.make(s["o"], s["d"])
        si = scene.ray_intersect(ray_i)
        active_i = s["active"]
        valid = si.is_valid
        s["first_t"] = jnp.where((it == 0) & valid, si.t, s["first_t"])

        if has_env:
            escaped = active_i & ~valid
            pdf_env = scene.pdf_environment_direction(s["d"])
            w_mis = jnp.where(s["prev_delta"], 1.0,
                              mis_weight(s["prev_pdf"], pdf_env))
            Lenv = scene.eval_environment(s["d"])
            s["S"] = add_emission(s, escaped, Lenv * w_mis[..., None])

        hit_act = active_i & valid
        Le = scene.eval_emitter(si, hit_act)
        pdf_nee = scene.pdf_emitter_hit(s["prev_p"], si)
        w_mis = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee))
        s["S"] = add_emission(s, hit_act, Le * w_mis[..., None])

        active_i = hit_act
        active_next = active_i & (it + 1 < max_depth)

        # ---- NEE with a polarized bounce factor
        u_nee, smp = smp.next_2d()
        ds, spec = scene.sample_emitter_direction(si, u_nee)
        wo_nee = si.to_local(ds.d)
        f_nee, pdf_b = bsdf_eval_pdf(scene, si, wo_nee)
        w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        smooth = ~bsdf_flags_delta(scene, si)
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        M_nee = _bounce_mueller(scene, si, wo_nee, s["d"],
                                jnp.zeros((n,), bool))
        MM = s["M"] @ M_nee
        e_nee = s["thr"] * spec * f_nee * w_em[..., None]
        s["S"] = s["S"] + jnp.where(nee_ok[..., None, None],
                                    MM[..., :, 0] * e_nee[..., None], 0.0)

        # ---- BSDF sampling
        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        d_new = si.to_world(bs.wo)
        ray_new = si.spawn_ray(d_new)
        M_b = _bounce_mueller(scene, si, bs.wo, s["d"],
                              bs.sampled_transmission)
        thr = s["thr"] * bs.weight
        active_next = active_next & (bs.pdf > 0.0) \
            & (jnp.max(jnp.abs(thr), axis=-1) > 0.0)

        u_rr, smp = smp.next_1d()
        eta_n = s["eta"] * bs.eta
        thr_max = jnp.max(jax.lax.stop_gradient(thr), -1) * eta_n * eta_n
        q = jnp.minimum(thr_max, 0.95)
        do_rr = it + 1 >= rr_depth
        survive = ~do_rr | (u_rr < q)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / jnp.maximum(jax.lax.stop_gradient(q),
                                          1e-8)[..., None], thr)
        active_next = active_next & survive

        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["M"] = jnp.where(active_next[..., None, None, None],
                           s["M"] @ M_b, s["M"])
        s["thr"] = jnp.where(active_next[..., None], thr, s["thr"])
        s["eta"] = eta_n
        s["prev_pdf"] = bs.pdf
        s["prev_delta"] = bs.sampled_delta
        s["prev_p"] = si.p
        s["active"] = active_next
        s["sampler"] = smp
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    S = state["S"]

    # final rotation into the sensor frame (stokes.cpp:100-110): align
    # the implicit basis of -ray.d with cross(ray.d, sensor-vertical)
    tw = scene.sensor.to_world[0]
    vertical = m.normalize(tw[:3, 1])[None, :]
    fwd = -ray.d
    tgt = jnp.cross(ray.d, jnp.broadcast_to(vertical, ray.d.shape))
    degen = jnp.sum(tgt * tgt, -1) < 1e-12
    tgt = jnp.where(degen[..., None], mu.stokes_basis(fwd),
                    m.normalize(tgt))
    R = mu.rotate_stokes_basis(fwd[:, None, :],
                               mu.stokes_basis(fwd)[:, None, :],
                               tgt[:, None, :])
    S = (R @ S[..., None])[..., 0]

    aovs = {f"S{i}": S[..., i] for i in range(4)}
    aovs["depth"] = state["first_t"]
    return S[..., 0], jnp.isfinite(state["first_t"]), aovs, state["sampler"]


register_integrator("stokes")(sample_stokes)


def render_stokes(scene, spp: int = 16, seed: int = 0, max_depth: int = 6,
                  rr_depth: int = 5):
    """Render the four Stokes-component images -> (H, W, 3, 4)
    (the stokes plugin's S0..S3 AOV layout, stokes.cpp:116-121)."""
    import functools

    from ..film import film_develop, film_prepare, film_put_coalesced
    from .api import sample_rays

    W, H = scene.sensor.film_resolution

    @functools.partial(jax.jit, static_argnames=("spp_pass", "max_depth",
                                                 "rr_depth"))
    def one_pass(scene, accs, seed, spp_pass, max_depth, rr_depth):
        n = W * H * spp_pass
        smp = Sampler.seed(seed, n)
        ray, weight, pos, view, smp = sample_rays(scene, smp)
        _, _, aovs, smp = sample_stokes(scene, ray, smp, max_depth,
                                        rr_depth)
        jitter = pos - jnp.floor(pos)
        outs = []
        for i in range(4):
            outs.append(film_put_coalesced(
                scene.film, accs[i], jitter, aovs[f"S{i}"] * weight,
                spp_pass))
        return outs

    accs = [film_prepare(scene.film) for _ in range(4)]
    spp_pass = max(1, min(spp, (1 << 20) // max(W * H, 1)))
    done = 0
    i = 0
    while done < spp:
        sp = min(spp_pass, spp - done)
        accs = one_pass(scene, accs, jnp.uint32(seed + i), sp, max_depth,
                        rr_depth)
        done += sp
        i += 1
    return jnp.stack([film_develop(a) for a in accs], -1)
