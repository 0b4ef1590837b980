"""Adjoint particle tracer: light paths connected to the sensor.

Equivalent of src/integrators/ptracer.cpp (413 LoC, AdjointIntegrator
base integrator.h:505): emit particles from the light sources
(``sample_emitter_ray`` ptracer.cpp:186), random-walk them through the
scene, and at every vertex project to the camera (``connect_sensor``
ptracer.cpp:322) via the fork's ``sample_surface`` importance query,
splatting filtered contributions into the film.

Film accounting: contributions are *additive* (splat weight 0); the
final image divides by the number of particles per pixel area — the
AdjointIntegrator normalization (integrator.h:505 ff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import warp
from ...core.rng import Sampler
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..film import film_prepare, film_put
from ..records import Ray, SurfaceInteraction
from ..scene import E_AREA, E_POINT, E_SPOT


def _sample_emitter_ray(scene, sampler: Sampler, n):
    """Pick an emitter + emit a ray (Scene::sample_emitter_ray).

    Supports area emitters (cosine-hemisphere emission) and point
    lights (uniform sphere).  Returns (ray, beta (N,3), p0, n0,
    direct_val (N,3) [value for the t=0 sensor connection], sampler).
    """
    em = scene.emitters
    g = scene.geom
    F = g.faces.shape[0]

    u_sel, sampler = sampler.next_1d()
    entry, u_re = em.ls_distr.sample_reuse(u_sel)
    e_id = em.ls_emitter[entry]
    prim = em.ls_prim[entry]
    etype = em.e_type[e_id]
    entry_p = em.ls_distr.pmf_normalized(entry)

    u_pos, sampler = sampler.next_2d()
    u_dir, sampler = sampler.next_2d()

    p0 = jnp.zeros((n, 3))
    n0 = jnp.zeros((n, 3))
    beta = jnp.zeros((n, 3))
    d0 = jnp.zeros((n, 3))
    direct_val = jnp.zeros((n, 3))

    is_area = (etype == E_AREA)
    if F > 0 or g.sph_center.shape[0] > 0:
        # area emitter: uniform point on the prim, cosine direction
        is_tri = (prim >= 0) & (prim < F)
        if F > 0:
            tri = jnp.clip(prim, 0, F - 1)
            f = g.faces[tri]
            pa, pb, pc = g.verts[f[:, 0]], g.verts[f[:, 1]], g.verts[f[:, 2]]
            b = warp.square_to_uniform_triangle(jnp.stack([u_re, u_pos[..., 0]], -1))
            p_t = (1 - b[..., 0:1] - b[..., 1:2]) * pa + b[..., 0:1] * pb \
                + b[..., 1:2] * pc
            n_t = m.normalize(jnp.cross(pb - pa, pc - pa))
        else:
            p_t = jnp.zeros((n, 3)); n_t = jnp.zeros((n, 3))
        S = g.sph_center.shape[0]
        if S > 0:
            sph = jnp.clip(prim - F, 0, S - 1)
            dsp = warp.square_to_uniform_sphere(
                jnp.stack([u_re, u_pos[..., 0]], -1))
            p_s = g.sph_center[sph] + dsp * g.sph_radius[sph][..., None]
            p_t = jnp.where(is_tri[..., None], p_t, p_s)
            n_t = jnp.where(is_tri[..., None], n_t, dsp)
        pdf_area = em.prim_pdf_area[jnp.maximum(prim, 0)]
        # cosine-weighted direction in the emitter frame
        s_f, t_f = m.coordinate_system(n_t)
        wo_local = warp.square_to_cosine_hemisphere(u_dir)
        d_area = m.frame_to_world(n_t, s_f, t_f, wo_local)
        Le = em.radiance[e_id]
        beta_area = Le * m.safe_div(jnp.pi, pdf_area)[..., None]
        direct_area = Le / jnp.maximum(pdf_area, 1e-20)[..., None]
        sel = is_area
        p0 = jnp.where(sel[..., None], p_t, p0)
        n0 = jnp.where(sel[..., None], n_t, n0)
        d0 = jnp.where(sel[..., None], d_area, d0)
        beta = jnp.where(sel[..., None], beta_area, beta)
        direct_val = jnp.where(sel[..., None], direct_area, direct_val)

    # point / spot: uniform sphere emission
    is_pt = (etype == E_POINT) | (etype == E_SPOT)
    p_e = em.to_world[e_id][:, :3, 3]
    d_pt = warp.square_to_uniform_sphere(u_dir)
    I = em.radiance[e_id]
    beta_pt = I * (4.0 * jnp.pi) / jnp.maximum(entry_p, 1e-20)[..., None]
    direct_pt = I / jnp.maximum(entry_p, 1e-20)[..., None]
    p0 = jnp.where(is_pt[..., None], p_e, p0)
    n0 = jnp.where(is_pt[..., None], d_pt, n0)  # fake normal toward dir
    d0 = jnp.where(is_pt[..., None], d_pt, d0)
    beta = jnp.where(is_pt[..., None], beta_pt, beta)
    direct_val = jnp.where(is_pt[..., None], direct_pt, direct_val)

    eps = m.RAY_EPS * jnp.maximum(1.0, jnp.max(jnp.abs(p0), -1, keepdims=True))
    ray = Ray.make(p0 + m.mulsign(n0 * eps, m.dot(n0, d0)[..., None]), d0)
    valid = is_area | is_pt
    beta = jnp.where(valid[..., None], beta, 0.0)
    return ray, beta, p0, n0, direct_val, is_pt, sampler


def _connect(scene, p, n_vec, f_over_cos, u_lens, active):
    """Project a vertex to view 0 and return (film uv pos, value).

    value = beta_factor * f_raw * Jp (ptracer.cpp connect_sensor: the
    importance W = film pdf / dist^2 combined with the surface cosine).
    """
    sensor = scene.sensor
    view = jnp.zeros(p.shape[:-1], jnp.int32)
    surf = sensor.sample_surface(view, p, n_vec, u_lens)
    # shadow ray to the camera
    si_fake = SurfaceInteraction(
        t=jnp.ones(p.shape[:-1]), p=p, n=n_vec, sh_n=n_vec,
        sh_s=n_vec, sh_t=n_vec, uv=jnp.zeros(p.shape[:-1] + (2,)),
        wi=n_vec, prim_index=jnp.zeros(p.shape[:-1], jnp.int32),
        shape_index=jnp.zeros(p.shape[:-1], jnp.int32),
        material_index=jnp.zeros(p.shape[:-1], jnp.int32),
        emitter_index=jnp.full(p.shape[:-1], -1, jnp.int32))
    cam_ray = si_fake.spawn_ray_to(surf["p"])
    occluded = scene.ray_test(cam_ray)
    ok = active & surf["visible"] & ~occluded
    W, H = sensor.film_resolution
    pos = surf["uv"] * jnp.array([W, H], jnp.float32)
    cos_surf = jnp.abs(m.dot(surf["d"], n_vec))
    # Jp = cos_surf * pdf_film / dist^2; value wants f_raw * pdf/dist^2
    val = f_over_cos * surf["Jp"][..., None]
    return pos, jnp.where(ok[..., None], val, 0.0), ok


@functools.partial(jax.jit, static_argnames=("n_paths", "max_depth",
                                             "rr_depth"),
                   donate_argnames=("acc",))
def ptracer_pass(scene, acc, seed, n_paths: int, max_depth: int = 6,
                 rr_depth: int = 5):
    sampler = Sampler.seed(seed, n_paths)
    n = n_paths
    ray, beta, p0, n0, direct_val, is_pt, sampler = _sample_emitter_ray(
        scene, sampler, n)

    # t=0: connect the emitter vertex itself (visible light sources)
    u_lens, sampler = sampler.next_2d()
    # value for area: Le/pdf * cos via Jp (normal matters); for point:
    # I/pdf with no cosine -> pass n0 aligned toward camera
    pos0, val0, ok0 = _connect(scene, p0, n0,
                               direct_val / jnp.pi / 1.0, u_lens,
                               jnp.max(jnp.abs(beta), -1) > 0)
    # area emitters emit Le (radiance), the connection carries cos via
    # Jp; the pi factor cancels the cosine-hemisphere normalization.
    val0 = jnp.where(is_pt[..., None], direct_val, val0 * jnp.pi)
    # point lights: value = I * pdf_film/dist^2 -> Jp with cos=1
    # (handled by n0 = emission dir; approximation averages fine)
    acc = film_put(scene.film, acc, pos0, val0, active=ok0 & ~is_pt,
                   normalize=True)

    state = dict(o=ray.o, d=ray.d, beta=beta,
                 active=jnp.max(jnp.abs(beta), -1) > 0,
                 sampler=sampler, acc=acc)

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        acc = s.pop("acc")
        si = scene.ray_intersect(Ray.make(s["o"], s["d"]))
        act = s["active"] & si.is_valid

        # connect to sensor through the BSDF
        u_lens, smp = smp.next_2d()
        view = jnp.zeros((n,), jnp.int32)
        surf = scene.sensor.sample_surface(view, si.p, si.sh_n, u_lens)
        wo_cam = si.to_local(surf["d"])
        f_cam, _ = bsdf_eval_pdf(scene, si, wo_cam)
        cos_o = jnp.abs(m.cos_theta(wo_cam))
        f_raw = m.safe_div(f_cam, jnp.maximum(cos_o, 1e-6)[..., None])
        cam_ray = si.spawn_ray_to(surf["p"])
        occluded = scene.ray_test(cam_ray)
        ok = act & surf["visible"] & ~occluded
        W, H = scene.sensor.film_resolution
        pos = surf["uv"] * jnp.array([W, H], jnp.float32)
        val = s["beta"] * f_raw * surf["Jp"][..., None]
        acc = film_put(scene.film, acc, pos, val, active=ok,
                       normalize=True)

        # continue the walk
        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        ray_new = si.spawn_ray(si.to_world(bs.wo))
        beta = s["beta"] * bs.weight
        act_next = act & (bs.pdf > 0) & (it + 2 < max_depth) \
            & (jnp.max(jnp.abs(beta), -1) > 0)
        u_rr, smp = smp.next_1d()
        q = jnp.minimum(jnp.max(beta, -1), 0.95)
        do_rr = it + 1 >= rr_depth
        survive = ~do_rr | (u_rr < q)
        beta = jnp.where((do_rr & survive)[..., None],
                         beta / jnp.maximum(q, 1e-8)[..., None], beta)
        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["beta"] = beta
        s["active"] = act_next & survive
        s["sampler"] = smp
        s["acc"] = acc
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max(max_depth - 1, 0)))
    return state["acc"]


def render_ptracer(scene, spp: int = 16, seed: int = 0, max_depth: int = 6,
                   rr_depth: int = 5):
    """Particle-traced image; spp sets n_paths = W*H*spp
    (AdjointIntegrator::render normalization)."""
    W, H = scene.sensor.film_resolution
    acc = film_prepare(scene.film)
    total_paths = 0
    per_pass = max(1, min(W * H * spp, 1 << 22))
    remaining = W * H * spp
    i = 0
    while remaining > 0:
        np_ = min(per_pass, remaining)
        acc = ptracer_pass(scene, acc, jnp.uint32(seed + i), np_, max_depth,
                           rr_depth)
        total_paths += np_
        remaining -= np_
        i += 1
    # additive normalization: each path's splat integrates importance
    # over the film; scale by (n_pixels / n_paths)
    img = acc[..., :3] * (W * H / float(total_paths))
    return img
