"""Secondary integrators: direct, depth, AOV, moment.

Equivalents of src/integrators/{direct.cpp (236 LoC), depth.cpp,
aov.cpp (569), moment.cpp (148)}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..film import film_develop, film_prepare, film_put_coalesced
from ..records import Ray
from . import path as path_mod
from .api import register_integrator, sample_rays

mis_weight = path_mod.mis_weight


def direct_sample(scene, ray: Ray, sampler: Sampler, max_depth: int = 2,
                  rr_depth: int = 0, emitter_samples: int = 1,
                  bsdf_samples: int = 1, active=None):
    """Direct illumination with configurable sample counts + MIS
    (direct.cpp ``MIDirectIntegrator::sample``).

    MIS balance accounts for the sample counts: an emitter sample is
    weighted against ``bsdf_samples`` BSDF samples and vice versa
    (direct.cpp m_frac_lum / m_frac_bsdf weighting).
    """
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    has_env = scene.emitters.env_index >= 0

    si = scene.ray_intersect(ray)
    valid = si.is_valid
    L = scene.eval_emitter(si, active & valid)
    if has_env:
        L = L + jnp.where((active & ~valid)[..., None],
                          scene.eval_environment(ray.d), 0.0)
    act = active & valid
    smooth = ~bsdf_flags_delta(scene, si)

    fE = float(emitter_samples)
    fB = float(bsdf_samples)

    for _ in range(emitter_samples):
        u, sampler = sampler.next_2d()
        ds, spec = scene.sample_emitter_direction(si, u)
        wo = si.to_local(ds.d)
        f, pdf_b = bsdf_eval_pdf(scene, si, wo)
        w = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf * fE, pdf_b * fB))
        ok = act & smooth & (ds.pdf > 0.0)
        L = L + jnp.where(ok[..., None], spec * f * w[..., None], 0.0) / fE

    for _ in range(bsdf_samples):
        u1, sampler = sampler.next_1d()
        u2, sampler = sampler.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        ray2 = si.spawn_ray(si.to_world(bs.wo))
        si2 = scene.ray_intersect(ray2)
        Le2 = scene.eval_emitter(si2, act & si2.is_valid)
        pdf_nee = scene.pdf_emitter_hit(si.p, si2)
        w = jnp.where(bs.sampled_delta, 1.0,
                      mis_weight(bs.pdf * fB, pdf_nee * fE))
        contrib = jnp.where((act & (bs.pdf > 0))[..., None],
                            bs.weight * Le2 * w[..., None], 0.0)
        if has_env:
            pdf_env = scene.pdf_environment_direction(ray2.d)
            w_env = jnp.where(bs.sampled_delta, 1.0,
                              mis_weight(bs.pdf * fB, pdf_env * fE))
            Lenv = scene.eval_environment(ray2.d)
            contrib = contrib + jnp.where(
                (act & ~si2.is_valid & (bs.pdf > 0))[..., None],
                bs.weight * Lenv * w_env[..., None], 0.0)
        L = L + contrib / fB

    aovs = dict(depth=jnp.where(valid, si.t, jnp.inf))
    return L, valid, aovs, sampler


register_integrator("direct")(direct_sample)


def depth_sample(scene, ray, sampler, max_depth=1, rr_depth=0, active=None):
    """Distance to first hit as RGB (depth.cpp)."""
    si = scene.ray_intersect(ray)
    t = jnp.where(si.is_valid, si.t, 0.0)
    return jnp.repeat(t[..., None], 3, -1), si.is_valid, {}, sampler


register_integrator("depth")(depth_sample)


# ---------------------------------------------------------------------------
# AOV rendering (aov.cpp): arbitrary output variables per pixel
# ---------------------------------------------------------------------------

_AOV_FNS = {
    "depth": lambda scene, ray, si: jnp.where(si.is_valid, si.t, 0.0)[..., None],
    "position": lambda scene, ray, si: si.p,
    "uv": lambda scene, ray, si: si.uv,
    "geo_normal": lambda scene, ray, si: si.n,
    "sh_normal": lambda scene, ray, si: si.sh_n,
    "prim_index": lambda scene, ray, si: si.prim_index[..., None].astype(jnp.float32),
    "shape_index": lambda scene, ray, si: si.shape_index[..., None].astype(jnp.float32),
    "albedo": None,  # handled specially (texture eval)
}


def render_aovs(scene, aovs=("depth", "sh_normal", "albedo"), spp: int = 4,
                seed: int = 0):
    """Render auxiliary channels (aov.cpp) -> dict name -> (H, W, C)."""
    W, H = scene.sensor.film_resolution

    @functools.partial(jax.jit, static_argnames=("names", "spp_pass"))
    def one_pass(scene, seed, names, spp_pass):
        n = W * H * spp_pass
        sampler = Sampler.seed(seed, n)
        ray, weight, pos, view, sampler = sample_rays(scene, sampler)
        si = scene.ray_intersect(ray)
        out = {}
        for name in names:
            if name == "albedo":
                from ..bsdfs.registry import _gather_params
                p = _gather_params(scene, si)
                v = jnp.where(si.is_valid[..., None], p["albedo"], 0.0)
            else:
                v = _AOV_FNS[name](scene, ray, si)
                v = jnp.where(si.is_valid[..., None], v, 0.0)
            c = v.shape[-1]
            acc = jnp.zeros((H, W, c + 1))
            jitter = pos - jnp.floor(pos)
            acc = film_put_coalesced(scene.film.replace(ftype=0, radius=0.5),
                                     acc, jitter, v, spp_pass)
            out[name] = film_develop(acc)
        return out

    return one_pass(scene, jnp.uint32(seed), tuple(aovs), spp)


def render_moment(scene, spp: int = 16, seed: int = 0, integrator="path",
                  max_depth: int = 6, rr_depth: int = 5):
    """Mean + second-moment images (moment.cpp): per-sample squared
    radiance accumulated alongside — feeds variance-driven adaptive spp
    (the AMVPT budget controller input).

    Returns (mean (H,W,3), moment2 (H,W,3))."""
    from .api import _INTEGRATORS
    W, H = scene.sensor.film_resolution

    @functools.partial(jax.jit, static_argnames=("spp_pass",))
    def one_pass(scene, seed, spp_pass):
        n = W * H * spp_pass
        sampler = Sampler.seed(seed, n)
        ray, weight, pos, view, sampler = sample_rays(scene, sampler)
        L, valid, aovs, sampler = _INTEGRATORS[integrator](
            scene, ray, sampler, max_depth=max_depth, rr_depth=rr_depth)
        L = L * weight
        jitter = pos - jnp.floor(pos)
        film_box = scene.film.replace(ftype=0, radius=0.5)
        acc1 = film_put_coalesced(film_box, jnp.zeros((H, W, 4)), jitter, L,
                                  spp_pass)
        acc2 = film_put_coalesced(film_box, jnp.zeros((H, W, 4)), jitter,
                                  L * L, spp_pass)
        return film_develop(acc1), film_develop(acc2)

    return one_pass(scene, jnp.uint32(seed), spp)
