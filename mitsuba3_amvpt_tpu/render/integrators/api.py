"""Render driver: wavefront setup, pass splitting, film accumulation.

Equivalent of SamplingIntegrator::render (src/render/integrator.cpp:150-
330) + the AD layer's primal driver (src/python/python/ad/integrators/
common.py:46-110 render / :231-309 sample_rays / :311-368 prepare).

The wavefront is W*H*spp_per_pass lanes; spp is split into passes to
bound memory (reference spp_pass_lim, mvpath.h:127), with the jitted
pass function donating the film accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler, sample_tea_32
from ..film import film_develop, film_prepare, film_put, film_put_coalesced
from ..records import Ray
from . import path as path_mod

_INTEGRATORS = {}


def register_integrator(name):
    def deco(fn):
        _INTEGRATORS[name] = fn
        return fn
    return deco


register_integrator("path")(path_mod.sample)


def _sample_surface_sensor_rays(scene, sampler: Sampler, n):
    """Irradiancemeter ray generation (irradiancemeter.cpp:75-100):
    uniform position on the attached shape + cosine-weighted direction;
    the returned importance weight is pi (the cosine-pdf normalization,
    so the film estimates E = integral L cos dw over the surface)."""
    from ...core import warp
    g = scene.geom
    F = g.faces.shape[0]
    u_sel, sampler = sampler.next_1d()
    entry, u_re = scene.sensor_prim_distr.sample_reuse(u_sel)
    prim = scene.sensor_prims[entry]
    u_pos, sampler = sampler.next_2d()
    p = jnp.zeros((n, 3))
    nrm = jnp.zeros((n, 3))
    is_tri = prim < F
    if F > 0:
        tri = jnp.clip(prim, 0, F - 1)
        f = g.faces[tri]
        pa, pb, pc = g.verts[f[:, 0]], g.verts[f[:, 1]], g.verts[f[:, 2]]
        b = warp.square_to_uniform_triangle(
            jnp.stack([u_re, u_pos[..., 0]], -1))
        p_t = (1 - b[..., 0:1] - b[..., 1:2]) * pa + b[..., 0:1] * pb \
            + b[..., 1:2] * pc
        n_t = m.normalize(jnp.cross(pb - pa, pc - pa))
        p = jnp.where(is_tri[..., None], p_t, p)
        nrm = jnp.where(is_tri[..., None], n_t, nrm)
    S = g.sph_center.shape[0]
    if S > 0:
        sph = jnp.clip(prim - F, 0, S - 1)
        dsp = warp.square_to_uniform_sphere(
            jnp.stack([u_re, u_pos[..., 0]], -1))
        p_s = g.sph_center[sph] + dsp * g.sph_radius[sph][..., None]
        p = jnp.where(is_tri[..., None], p, p_s)
        nrm = jnp.where(is_tri[..., None], nrm, dsp)
    u_dir, sampler = sampler.next_2d()
    local = warp.square_to_cosine_hemisphere(u_dir)
    s_f, t_f = m.coordinate_system(nrm)
    d = m.frame_to_world(nrm, s_f, t_f, local)
    ray = Ray.make(p + d * 1e-4, d)
    weight = jnp.full((n, 3), jnp.pi)
    return ray, weight, sampler


def sample_rays(scene, sampler: Sampler):
    """Per-lane pixel decode + primary ray generation (common.py:231-309
    sample_rays; grid quilt decode grid.cpp:269-297)."""
    sensor = scene.sensor
    W, H = sensor.film_resolution
    n = sampler.key.shape[0]
    spp = n // (W * H)
    idx = jnp.arange(n)
    pixel = idx // jnp.maximum(spp, 1)
    px = (pixel % W).astype(jnp.float32)
    py = (pixel // W).astype(jnp.float32)
    u_pos, sampler = sampler.next_2d()
    pos = jnp.stack([px, py], -1) + u_pos
    if scene.has_surface_sensor:
        ray, weight, sampler = _sample_surface_sensor_rays(scene, sampler, n)
        return ray, weight, pos, jnp.zeros((n,), jnp.int32), sampler
    pos_uv = pos / jnp.array([W, H], jnp.float32)
    view, uv = sensor.quilt_decode(pos_uv)
    u_lens, sampler = sampler.next_2d()
    ray, weight = sensor.sample_ray(view, uv, u_lens)
    return ray, weight, pos, view, sampler


@functools.partial(jax.jit, static_argnames=("integrator", "max_depth",
                                             "rr_depth", "spp_pass",
                                             "sampler_mode", "spp_total"),
                   donate_argnames=("acc",))
def render_pass(scene, acc, seed, spp_pass: int, integrator: str = "path",
                max_depth: int = 6, rr_depth: int = 5,
                sampler_mode: str = "independent", sample_base=0,
                spp_total: int = None):
    """One pass of spp_pass samples/pixel, accumulated into `acc`."""
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    if sampler_mode == "independent":
        sampler = Sampler.seed(seed, n)
    else:
        idx = jnp.arange(n)
        pixel = idx // spp_pass
        sample = idx % spp_pass + sample_base
        sampler = Sampler.seed_stratified(seed, pixel, sample,
                                          spp_total or spp_pass,
                                          mode=sampler_mode)
    from ...utils.profiler import ScopedPhase
    with ScopedPhase("SampleRays"):   # profiler.h CreateSurfaceInteraction
        ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    sample_fn = _INTEGRATORS[integrator]
    with ScopedPhase("SamplingIntegratorSample"):
        L, valid, aovs, sampler = sample_fn(scene, ray, sampler,
                                            max_depth=max_depth,
                                            rr_depth=rr_depth)
    # lanes are pixel-major (spp consecutive) -> scatter-free splat
    with ScopedPhase("ImageBlockPut"):
        jitter = pos - jnp.floor(pos)
        return film_put_coalesced(scene.film, acc, jitter, L * weight,
                                  spp_pass)


@functools.partial(jax.jit, static_argnames=("integrator", "max_depth",
                                             "rr_depth", "spp_pass",
                                             "n_passes", "sampler_mode",
                                             "spp_total", "develop",
                                             "compensate"),
                   donate_argnames=("acc",))
def render_passes(scene, acc, seed, n_passes: int, spp_pass: int,
                  integrator: str = "path", max_depth: int = 6,
                  rr_depth: int = 5, sampler_mode: str = "independent",
                  spp_total: int = None, develop: bool = True,
                  compensate: bool = False):
    """n_passes equal passes + optional develop fused into ONE XLA
    program (one device dispatch).  The per-dispatch latency of a
    remote-attached TPU (~25 ms on the axon relay) otherwise multiplies
    with the pass count; lax.fori_loop also compiles the pass body once
    instead of once per pass.  Seeds replicate the Python loop in
    ``render``: pass i uses seed + spp_pass*i + done, done = spp_pass*i
    (mvpath.cpp:227 discipline).

    ``compensate=True`` Kahan-accumulates the per-pass deltas
    (reference ImageBlock ``compensate``, imageblock.h:108-114): at
    high pass counts fp32 accumulation loses low-order bits."""
    from ..film import film_develop, kahan_add

    def one_pass(i, acc_i):
        done = spp_pass * i
        pass_seed = jnp.uint32(seed + spp_pass * i + done) \
            if sampler_mode == "independent" else jnp.uint32(seed)
        return render_pass.__wrapped__(
            scene, acc_i, pass_seed, spp_pass, integrator, max_depth,
            rr_depth, sampler_mode=sampler_mode,
            sample_base=jnp.uint32(done),
            spp_total=spp_total or spp_pass * n_passes)

    if compensate:
        def body(i, carry):
            acc_c, comp = carry
            delta = one_pass(i, jnp.zeros_like(acc_c))
            return kahan_add(acc_c, comp, delta)

        acc, _ = jax.lax.fori_loop(0, n_passes, body,
                                   (acc, jnp.zeros_like(acc)))
    else:
        acc = jax.lax.fori_loop(0, n_passes, one_pass, acc)
    return film_develop.__wrapped__(acc) if develop else acc


def render(scene, spp: int = 16, seed: int = 0, integrator: str = "path",
           max_depth: int = 6, rr_depth: int = 5, spp_per_pass: int = None,
           sampler: str = "independent", raw: bool = False,
           compensate: bool = False):
    """Full render -> (H, W, 3) image (mi.render equivalent, primal).

    Pass seeds follow the reference discipline: per-pass seed =
    spp_per_pass * i + seed (mvpath.cpp:227), decorrelated by TEA inside
    Sampler.seed.  ``sampler`` selects the sample pattern
    (independent / stratified / multijitter / ldsampler); stratified
    modes seed per pixel with strata spanning the full spp.
    """
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        # bound wavefront to ~2^22 lanes per pass; the HBM-streaming
        # tracer for large scenes needs a tighter cap (its per-tile DMA
        # buffers scale with the wavefront — 1M lanes x 1M tris hits a
        # TPU FAILED_PRECONDITION, 2^18 lanes measured safe)
        cap = (1 << 18) if (scene.geom.accel_mode == "tiled"
                            and scene.geom.faces.shape[0] > 200_000) \
            else (1 << 22)
        spp_per_pass = max(1, min(spp, cap // max(W * H, 1)))
    acc = film_prepare(scene.film)
    n_full = spp // spp_per_pass
    if n_full > 0:
        # all equal-sized passes + develop fused into ONE dispatch
        acc = render_passes(scene, acc, jnp.uint32(seed), n_full,
                            spp_per_pass, integrator, max_depth, rr_depth,
                            sampler_mode=sampler, spp_total=spp,
                            develop=False, compensate=compensate)
    done = n_full * spp_per_pass
    if done < spp:   # remainder pass (different static wavefront size)
        sp = spp - done
        pass_seed = jnp.uint32(seed if sampler != "independent"
                               else seed + sp * n_full + done)
        acc = render_pass(scene, acc, pass_seed, sp, integrator, max_depth,
                          rr_depth, sampler_mode=sampler,
                          sample_base=jnp.uint32(done), spp_total=spp)
    return acc if raw else film_develop(acc)
