"""Spectral rendering mode: K-wavelength Monte Carlo transport.

The reference's ``*_spectral`` variants carry ``Spectrum`` = 4 sampled
wavelengths per lane (resources/mitsuba.conf variants; spectrum.h).
Here spectral mode is a *runtime* integrator: each lane samples K
wavelengths (importance-sampled by the CIE-Y curve, spectrum.py), every
RGB material/emitter value is upsampled to those wavelengths through a
smooth partition-of-unity basis (the role of the rgb2spec LUT,
src/render/srgb.cpp srgb_model_fetch — the polynomial LUT itself is a
binary resource; the analytic basis below is its drop-in stand-in, with
the same linearity property f_spec(l) = B(l) . f_rgb), and the sensor
converts the spectral estimate back through the CIE 1931 observer.

Not supported yet (needs wavelength-aware BSDF internals): dispersion
(per-wavelength IOR).  Documented gap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core import spectrum as spec
from ...core.rng import Sampler
from ..bsdfs import bsdf_eval_pdf, bsdf_flags_delta, bsdf_sample
from ..film import film_develop, film_prepare, film_put_coalesced
from ..records import Ray
from . import path as path_mod
from .api import sample_rays

mis_weight = path_mod.mis_weight

K_WAVELENGTHS = 4


def rgb_basis(wl):
    """Smooth partition-of-unity RGB spectral basis: (..., 3) weights at
    wavelength wl (nm).  sum_c B_c == 1, so white (1,1,1) upsamples to a
    flat unit spectrum (the key reflectance property of rgb2spec)."""
    r = jax.nn.sigmoid((wl - 580.0) / 12.0)
    b = jax.nn.sigmoid((505.0 - wl) / 12.0)
    g = jnp.clip(1.0 - r - b, 0.0, 1.0)
    total = r + g + b
    return jnp.stack([r, g, b], -1) / total[..., None]


import functools as _functools


@_functools.lru_cache(None)
def _basis_correction():
    """3x3 matrix A with round_trip(A @ rgb) == rgb exactly.

    The sigmoid partition-of-unity basis is linear in rgb, so the full
    round trip rgb -> spectrum -> CIE-integrate -> sRGB is a fixed
    matrix M; precomposing with A = M^-1 makes the upsampling
    color-exact for every in-gamut color (the role of the reference's
    rgb2spec coefficient fit, src/render/srgb.cpp:14-32 — measured
    error before this correction: mean 0.08, max 0.27 per channel).
    Saturated colors whose corrected spectra would dip negative are
    clamped at zero in ``upsample`` and keep a small residual error
    (quantified in tests/test_spectral_roundtrip.py)."""
    # pure numpy (the first call may happen inside a jit trace, where
    # jnp intermediates would turn into tracers)
    import numpy as np
    wl = np.linspace(380.0, 720.0, 256)

    def g(x, mu, s1, s2):
        t = (x - mu) * np.where(x < mu, 1.0 / s1, 1.0 / s2)
        return np.exp(-0.5 * t * t)

    obs = np.stack([
        (1.056 * g(wl, 599.8, 37.9, 31.0)
         + 0.362 * g(wl, 442.0, 16.0, 26.7)
         - 0.065 * g(wl, 501.1, 20.4, 26.2)),
        (0.821 * g(wl, 568.8, 46.9, 40.5)
         + 0.286 * g(wl, 530.9, 16.3, 31.1)),
        (1.217 * g(wl, 437.0, 11.8, 36.0)
         + 0.681 * g(wl, 459.0, 26.0, 13.8))], -1)   # cie1931_xyz
    sig = lambda t: 1.0 / (1.0 + np.exp(-t))          # noqa: E731
    r = sig((wl - 580.0) / 12.0)
    b = sig((505.0 - wl) / 12.0)
    gg = np.clip(1.0 - r - b, 0.0, 1.0)
    B = np.stack([r, gg, b], -1)
    B = B / B.sum(-1, keepdims=True)                  # rgb_basis
    XYZ2RGB = np.array([[3.240479, -1.537150, -0.498535],
                        [-0.969256, 1.875991, 0.041556],
                        [0.055648, -0.204043, 1.057311]])
    # mirror spectral_to_rgb's exact normalization: Y-normalize by the
    # sampled (E) white, then diagonal von-Kries E -> D65
    white = obs.mean(0)
    white_n = white / white[1]
    vk = np.array([0.95047, 1.0, 1.08883]) / white_n
    M = np.zeros((3, 3))
    for j in range(3):
        xyz = (B[:, j:j + 1] * obs).mean(0) / white[1] * vk
        M[:, j] = XYZ2RGB @ xyz
    # return NUMPY (not jnp): this function is lru_cached, and a
    # jnp.asarray executed during a jit trace would cache a tracer
    # that leaks into later traces (UnexpectedTracerError, test-order
    # dependent); the conversion happens at the use site instead
    return np.linalg.inv(M).astype(np.float32)


def upsample(rgb, basis):
    """(N, 3) rgb x (N, K, 3) basis -> (N, K) spectral values.

    rgb is pre-multiplied by the basis-correction matrix so the CIE
    round trip is exact (see _basis_correction); negative lobes of
    out-of-gamut corrected spectra are clamped."""
    rgb_c = rgb @ _basis_correction().T
    return jnp.maximum(jnp.einsum("nc,nkc->nk", rgb_c, basis), 0.0)


def spectral_to_rgb(L, wl, pdf):
    """MC spectral estimate -> linear sRGB, normalized so a flat unit
    spectrum maps to (1,1,1) (E-illuminant white adaptation)."""
    obs = spec.cie1931_xyz(wl)                      # (N, K, 3)
    inv = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    xyz = jnp.mean(L[..., None] * obs * inv[..., None], axis=-2)
    white = jnp.mean(obs * inv[..., None], axis=-2)
    xyz = xyz / jnp.maximum(white[..., 1:2], 1e-9)
    white_n = white / jnp.maximum(white[..., 1:2], 1e-9)
    # diagonal von-Kries in XYZ: sampled (E-illuminant) white -> D65,
    # so a flat unit spectrum lands exactly on sRGB white
    d65_white = jnp.array([0.95047, 1.0, 1.08883])
    xyz = xyz * jnp.where(white_n > 1e-6,
                          d65_white / jnp.maximum(white_n, 1e-6), 0.0)
    return spec.xyz_to_srgb(xyz)


def sample_spectral(scene, ray: Ray, sampler: Sampler, max_depth: int = 6,
                    rr_depth: int = 5, active=None, wavelengths=None,
                    raw_spectral: bool = False):
    """Spectral path.sample: (N, K) throughput over sampled wavelengths.

    Returns (L_rgb (N, 3), valid, aovs, sampler); with ``raw_spectral``
    the first element is ``(L (N, K), wl, wl_pdf)`` instead (used by the
    specfilm, which applies its own sensor response functions)."""
    n = ray.o.shape[0]
    if active is None:
        active = jnp.ones((n,), bool)
    has_env = scene.emitters.env_index >= 0

    if wavelengths is None:
        u_wl, sampler = sampler.next_1d()
        # K stratified wavelength samples/lane (spectrum.h sample_shifted)
        shifts = (jnp.arange(K_WAVELENGTHS) / K_WAVELENGTHS)[None, :]
        u_k = jnp.mod(u_wl[..., None] + shifts, 1.0)
        wl, wl_pdf = spec.sample_visible_wavelength(u_k)  # (N, K)
    else:
        wl, wl_pdf = wavelengths
    basis = rgb_basis(wl)                                # (N, K, 3)

    def up(rgb):
        return upsample(rgb, basis)

    K = wl.shape[-1]
    state = dict(
        o=ray.o, d=ray.d,
        throughput=jnp.ones((n, K)),
        L=jnp.zeros((n, K)),
        eta=jnp.ones((n,)),
        active=active,
        prev_pdf=jnp.zeros((n,)),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray.o,
        first_t=jnp.full((n,), jnp.inf),
        sampler=sampler,
    )

    def bounce(state, it):
        s = dict(state)
        smp = s.pop("sampler")
        si = scene.ray_intersect(Ray.make(s["o"], s["d"]))
        active_i = s["active"]
        valid = si.is_valid
        s["first_t"] = jnp.where((it == 0) & valid, si.t, s["first_t"])

        if has_env:
            escaped = active_i & ~valid
            pdf_env = scene.pdf_environment_direction(s["d"])
            w_mis = jnp.where(s["prev_delta"], 1.0,
                              mis_weight(s["prev_pdf"], pdf_env))
            Lenv = up(scene.eval_environment(s["d"]))
            s["L"] = s["L"] + jnp.where(
                escaped[..., None],
                s["throughput"] * Lenv * w_mis[..., None], 0.0)

        hit_act = active_i & valid
        Le = up(scene.eval_emitter(si, hit_act))
        pdf_nee = scene.pdf_emitter_hit(s["prev_p"], si)
        w_mis = jnp.where(s["prev_delta"], 1.0,
                          mis_weight(s["prev_pdf"], pdf_nee))
        s["L"] = s["L"] + jnp.where(
            hit_act[..., None], s["throughput"] * Le * w_mis[..., None], 0.0)

        active_i = hit_act
        active_next = active_i & (it + 1 < max_depth)

        u_nee, smp = smp.next_2d()
        ds, spec_rgb = scene.sample_emitter_direction(si, u_nee)
        wo_nee = si.to_local(ds.d)
        f_nee, pdf_b = bsdf_eval_pdf(scene, si, wo_nee)
        w_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        smooth = ~bsdf_flags_delta(scene, si)
        nee_ok = active_next & smooth & (ds.pdf > 0.0)
        s["L"] = s["L"] + jnp.where(
            nee_ok[..., None],
            s["throughput"] * up(spec_rgb) * up(f_nee) * w_em[..., None],
            0.0)

        u1, smp = smp.next_1d()
        u2, smp = smp.next_2d()
        bs = bsdf_sample(scene, si, u1, u2)
        ray_new = si.spawn_ray(si.to_world(bs.wo))
        thr = s["throughput"] * up(bs.weight)
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

        s["o"] = ray_new.o
        s["d"] = ray_new.d
        s["throughput"] = jnp.where(active_next[..., None], thr,
                                    s["throughput"])
        s["eta"] = eta_n
        s["prev_pdf"] = bs.pdf
        s["prev_delta"] = bs.sampled_delta
        s["prev_p"] = si.p
        s["active"] = active_next & survive
        s["sampler"] = smp
        return s, None

    state, _ = jax.lax.scan(bounce, state, jnp.arange(max_depth))
    aovs = dict(depth=state["first_t"])
    valid = jnp.isfinite(state["first_t"])
    if raw_spectral:
        return (state["L"], wl, wl_pdf), valid, aovs, state["sampler"]
    L_rgb = spectral_to_rgb(state["L"], wl, wl_pdf)
    return L_rgb, valid, aovs, state["sampler"]


@functools.partial(jax.jit, static_argnames=("spp_pass", "max_depth",
                                             "rr_depth"),
                   donate_argnames=("acc",))
def spectral_pass(scene, acc, seed, spp_pass: int, max_depth: int = 6,
                  rr_depth: int = 5):
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    L, valid, aovs, sampler = sample_spectral(scene, ray, sampler,
                                              max_depth=max_depth,
                                              rr_depth=rr_depth)
    jitter = pos - jnp.floor(pos)
    return film_put_coalesced(scene.film, acc, jitter, L * weight, spp_pass)


def render_spectral(scene, spp: int = 16, seed: int = 0, max_depth: int = 6,
                    rr_depth: int = 5, spp_per_pass: int = None,
                    raw: bool = False):
    """Spectral-variant render -> (H, W, 3) linear sRGB."""
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 21) // max(W * H, 1)))
    acc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        acc = spectral_pass(scene, acc, jnp.uint32(seed + sp * i + done), sp,
                            max_depth, rr_depth)
        done += sp
        i += 1
    return acc if raw else film_develop(acc)


# ---------------------------------------------------------------------------
# specfilm — multi-band spectral film (src/films/specfilm.cpp)
# ---------------------------------------------------------------------------

def _resolve_srf(srf, res=128):
    """SRF spec -> (nodes, values) numpy curves.  Accepts a (nodes,
    values) pair, a dict {"wavelengths":…, "values":…}, or a preset name
    'cie_x'/'cie_y'/'cie_z' (the CIE 1931 observer components, the same
    curves the reference loads from data/srf)."""
    import numpy as np
    if isinstance(srf, str):
        idx = {"cie_x": 0, "cie_y": 1, "cie_z": 2}[srf]
        grid = np.linspace(spec.CIE_MIN, spec.CIE_MAX, res)
        vals = np.asarray(spec.cie1931_xyz(jnp.asarray(grid)))[:, idx]
        return grid, vals
    if isinstance(srf, dict):
        return (np.asarray(srf["wavelengths"], np.float64),
                np.asarray(srf["values"], np.float64))
    nodes, values = srf
    return np.asarray(nodes, np.float64), np.asarray(values, np.float64)


def make_srf_bank(srfs, res: int = 256):
    """Build the combined wavelength-importance distribution over all
    sensor response functions (specfilm.cpp: one continuous distribution
    from the sum of the SRFs, then per-channel weighting)."""
    import numpy as np
    curves = [_resolve_srf(s) for s in srfs]
    lo = min(float(n[0]) for n, _ in curves)
    hi = max(float(n[-1]) for n, _ in curves)
    grid = np.linspace(lo, hi, res)
    vals = np.stack([np.interp(grid, n, v, left=0.0, right=0.0)
                     for n, v in curves])                 # (C, res)
    distr = ContinuousDistribution.from_pdf(grid, vals.sum(0))
    return dict(vals=jnp.asarray(vals, jnp.float32), distr=distr,
                lo=jnp.float32(lo), hi=jnp.float32(hi))


def _srf_eval(bank, wl):
    """(C, res) table lookup at wl (...,) -> (..., C), linear interp."""
    vals = bank["vals"]
    res = vals.shape[1]
    x = (wl - bank["lo"]) / (bank["hi"] - bank["lo"]) * (res - 1)
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 2)
    t = jnp.clip(x - i, 0.0, 1.0)
    v0 = vals[:, i]                                       # (C, ...)
    v1 = vals[:, i + 1]
    out = v0 + (v1 - v0) * t[None]
    inside = (wl >= bank["lo"]) & (wl <= bank["hi"])
    return jnp.moveaxis(jnp.where(inside[None], out, 0.0), 0, -1)


@functools.partial(jax.jit, static_argnames=("spp_pass", "max_depth",
                                             "rr_depth"),
                   donate_argnames=("acc",))
def specfilm_pass(scene, bank, acc, seed, spp_pass: int, max_depth: int = 6,
                  rr_depth: int = 5):
    W, H = scene.sensor.film_resolution
    n = W * H * spp_pass
    sampler = Sampler.seed(seed, n)
    ray, weight, pos, view, sampler = sample_rays(scene, sampler)
    u_wl, sampler = sampler.next_1d()
    shifts = (jnp.arange(K_WAVELENGTHS) / K_WAVELENGTHS)[None, :]
    u_k = jnp.mod(u_wl[..., None] + shifts, 1.0)
    wl, wl_pdf = bank["distr"].sample(u_k)                # (N, K)
    (L, wl, wl_pdf), valid, aovs, sampler = sample_spectral(
        scene, ray, sampler, max_depth=max_depth, rr_depth=rr_depth,
        wavelengths=(wl, wl_pdf), raw_spectral=True)
    srf = _srf_eval(bank, wl)                             # (N, K, C)
    inv = jnp.where(wl_pdf > 0, 1.0 / jnp.maximum(wl_pdf, 1e-20), 0.0)
    ch = jnp.mean(L[..., None] * srf * inv[..., None], axis=-2)  # (N, C)
    # sensor importance is RGB; spectral probes use its luminance
    w_lum = jnp.mean(weight, -1, keepdims=True)
    jitter = pos - jnp.floor(pos)
    return film_put_coalesced(scene.film, acc, jitter, ch * w_lum, spp_pass)


def render_specfilm(scene, srfs, spp: int = 16, seed: int = 0,
                    max_depth: int = 6, rr_depth: int = 5,
                    spp_per_pass: int = None):
    """specfilm render: one image channel per sensor response function.

    Returns (H, W, C); channel i estimates integral L(lambda)
    SRF_i(lambda) d-lambda, importance-sampled from the combined SRF
    distribution (specfilm.cpp)."""
    bank = make_srf_bank(srfs)
    C = bank["vals"].shape[0]
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 21) // max(W * H, 1)))
    from ..film import film_prepare as _prep
    acc = _prep(scene.film, channels=C)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        acc = specfilm_pass(scene, bank, acc, jnp.uint32(seed + sp * i + done),
                            sp, max_depth, rr_depth)
        done += sp
        i += 1
    return film_develop(acc)


from ...core.distr import ContinuousDistribution  # noqa: E402
from .api import register_integrator  # noqa: E402

register_integrator("path_spectral")(sample_spectral)
