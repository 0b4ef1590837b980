"""Participating media + phase functions.

Replaces the reference's Medium/PhaseFunction interfaces
(include/mitsuba/render/medium.h:53 sample_interaction,
:72 transmittance_eval_pdf), the homogeneous medium plugin
(src/media/homogeneous.cpp) and the heterogeneous medium plugin
(src/media/heterogeneous.cpp) with a flat MediumTable.

Heterogeneous media store volume-grid ids (render/volume.py) for the
density (and optionally albedo) fields and a scalar *majorant*
(= max-density * scale * max-channel sigma_t, the reference's
``get_majorant`` / combined extinction).  Free-flight sampling then uses
**delta tracking** against the majorant with per-channel null-collision
ratio weights — the single-sampled-channel spectral MIS of
volpath.cpp:83,239-247 — and shadow transmittance uses **ratio
tracking**.  Both loops draw from a per-lane TEA sub-stream key so the
sampler's dimension counter stays independent of the (data-dependent)
collision count, which keeps PRB replay deterministic (SURVEY.md §A.5).

Phase functions (src/phase/{isotropic,hg}.cpp): isotropic and
Henyey-Greenstein, dispatched by type id like BSDFs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import math as m
from ..core import warp
from ..core.rng import bits_to_float01, sample_tea_32

P_ISOTROPIC = 0
P_HG = 1

# hard cap on tracking-loop collisions per flight (wavefront-global
# while_loop bound; optical depth per segment rarely exceeds ~100)
MAX_TRACK_STEPS = 4096


@struct.dataclass
class MediumTable:
    sigma_t: jnp.ndarray     # (M, 3) extinction (base value for hetero)
    albedo: jnp.ndarray      # (M, 3) single-scattering albedo
    phase_type: jnp.ndarray  # (M,) int32
    g: jnp.ndarray           # (M,) HG anisotropy
    scale: jnp.ndarray       # (M,)
    density_vol: jnp.ndarray = None  # (M,) int32 volume id, -1 = constant
    albedo_vol: jnp.ndarray = None   # (M,) int32 volume id, -1 = constant
    majorant: jnp.ndarray = None     # (M,) scalar majorant extinction

    @property
    def n(self):
        return self.sigma_t.shape[0]

    def __post_init__(self):
        M = self.sigma_t.shape[0] if hasattr(self.sigma_t, "shape") else 1
        if self.density_vol is None:
            object.__setattr__(self, "density_vol",
                               jnp.full((M,), -1, jnp.int32))
        if self.albedo_vol is None:
            object.__setattr__(self, "albedo_vol",
                               jnp.full((M,), -1, jnp.int32))
        if self.majorant is None:
            object.__setattr__(
                self, "majorant",
                jnp.max(self.sigma_t, -1) * self.scale)

    @staticmethod
    def empty() -> "MediumTable":
        return MediumTable(sigma_t=jnp.zeros((1, 3)),
                           albedo=jnp.zeros((1, 3)),
                           phase_type=jnp.zeros((1,), jnp.int32),
                           g=jnp.zeros((1,)), scale=jnp.ones((1,)))


# ---------------------------------------------------------------------------
# phase functions
# ---------------------------------------------------------------------------

def phase_sample(ptype, g, wi_world, u2):
    """Sample a scattered direction (world frame); returns (wo, pdf).
    wi_world points toward the previous vertex (incoming)."""
    iso = warp.square_to_uniform_sphere(u2)
    # HG (src/phase/hg.cpp): cos_theta from the inverse CDF
    g = jnp.where(jnp.abs(g) < 1e-3, 1e-3 * jnp.sign(g) + 1e-6, g)
    sqr = (1.0 - g * g) / (1.0 + g - 2.0 * g * u2[..., 0])
    ct = -(1.0 + g * g - sqr * sqr) / (2.0 * g)
    st = m.safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * jnp.pi * u2[..., 1]
    # frame around -wi (forward scattering dir)
    fwd = -wi_world
    s, t = m.coordinate_system(fwd)
    wo_hg = (st * jnp.cos(phi))[..., None] * s \
        + (st * jnp.sin(phi))[..., None] * t + ct[..., None] * fwd
    is_hg = ptype == P_HG
    wo = jnp.where(is_hg[..., None], wo_hg, iso)
    pdf = phase_eval(ptype, g, wi_world, wo)
    return wo, pdf


def phase_eval(ptype, g, wi_world, wo_world):
    """Phase value == pdf (normalized) for iso/HG."""
    ct = m.dot(-wi_world, wo_world)
    denom = 1.0 + g * g + 2.0 * g * ct
    hg = warp.INV_FOURPI * (1.0 - g * g) / jnp.maximum(
        denom * m.safe_sqrt(denom), 1e-8)
    return jnp.where(ptype == P_HG, hg, jnp.full_like(ct, warp.INV_FOURPI))


# ---------------------------------------------------------------------------
# homogeneous medium sampling
# ---------------------------------------------------------------------------

def sample_interaction(media: MediumTable, med_id, u_channel, u_dist, maxt):
    """Free-flight sampling with uniform spectral channel selection
    (volpath.cpp:83, homogeneous.cpp): returns
    (t, is_medium (bool), tr_pdf_weight (3,), sigma_s (3,)).

    tr_pdf_weight = T(t)*sigma_t_ratio... — specifically the combined
    weight Tr/pdf for the sampled event:
      medium event at t:  sigma_s * T(t) / pdf_t
      surface event:      T(maxt) / P(surface)
    computed with the single-sample spectral MIS of the reference
    (uniform channel pick, pdf averaged over channels).
    """
    sid = jnp.maximum(med_id, 0)
    st = media.sigma_t[sid] * media.scale[sid][..., None]   # (N, 3)
    alb = media.albedo[sid]
    sigma_s = st * alb

    ch = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    st_c = jnp.take_along_axis(st, ch[..., None], -1)[..., 0]
    st_c = jnp.maximum(st_c, 1e-8)
    # DETACHED SAMPLING (prb.py style, essential for unbiased naive AD
    # too): the sampled distance and the sampling pdfs are evaluated at
    # detached parameters; only the integrand (Tr, sigma_s) is attached.
    t = jax.lax.stop_gradient(
        -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / st_c)
    is_medium = t < maxt
    t_clamped = jnp.minimum(t, maxt)

    Tr = jnp.exp(-st * t_clamped[..., None])                # (N, 3)
    # pdf of medium event at t: mean_c sigma_t_c exp(-sigma_t_c t)
    pdf_t = jax.lax.stop_gradient(jnp.mean(st * Tr, axis=-1))
    # pdf of reaching the surface: mean_c exp(-sigma_t_c maxt)
    pdf_surf = jax.lax.stop_gradient(jnp.mean(Tr, axis=-1))
    w_medium = sigma_s * Tr / jnp.maximum(pdf_t, 1e-20)[..., None]
    w_surface = Tr / jnp.maximum(pdf_surf, 1e-20)[..., None]
    weight = jnp.where(is_medium[..., None], w_medium, w_surface)
    return t_clamped, is_medium, weight, sigma_s


def transmittance(media: MediumTable, med_id, dist):
    """Analytic homogeneous transmittance along a segment
    (Medium::transmittance_eval_pdf medium.h:72)."""
    sid = jnp.maximum(med_id, 0)
    st = media.sigma_t[sid] * media.scale[sid][..., None]
    inside = med_id >= 0
    T = jnp.exp(-st * dist[..., None])
    return jnp.where(inside[..., None], T, 1.0)


# ---------------------------------------------------------------------------
# heterogeneous media: delta tracking / ratio tracking
# ---------------------------------------------------------------------------

def eval_sigma(media: MediumTable, vols, med_id, p):
    """Extinction and scattering coefficients at world point ``p``
    (heterogeneous.cpp get_scattering_coefficients): sigma_t(x) =
    base_sigma_t * scale * density(x); albedo constant or gridded.
    Returns (sigma_t (N,3), sigma_s (N,3))."""
    sid = jnp.maximum(med_id, 0)
    base = media.sigma_t[sid] * media.scale[sid][..., None]
    dvol = media.density_vol[sid]
    dens = jnp.where((dvol >= 0)[..., None], vols.eval(dvol, p), 1.0)
    st = base * dens
    avol = media.albedo_vol[sid]
    alb = jnp.where((avol >= 0)[..., None], vols.eval(avol, p),
                    media.albedo[sid])
    return st, st * alb


def _track_u(key, step, salt):
    """In-flight uniform draw: tea(flight_key, 2*step + salt)."""
    return bits_to_float01(
        sample_tea_32(key, jnp.uint32(2) * step.astype(jnp.uint32)
                      + jnp.uint32(salt), rounds=4)[0])


def sample_interaction_dt(media: MediumTable, vols, med_id, o, d, maxt,
                          key, u_channel):
    """Delta-tracking free-flight sampling against the scalar majorant
    (heterogeneous media; volpath.cpp:239-247 null-scattering scheme).

    A real collision at x is accepted with probability
    ``sigma_t_c(x)/majorant`` for one uniformly sampled channel c; the
    per-channel weights carry the spectral ratio-tracking factors
    ``sigma_s(x)/sigma_t_c(x)`` (real) and
    ``(majorant - sigma_t(x))/(majorant - sigma_t_c(x))`` (null).
    Unbiased for homogeneous lanes too (density == 1).

    Returns (t, is_medium_event (bool), weight (N,3), sigma_s (N,3)).
    """
    n = maxt.shape[0]
    sid = jnp.maximum(med_id, 0)
    mj = media.majorant[sid]
    ch = jnp.clip((u_channel * 3).astype(jnp.int32), 0, 2)
    in_medium = (med_id >= 0) & (mj > 0.0)

    init = dict(
        t=jnp.zeros((n,)),
        w=jnp.ones((n, 3)),
        is_med=jnp.zeros((n,), bool),
        w_evt=jnp.zeros((n, 3)),
        active=in_medium,
        step=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["active"]) & (c["step"] < MAX_TRACK_STEPS)

    def body(c):
        u1 = _track_u(key, c["step"], 0)
        u2 = _track_u(key, c["step"], 1)
        t_new = c["t"] - jnp.log1p(-u1) / jnp.maximum(mj, 1e-20)
        reached = t_new >= maxt
        x = o + d * t_new[..., None]
        st, ss = eval_sigma(media, vols, med_id, x)
        st_c = jnp.take_along_axis(st, ch[..., None], -1)[..., 0]
        prob = st_c / jnp.maximum(mj, 1e-20)
        real = (u2 < prob) & ~reached
        null = ~real & ~reached
        w_real = ss / jnp.maximum(st_c, 1e-20)[..., None]
        w_null = (mj[..., None] - st) \
            / jnp.maximum(mj - st_c, 1e-20)[..., None]
        act = c["active"]
        upd = lambda mask, new, old: jnp.where(  # noqa: E731
            (act & mask)[..., None] if new.ndim == 2 else (act & mask),
            new, old)
        return dict(
            t=upd(real, t_new, c["t"]),
            w=upd(null, c["w"] * w_null, c["w"]),
            is_med=c["is_med"] | (act & real),
            w_evt=upd(real, c["w"] * w_real, c["w_evt"]),
            active=act & null,
            step=c["step"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    is_med = out["is_med"]
    t = jnp.where(is_med, out["t"], maxt)
    # medium event: weight = (prod of null factors) * sigma_s/sigma_t_c;
    # surface event: product of null factors (transmittance estimator)
    weight = jnp.where(is_med[..., None], out["w_evt"], out["w"])
    weight = jnp.where(in_medium[..., None], weight, 1.0)
    return t, is_med, weight, jnp.where(is_med[..., None], out["w_evt"], 0.0)


def transmittance_rt(media: MediumTable, vols, med_id, o, d, dist, key):
    """Ratio-tracking transmittance estimate along a shadow segment
    (heterogeneous.cpp via Medium::transmittance_eval_pdf): unbiased
    product of ``1 - sigma_t(x)/majorant`` at majorant-sampled points."""
    n = dist.shape[0]
    sid = jnp.maximum(med_id, 0)
    mj = media.majorant[sid]
    in_medium = (med_id >= 0) & (mj > 0.0)

    init = dict(
        t=jnp.zeros((n,)),
        w=jnp.ones((n, 3)),
        active=in_medium,
        step=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(c["active"]) & (c["step"] < MAX_TRACK_STEPS)

    def body(c):
        u1 = _track_u(key, c["step"], 0)
        t_new = c["t"] - jnp.log1p(-u1) / jnp.maximum(mj, 1e-20)
        reached = t_new >= dist
        x = o + d * t_new[..., None]
        st, _ = eval_sigma(media, vols, med_id, x)
        f = 1.0 - st / jnp.maximum(mj, 1e-20)[..., None]
        act = c["active"]
        keep = act & ~reached
        return dict(
            t=jnp.where(keep, t_new, c["t"]),
            w=jnp.where(keep[..., None], c["w"] * f, c["w"]),
            active=keep,
            step=c["step"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return jnp.where(in_medium[..., None], out["w"], 1.0)


def medium_transmittance(media: MediumTable, vols, med_id, o, d, dist,
                         key, hetero: bool):
    """Per-segment transmittance: analytic for purely homogeneous scenes,
    ratio tracking when any heterogeneous medium is present (``hetero``
    is a static scene flag)."""
    if not hetero:
        return transmittance(media, med_id, dist)
    return transmittance_rt(media, vols, med_id, o, d, dist, key)
