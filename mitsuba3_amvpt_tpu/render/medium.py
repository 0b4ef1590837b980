"""Participating media + phase functions.

Replaces the reference's Medium/PhaseFunction interfaces
(include/mitsuba/render/medium.h:53 sample_interaction,
:72 transmittance_eval_pdf; phase.h) and the homogeneous medium plugin
(src/media/homogeneous.cpp) with a flat MediumTable.  Heterogeneous
grid media (gridvolume) are a later-round item — the table carries a
density-grid texture id already.

Phase functions (src/phase/{isotropic,hg}.cpp): isotropic and
Henyey-Greenstein, dispatched by type id like BSDFs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import math as m
from ..core import warp

P_ISOTROPIC = 0
P_HG = 1


@struct.dataclass
class MediumTable:
    sigma_t: jnp.ndarray     # (M, 3) extinction
    albedo: jnp.ndarray      # (M, 3) single-scattering albedo
    phase_type: jnp.ndarray  # (M,) int32
    g: jnp.ndarray           # (M,) HG anisotropy
    scale: jnp.ndarray       # (M,)

    @property
    def n(self):
        return self.sigma_t.shape[0]

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
    t = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / st_c
    is_medium = t < maxt
    t_clamped = jnp.minimum(t, maxt)

    Tr = jnp.exp(-st * t_clamped[..., None])                # (N, 3)
    # pdf of medium event at t: mean_c sigma_t_c exp(-sigma_t_c t)
    pdf_t = jnp.mean(st * Tr, axis=-1)
    # pdf of reaching the surface: mean_c exp(-sigma_t_c maxt)
    pdf_surf = jnp.mean(Tr, axis=-1)
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
