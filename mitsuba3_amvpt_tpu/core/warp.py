"""Sample warps square -> disk/sphere/hemisphere/... with pdfs.

jnp reimplementation of the reference's include/mitsuba/core/warp.h
(831 LoC).  Each ``square_to_X`` takes uniform samples in [0,1)^2 with
trailing axis 2 and returns directions/points with trailing axis 3 (or
2); each ``square_to_X_pdf`` returns the density of that warp.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as m

PI = jnp.pi
INV_PI = 1.0 / jnp.pi
INV_TWOPI = 0.5 / jnp.pi
INV_FOURPI = 0.25 / jnp.pi


# -- disk -------------------------------------------------------------------

def square_to_uniform_disk_concentric(s):
    """Shirley-Chiu concentric mapping (warp.h:149)."""
    x = 2.0 * s[..., 0] - 1.0
    y = 2.0 * s[..., 1] - 1.0
    is_zero = jnp.logical_and(x == 0.0, y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * PI * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * PI - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric_pdf(p):
    inside = m.squared_norm(p) <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


# -- sphere / hemisphere ----------------------------------------------------

def square_to_uniform_sphere(s):
    """warp.h:274 — z uniform in [-1, 1]."""
    z = 1.0 - 2.0 * s[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * s[..., 0]
    return m.vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_sphere_pdf(d):
    return jnp.full(d.shape[:-1], INV_FOURPI)


def square_to_uniform_hemisphere(s):
    """warp.h:313 — uniform over z >= 0."""
    z = s[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * s[..., 0]
    return m.vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.where(d[..., 2] >= 0.0, INV_TWOPI, 0.0)


def square_to_cosine_hemisphere(s):
    """Concentric disk lift (warp.h:351) — low-distortion cosine warp."""
    p = square_to_uniform_disk_concentric(s)
    z = m.safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return m.vec(p[..., 0], p[..., 1], z)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


# -- cones / triangles ------------------------------------------------------

def square_to_uniform_cone(s, cos_cutoff):
    """Uniform direction in a cone around +Z (warp.h:384)."""
    one_minus = 1.0 - cos_cutoff
    ct = 1.0 - one_minus * s[..., 1]
    st = m.safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * PI * s[..., 0]
    return m.vec(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def square_to_uniform_cone_pdf(d, cos_cutoff):
    return jnp.where(d[..., 2] >= cos_cutoff, INV_TWOPI / (1.0 - cos_cutoff), 0.0)


def square_to_uniform_triangle(s):
    """Barycentric warp (warp.h:512, Heitz's sqrt-free version)."""
    t = m.safe_sqrt(1.0 - s[..., 0])
    return jnp.stack([1.0 - t, t * s[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1.0)
    return jnp.where(inside, 2.0, 0.0)


# -- gaussian / tent (reconstruction filter sampling) ----------------------

def interval_to_tent(s):
    sign = jnp.where(s < 0.5, 1.0, -1.0)
    s2 = jnp.where(s < 0.5, 2.0 * s, 2.0 * (1.0 - s))
    return sign * (1.0 - m.safe_sqrt(s2))


def square_to_tent(s):
    return jnp.stack([interval_to_tent(s[..., 0]), interval_to_tent(s[..., 1])], axis=-1)


def square_to_std_normal(s):
    """Box-Muller (warp.h:228)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - s[..., 0], 1e-20)))
    phi = 2.0 * PI * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


# -- beckmann / ggx (full-sphere NDF warps; VNDF lives in microfacet.py) ---

def square_to_beckmann(s, alpha):
    ct2 = 1.0 / (1.0 - alpha * alpha * jnp.log(jnp.maximum(1.0 - s[..., 1], 1e-20)))
    ct = jnp.sqrt(ct2)
    st = m.safe_sqrt(1.0 - ct2)
    phi = 2.0 * PI * s[..., 0]
    return m.vec(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def square_to_beckmann_pdf(d, alpha):
    ct = d[..., 2]
    t2 = m.tan_theta_2(d)
    pdf = INV_PI / (alpha * alpha * ct ** 3) * jnp.exp(-t2 / (alpha * alpha))
    return jnp.where(ct > 1e-9, pdf, 0.0)


def square_to_rough_fiber(*a, **k):  # pragma: no cover - parity stub
    raise NotImplementedError("rough fiber warp (hair BSDF) — later round")


# -- von Mises-Fisher -------------------------------------------------------

def square_to_von_mises_fisher(s, kappa):
    """warp.h:700 — vMF around +Z."""
    sy = jnp.maximum(1.0 - s[..., 1], 1e-20)
    ct = 1.0 + jnp.log(sy + (1.0 - sy) * jnp.exp(-2.0 * kappa)) / kappa
    st = m.safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * PI * s[..., 0]
    return m.vec(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def square_to_von_mises_fisher_pdf(d, kappa):
    return jnp.exp(kappa * (d[..., 2] - 1.0)) * (kappa * INV_TWOPI) / (1.0 - jnp.exp(-2.0 * kappa))
