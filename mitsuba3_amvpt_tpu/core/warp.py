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


def _bessel_i0(x):
    """Modified Bessel I0, 10-term series (warp.h detail::i0)."""
    result = jnp.ones_like(x)
    x2 = x * x
    xi = x2
    denom = 4.0
    for i in range(1, 11):
        result = result + xi / denom
        xi = xi * x2
        denom = denom * 4.0 * (i + 1.0) ** 2
    return result


def _log_bessel_i0(x):
    """warp.h detail::log_i0 (asymptotic branch for large args)."""
    return jnp.where(
        x > 12.0,
        x + 0.5 * (jnp.log(1.0 / (2.0 * PI * jnp.maximum(x, 1e-6)))
                   + 1.0 / (8.0 * jnp.maximum(x, 1e-6))),
        jnp.log(_bessel_i0(jnp.minimum(x, 12.0))))


def square_to_rough_fiber(s3, wi, tangent, kappa):
    """warp.h:713 — scattered direction from a rough fiber with tangent
    ``tangent`` (vMF-perturbed specular cone), s3 = 3 uniform samples."""
    t_n = m.normalize(tangent)
    fs, ft = m.coordinate_system(t_n)
    wi_l = m.vec(m.dot(wi, fs), m.dot(wi, ft), m.dot(wi, t_n))
    sp, cp = jnp.sin(2.0 * PI * s3[..., 0]), jnp.cos(2.0 * PI * s3[..., 0])
    ct = wi_l[..., 2]
    st = m.safe_sqrt(1.0 - ct * ct)
    wo_l = m.vec(cp * st, sp * st, -ct)
    pert = square_to_von_mises_fisher(s3[..., 1:3], kappa)
    ws, wt = m.coordinate_system(wo_l)
    wo_l = (pert[..., 0:1] * ws + pert[..., 1:2] * wt
            + pert[..., 2:3] * wo_l)
    return (wo_l[..., 0:1] * fs + wo_l[..., 1:2] * ft
            + wo_l[..., 2:3] * t_n)


def square_to_rough_fiber_pdf(v, wi, tangent, kappa):
    """warp.h:771 — analytic density of square_to_rough_fiber (d'Eon et
    al. 2011 energy-conserving fiber model, with the numerical fixes of
    d'Eon et al. 2013)."""
    sin_theta_i = m.dot(wi, tangent)
    sin_theta_o = m.dot(v, tangent)
    cos_theta_i = m.safe_sqrt(1.0 - sin_theta_i ** 2)
    cos_theta_o = m.safe_sqrt(1.0 - sin_theta_o ** 2)
    c = cos_theta_i * cos_theta_o * kappa
    s = sin_theta_i * sin_theta_o * kappa
    kap = jnp.maximum(kappa, 1e-12)
    small = jnp.minimum(kap, 10.0)   # keep sinh in range on the dead branch
    return jnp.where(
        kappa > 10.0,
        jnp.exp(-s + _log_bessel_i0(c) - kap + 0.6931 + jnp.log(0.5 * kap))
        * INV_TWOPI,
        jnp.exp(-s) * _bessel_i0(c) * small / (2.0 * jnp.sinh(small))
        * INV_TWOPI)


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
