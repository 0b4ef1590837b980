"""GGX / Beckmann microfacet distributions with Smith shadowing and
visible-normal sampling.

jnp equivalent of include/mitsuba/render/microfacet.h (570 LoC).  All
functions take directions in the *local shading frame* (+Z = normal) and
support anisotropy via (alpha_x, alpha_y).  Needed by the rough BSDFs and
by AMVPT's material-similarity pdf (mvpath.h:259-293).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as m

GGX = 0
BECKMANN = 1


def _alpha_uv(v, ax, ay):
    """Projected roughness along v's azimuth."""
    inv_st2 = m.safe_div(1.0, m.sin_theta_2(v), 0.0)
    c2 = v[..., 0] * v[..., 0] * inv_st2
    s2 = v[..., 1] * v[..., 1] * inv_st2
    proj2 = c2 * ax * ax + s2 * ay * ay
    # at normal incidence the azimuth is undefined; any value works
    return jnp.sqrt(jnp.where(m.sin_theta_2(v) < 1e-12, ax * ax, proj2))


def ndf(h, ax, ay, dist_type: int = GGX):
    """D(h) — microfacet normal distribution (microfacet.h ``eval``)."""
    ct = m.cos_theta(h)
    ct2 = ct * ct
    x, y = h[..., 0], h[..., 1]
    if dist_type == GGX:
        t = x * x / (ax * ax) + y * y / (ay * ay) + ct2
        D = m.safe_div(1.0, jnp.pi * ax * ay * t * t, 0.0)
    else:
        t2 = m.safe_div(x * x / (ax * ax) + y * y / (ay * ay), ct2, jnp.inf)
        ct4 = ct2 * ct2
        D = jnp.exp(-t2) / (jnp.pi * ax * ay * jnp.maximum(ct4, 1e-20))
    return jnp.where(ct > 0.0, D, 0.0)


def smith_g1(v, h, ax, ay, dist_type: int = GGX):
    """Monodirectional Smith shadowing term (microfacet.h ``smith_g1``)."""
    xy_alpha_2 = (ax * v[..., 0]) ** 2 + (ay * v[..., 1]) ** 2
    tan2 = m.safe_div(xy_alpha_2, v[..., 2] * v[..., 2], jnp.inf)
    if dist_type == GGX:
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    else:
        a = m.safe_rsqrt(tan2)
        g_approx = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
        g = jnp.where(a >= 1.6, 1.0, g_approx)
    # sidedness: v and h must lie on the same side
    same = m.dot(v, h) * m.cos_theta(v) > 0.0
    perp = xy_alpha_2 == 0.0
    g = jnp.where(perp, 1.0, g)
    return jnp.where(same, g, 0.0)


def G(wi, wo, h, ax, ay, dist_type: int = GGX):
    return smith_g1(wi, h, ax, ay, dist_type) * smith_g1(wo, h, ax, ay, dist_type)


def sample_vndf(wi, sample2, ax, ay, dist_type: int = GGX):
    """Sample the distribution of visible normals (Heitz 2018 for GGX).

    Equivalent of MicrofacetDistribution::sample with
    sample_visible=true (microfacet.h:341).  Returns (h, pdf).
    """
    if dist_type != GGX:
        # Beckmann visible-normal sampling: fall back to GGX-style
        # stretched sampling is involved; use full-NDF sampling for
        # Beckmann (matches sample_visible=false branch).
        from . import warp
        h = warp.square_to_beckmann(sample2, ax)
        pdf = warp.square_to_beckmann_pdf(h, ax)
        return h, pdf

    # side handling: sample as if from above, flip back
    flip = m.cos_theta(wi) < 0.0
    wi_f = jnp.where(flip[..., None], -wi, wi)

    # stretch
    vh = m.normalize(m.vec(ax * wi_f[..., 0], ay * wi_f[..., 1], wi_f[..., 2]))
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        m.vec(-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)) * m.safe_rsqrt(lensq)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    # parameterize projected area
    r = jnp.sqrt(sample2[..., 0])
    phi = 2.0 * jnp.pi * sample2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * m.safe_sqrt(1.0 - p1 * p1) + s * p2
    nh = (p1[..., None] * t1 + p2[..., None] * t2
          + m.safe_sqrt(1.0 - p1 * p1 - p2 * p2)[..., None] * vh)
    # unstretch; h stays in the upper hemisphere by convention (for a
    # below-surface wi the caller's dot(wi, h) < 0 carries the side info,
    # as in Walter 2007 / roughdielectric.cpp)
    h = m.normalize(m.vec(ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 1e-9)))
    pdf = pdf_vndf(wi, h, ax, ay, dist_type)
    return h, pdf


def pdf_vndf(wi, h, ax, ay, dist_type: int = GGX):
    """pdf of sample_vndf in half-vector measure:
    D(h) G1(wi) |wi.h| / |cos(wi)| (microfacet.h ``pdf``)."""
    D = ndf(h, ax, ay, dist_type)
    if dist_type != GGX:
        from . import warp
        return warp.square_to_beckmann_pdf(h, ax)
    g1 = smith_g1(wi, h, ax, ay, dist_type)
    return m.safe_div(D * g1 * jnp.abs(m.dot(wi, h)), jnp.abs(m.cos_theta(wi)), 0.0)
