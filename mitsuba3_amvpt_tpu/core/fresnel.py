"""Fresnel reflectance (dielectric + conductor).

jnp equivalent of include/mitsuba/render/fresnel.h (357 LoC).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel for a dielectric interface.

    Matches the reference ``fresnel`` (render/fresnel.h:29): handles rays
    arriving from either side (negative cos_theta_i = from inside).

    Returns (F, cos_theta_t, eta_it, eta_ti) where eta_it is the relative
    IOR along the transmitted ray and eta_ti its reciprocal; cos_theta_t
    carries the sign convention of the transmitted z (opposite side).
    """
    eta = jnp.asarray(eta)
    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    # Snell: sin^2(theta_t) = sin^2(theta_i) / eta_it^2
    cos_theta_t_sqr = 1.0 - eta_ti * eta_ti * (1.0 - cos_theta_i * cos_theta_i)
    abs_cos_i = jnp.abs(cos_theta_i)
    abs_cos_t = m.safe_sqrt(cos_theta_t_sqr)

    tir = cos_theta_t_sqr <= 0.0
    a_s = m.safe_div(abs_cos_i - eta_it * abs_cos_t, abs_cos_i + eta_it * abs_cos_t)
    a_p = m.safe_div(eta_it * abs_cos_i - abs_cos_t, eta_it * abs_cos_i + abs_cos_t)
    F = 0.5 * (a_s * a_s + a_p * a_p)
    F = jnp.where(tir, 1.0, F)
    F = jnp.where(eta == 1.0, 0.0, F)

    cos_theta_t = jnp.where(tir, 0.0, abs_cos_t) * jnp.where(outside, -1.0, 1.0)
    return F, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta, k):
    """Unpolarized conductor Fresnel (render/fresnel.h:163).

    eta/k may be spectral (trailing channel axis); cos_theta_i is
    broadcast against them.
    """
    c2 = cos_theta_i * cos_theta_i
    s2 = 1.0 - c2
    eta2 = eta * eta
    k2 = k * k
    t0 = eta2 - k2 - s2
    a2pb2 = m.safe_sqrt(t0 * t0 + 4.0 * eta2 * k2)
    t1 = a2pb2 + c2
    a = m.safe_sqrt(0.5 * (a2pb2 + t0))
    t2 = 2.0 * a * cos_theta_i
    rs = (t1 - t2) / (t1 + t2)
    t3 = c2 * a2pb2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / (t3 + t4)
    return 0.5 * (rs + rp)


def fresnel_diffuse_reflectance(eta):
    """Average reflectance for diffuse internal scattering (fresnel.h:236,
    Egan & Hilgeman polynomial fit).  Scalar or array eta."""
    eta = jnp.asarray(eta)
    inv_eta = 1.0 / eta
    approx_low = (-1.4399 * (inv_eta ** 2) + 0.7099 * inv_eta + 0.6681
                  + 0.0636 * eta)
    inv_eta_2 = inv_eta * inv_eta
    inv_eta_3 = inv_eta_2 * inv_eta
    inv_eta_4 = inv_eta_3 * inv_eta
    inv_eta_5 = inv_eta_4 * inv_eta
    approx_high = (0.919317 - 3.4793 * inv_eta + 6.75335 * inv_eta_2
                   - 7.80989 * inv_eta_3 + 4.98554 * inv_eta_4
                   - 1.36881 * inv_eta_5)
    return jnp.where(eta < 1.0, approx_low, approx_high)
