"""Color / spectrum utilities.

jnp equivalent of src/core/spectrum.cpp + include/mitsuba/core/spectrum.h.
The renderer's "Spectrum" is simply a trailing channel axis: 3 channels
in RGB mode, ``n_wavelengths`` (default 4) Monte Carlo wavelength samples
in spectral mode (SURVEY.md §7 architecture stance).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Visible-range bounds used by the reference (spectrum.h MI_CIE_MIN/MAX)
CIE_MIN = 360.0
CIE_MAX = 830.0


def luminance(rgb):
    """Rec. 709 luminance of linear RGB (spectrum.h ``luminance``)."""
    return (rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169)


def srgb_to_xyz(rgb):
    M = jnp.array([[0.412453, 0.357580, 0.180423],
                   [0.212671, 0.715160, 0.072169],
                   [0.019334, 0.119193, 0.950227]])
    return jnp.einsum("ij,...j->...i", M, rgb)


def xyz_to_srgb(xyz):
    M = jnp.array([[3.240479, -1.537150, -0.498535],
                   [-0.969256, 1.875991, 0.041556],
                   [0.055648, -0.204043, 1.057311]])
    return jnp.einsum("ij,...j->...i", M, xyz)


def srgb_gamma(x):
    """linear -> sRGB nonlinearity (bitmap.cpp srgb conversion)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)


def srgb_degamma(x):
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


# ---------------------------------------------------------------------------
# CIE 1931 observer (coarse 5nm table, interpolated) — for spectral mode
# ---------------------------------------------------------------------------

# Analytic multi-lobe Gaussian fits of the CIE 1931 standard observer
# (Wyman, Sloan, Shirley, JCGT 2013) — avoids shipping the 95-entry table
# and is accurate to ~1e-3, plenty for spectral rendering.
def cie1931_xyz(wl):
    """wl in nm -> (..., 3) XYZ observer values."""
    wl = jnp.asarray(wl)

    def g(x, mu, s1, s2):
        t = (x - mu) * jnp.where(x < mu, 1.0 / s1, 1.0 / s2)
        return jnp.exp(-0.5 * t * t)

    x = (1.056 * g(wl, 599.8, 37.9, 31.0)
         + 0.362 * g(wl, 442.0, 16.0, 26.7)
         - 0.065 * g(wl, 501.1, 20.4, 26.2))
    y = (0.821 * g(wl, 568.8, 46.9, 40.5)
         + 0.286 * g(wl, 530.9, 16.3, 31.1))
    z = (1.217 * g(wl, 437.0, 11.8, 36.0)
         + 0.681 * g(wl, 459.0, 26.0, 13.8))
    return jnp.stack([x, y, z], axis=-1)


def cie_d65(wl):
    """Approximate D65 illuminant SPD, normalized so value(560nm)=1.
    Piecewise-linear fit of the CIE D65 table at 10nm resolution."""
    table_wl = np.arange(360.0, 831.0, 10.0)
    table = np.array([
        46.64, 49.36, 82.75, 91.49, 93.43, 86.68, 104.87, 117.01, 117.81,
        114.86, 115.92, 108.81, 109.35, 107.80, 104.79, 107.69, 104.41,
        104.05, 100.00, 96.33, 95.79, 88.69, 90.01, 89.60, 87.70, 83.29,
        83.70, 80.03, 80.21, 82.28, 78.28, 69.72, 71.61, 74.35, 61.60,
        69.89, 75.09, 63.59, 46.42, 66.81, 63.38, 64.30, 59.45, 51.96,
        57.44, 60.31, 58.73, 53.10,
    ])
    return jnp.interp(wl, jnp.asarray(table_wl), jnp.asarray(table / 100.0))


def sample_uniform_wavelength(u, lambda_min=CIE_MIN, lambda_max=CIE_MAX):
    """Uniform wavelength sampling; returns (wl, pdf)."""
    wl = lambda_min + u * (lambda_max - lambda_min)
    pdf = jnp.full_like(wl, 1.0 / (lambda_max - lambda_min))
    return wl, pdf


def sample_visible_wavelength(u):
    """Importance sample the CIE-Y-weighted visible range
    (reference spectrum.h ``math::sample_shifted`` + pdf fit).
    Uses the analytic inverse from PBRT: wl = 538 - 138.888889 *
    atanh(0.85691062 - 1.82750197 u)."""
    wl = 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)
    t = jnp.cosh(0.0072 * (wl - 538.0))
    pdf = 0.0039398042 / (t * t)
    return wl, pdf


def pdf_visible_wavelength(wl):
    t = jnp.cosh(0.0072 * (wl - 538.0))
    inside = (wl >= CIE_MIN) & (wl <= CIE_MAX)
    return jnp.where(inside, 0.0039398042 / (t * t), 0.0)


def spectrum_to_xyz(values, wavelengths, pdf):
    """MC estimate of XYZ from spectral samples: mean over the wavelength
    axis of value * observer / pdf (reference spectrum_to_xyz)."""
    obs = cie1931_xyz(wavelengths)                       # (..., K, 3)
    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)
    contrib = values[..., None] * obs * w[..., None]
    # normalization: integral of CIE Y over visible = 106.857
    return jnp.mean(contrib, axis=-2) / 106.857


def srgb_model_eval(coeff, wl):
    """Polynomial sRGB->spectrum upsampling model (src/render/srgb.cpp:14
    srgb_model_fetch/eval, Jakob & Hanika 2019): coeff (..., 3) evaluated
    at wavelengths wl."""
    c0, c1, c2 = coeff[..., 0:1], coeff[..., 1:2], coeff[..., 2:3]
    x = c0 * wl * wl + c1 * wl + c2
    return 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))
