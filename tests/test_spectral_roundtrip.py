"""Spectral upsampling color accuracy (rgb2spec parity check,
src/render/srgb.cpp): rgb -> spectrum -> CIE integration -> sRGB must
round-trip.  The linear sigmoid basis is exactly corrected by a
precomposed 3x3 matrix (spectral._basis_correction); only saturated
out-of-gamut colors retain a small clamped residual."""

import numpy as np
import pytest
import jax.numpy as jnp

from mitsuba3_amvpt_tpu.render.integrators.spectral import (
    rgb_basis, spectral_to_rgb, upsample)

pytestmark = pytest.mark.smoke


def roundtrip(rgbs):
    """Dense-wavelength round trip through the RENDERER's own
    spectral_to_rgb (uniform-pdf limit of the MC estimator)."""
    wl = jnp.linspace(380.0, 720.0, 256)
    B = jnp.broadcast_to(rgb_basis(wl)[None], (len(rgbs), 256, 3))
    S = upsample(jnp.asarray(rgbs, jnp.float32), B)
    wlb = jnp.broadcast_to(wl[None], S.shape)
    got = spectral_to_rgb(S, wlb, jnp.ones_like(S))
    return np.asarray(got), np.asarray(S)


def test_white_and_grays_exact():
    g = np.array([[1, 1, 1], [0.5, 0.5, 0.5], [0.18, 0.18, 0.18]],
                 np.float32)
    got, S = roundtrip(g)
    assert np.abs(got - g).max() < 1e-4
    # flat spectra for grays (the key rgb2spec reflectance property)
    assert np.abs(S[0] - 1.0).max() < 1e-4


def test_random_colors_accurate():
    rng = np.random.default_rng(3)
    rgbs = rng.random((256, 3)).astype(np.float32)
    got, S = roundtrip(rgbs)
    err = np.abs(got - rgbs)
    assert err.mean() < 2e-3, err.mean()
    assert np.percentile(err, 95) < 5e-3
    assert err.max() < 0.08            # clamped out-of-gamut residual
    assert S.min() >= 0.0              # physical spectra


def test_primaries_bounded_residual():
    got, _ = roundtrip(np.eye(3, dtype=np.float32))
    assert np.abs(got - np.eye(3)).max() < 0.06
