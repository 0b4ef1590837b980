"""Phase-function tests: chi2 goodness-of-fit (sample vs eval_pdf) and
normalization for the full phase set — isotropic, hg, rayleigh,
tabphase, blendphase, sggx (reference: src/phase/*.cpp,
src/phase/tests/test_*.py, render/microflake.h)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_amvpt_tpu.core import math as m
from mitsuba3_amvpt_tpu.render.medium import (MediumTable, P_BLEND, P_HG,
                                              P_ISOTROPIC, P_RAYLEIGH,
                                              P_SGGX, P_TAB, TAB_K,
                                              phase_eval, phase_sample)
from mitsuba3_amvpt_tpu.utils.chi2 import ChiSquareTest, SphericalDomain


def _medium(ptype, g=0.0, tab_values=None, blend=None, sggx_s=None):
    kw = dict(sigma_t=jnp.ones((1, 3)), albedo=jnp.full((1, 3), 0.8),
              phase_type=jnp.asarray([ptype], jnp.int32),
              g=jnp.asarray([g], jnp.float32), scale=jnp.ones((1,)))
    if tab_values is not None:
        v = np.asarray(tab_values, np.float64)
        xs = np.linspace(-1.0, 1.0, len(v))
        xk = np.linspace(-1.0, 1.0, TAB_K)
        pdf = np.interp(xk, xs, v)
        dx = 2.0 / (TAB_K - 1)
        cdf = np.concatenate([[0.0],
                              np.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * dx)])
        kw["tab_pdf"] = jnp.asarray(pdf / cdf[-1], jnp.float32)[None]
        kw["tab_cdf"] = jnp.asarray(cdf / cdf[-1], jnp.float32)[None]
    if blend is not None:
        (t2, g2), (t3, g3), w = blend
        kw.update(phase_type2=jnp.asarray([t2], jnp.int32),
                  g2=jnp.asarray([g2], jnp.float32),
                  phase_type3=jnp.asarray([t3], jnp.int32),
                  g3=jnp.asarray([g3], jnp.float32),
                  blend_w=jnp.asarray([w], jnp.float32))
    if sggx_s is not None:
        kw["sggx_s"] = jnp.asarray(sggx_s, jnp.float32)[None]
    return MediumTable(**kw)


D_IN = jnp.asarray(m.normalize(jnp.array([0.3, -0.25, 0.92])))


def _chi2(media, seed=0, res=31, ires=8):
    def sample(u):
        sid = jnp.zeros((u.shape[0],), jnp.int32)
        d = jnp.tile(D_IN[None], (u.shape[0], 1))
        wo, _ = phase_sample(media, sid, d, u)
        return wo

    def pdf(wo):
        sid = jnp.zeros((wo.shape[0],), jnp.int32)
        d = jnp.tile(D_IN[None], (wo.shape[0], 1))
        return phase_eval(media, sid, d, wo)

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=2,
                      sample_count=400_000, res=res, ires=ires, seed=seed)
    assert t.run(), t.messages


def _norm(media):
    """MC-integrate the phase function over the sphere: must be 1."""
    rng = np.random.default_rng(3)
    n = 200_000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    st = np.sqrt(1 - z * z)
    wo = jnp.asarray(np.stack([st * np.cos(phi), st * np.sin(phi), z], -1),
                     jnp.float32)
    sid = jnp.zeros((n,), jnp.int32)
    d = jnp.tile(D_IN[None], (n, 1))
    val = phase_eval(media, sid, d, wo)
    integral = float(jnp.mean(val)) * 4.0 * np.pi
    assert abs(integral - 1.0) < 2e-2, integral


class TestPhaseChi2:
    def test_hg(self):
        _chi2(_medium(P_HG, g=0.6))

    def test_rayleigh(self):
        _chi2(_medium(P_RAYLEIGH), seed=1)

    def test_tabphase_hg_shape(self):
        # tabulate an HG-like forward lobe: pdf(ct) over physics cosine
        ct = np.linspace(-1, 1, 256)
        g = 0.4
        v = (1 - g * g) / (1 + g * g - 2 * g * ct) ** 1.5
        _chi2(_medium(P_TAB, tab_values=v), seed=2)

    def test_blendphase(self):
        _chi2(_medium(P_BLEND,
                      blend=((P_HG, 0.7), (P_RAYLEIGH, 0.0), 0.35)),
              seed=3)

    @pytest.mark.parametrize("s6", [
        [1.0, 1.0, 1.0, 0.0, 0.0, 0.0],          # sphere (= isotropic-ish)
        [1.0, 0.35, 0.08, 0.0, 0.0, 0.0],        # oblate flakes
        [0.9, 0.6, 0.25, 0.1, 0.05, -0.04],      # full symmetric matrix
    ])
    def test_sggx(self, s6):
        _chi2(_medium(P_SGGX, sggx_s=s6), seed=4, res=31, ires=12)


class TestPhaseNormalization:
    @pytest.mark.parametrize("media", [
        _medium(P_ISOTROPIC), _medium(P_HG, g=-0.5), _medium(P_RAYLEIGH),
        _medium(P_TAB, tab_values=np.linspace(0.2, 1.0, 64) ** 2),
        _medium(P_BLEND, blend=((P_ISOTROPIC, 0.0), (P_HG, 0.5), 0.6)),
    ])
    def test_integrates_to_one(self, media):
        _norm(media)

    def test_tab_orientation_forward(self):
        """A forward-peaked tabulated pdf (physics ct=+1 peak) must put
        its mass around wo == +d (tabphase.cpp physics-convention note)."""
        ct = np.linspace(-1, 1, 128)
        v = np.exp(6.0 * ct)
        media = _medium(P_TAB, tab_values=v)
        sid = jnp.zeros((1,), jnp.int32)
        fwd = phase_eval(media, sid, D_IN[None], D_IN[None])
        bwd = phase_eval(media, sid, D_IN[None], -D_IN[None])
        assert float(fwd[0]) > 20.0 * float(bwd[0])

    def test_hg_forward(self):
        media = _medium(P_HG, g=0.8)
        sid = jnp.zeros((1,), jnp.int32)
        fwd = phase_eval(media, sid, D_IN[None], D_IN[None])
        bwd = phase_eval(media, sid, D_IN[None], -D_IN[None])
        assert float(fwd[0]) > 10.0 * float(bwd[0])
