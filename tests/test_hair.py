"""Hair BSDF tests (src/bsdfs/tests/test_hair.py parity): white furnace
energy conservation, per-lane importance-sampling weight, chi2
sample/pdf consistency, loader defaults."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.core import math as m
from mitsuba3_amvpt_tpu.core import warp
from mitsuba3_amvpt_tpu.render.bsdfs import bsdf_eval_pdf, bsdf_sample
from mitsuba3_amvpt_tpu.utils.chi2 import ChiSquareTest, SphericalDomain


def _scene(**hair):
    return mt.load_dict({
        "type": "scene",
        "s": {"type": "rectangle",
              "bsdf": dict({"type": "hair"}, **hair)},
    })


def _mk_si(wi_arr):
    from mitsuba3_amvpt_tpu.render.records import SurfaceInteraction
    n = wi_arr.shape[0]
    z = jnp.zeros((n, 3))
    return SurfaceInteraction(
        t=jnp.ones((n,)), p=z,
        n=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
        sh_n=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
        sh_s=jnp.tile(jnp.array([[1.0, 0, 0]]), (n, 1)),
        sh_t=jnp.tile(jnp.array([[0.0, 1, 0]]), (n, 1)),
        uv=jnp.zeros((n, 2)),
        wi=wi_arr,
        prim_index=jnp.zeros((n,), jnp.int32),
        shape_index=jnp.zeros((n,), jnp.int32),
        material_index=jnp.zeros((n,), jnp.int32),
        emitter_index=jnp.full((n,), -1, jnp.int32))


@pytest.mark.parametrize("rough", [0.1, 0.55, 0.99])
def test_white_furnace(rough):
    """∫ eval dω == 1 per channel for sigma_a = 0 (test02)."""
    sc = _scene(longitudinal_roughness=rough, azimuthal_roughness=rough,
                sigma_a=0.0)
    rng = np.random.default_rng(0)
    n = 1 << 21
    wi = warp.square_to_uniform_sphere(jnp.asarray(
        rng.uniform(size=(n, 2)), jnp.float32))
    wo = warp.square_to_uniform_sphere(jnp.asarray(
        rng.uniform(size=(n, 2)), jnp.float32))
    f, _ = bsdf_eval_pdf(sc, _mk_si(wi), wo)
    est = np.asarray(f).mean(0) * 4.0 * np.pi
    np.testing.assert_allclose(est, 1.0, atol=2e-2)


@pytest.mark.parametrize("rough", [0.1, 0.55, 0.99])
def test_importance_sample_weight(rough):
    """Per-lane sample weight luminance == 1 for sigma_a = 0 (test04):
    the lobe-selection pdf is luminance-proportional, so eval/pdf is
    exactly the total attenuation Σ a_p == 1."""
    sc = _scene(longitudinal_roughness=rough, azimuthal_roughness=rough,
                sigma_a=0.0)
    rng = np.random.default_rng(1)
    n = 1 << 17
    wi = warp.square_to_uniform_sphere(jnp.asarray(
        rng.uniform(size=(n, 2)), jnp.float32))
    u1 = jnp.asarray(rng.uniform(size=(n,)), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    bs = bsdf_sample(sc, _mk_si(wi), u1, u2)
    w = np.asarray(bs.weight)
    ok = np.asarray(bs.pdf) > 0
    assert ok.mean() > 0.99
    np.testing.assert_allclose(w[ok], 1.0, atol=5e-3)


@pytest.mark.parametrize("wi", [[0.25, 0.6, 0.75], [0.0, 0.0, 1.0],
                                [-0.4, -0.4, -0.2]])
def test_chi2(wi):
    sc = _scene(longitudinal_roughness=0.4, azimuthal_roughness=0.6)
    wi = m.normalize(jnp.asarray(wi, jnp.float32))

    def sample(u):
        # u1 (lobe pick) must come from the harness's stream too — a
        # hashed-index side stream correlates at the ~1% level and
        # shows up as a chi2 excess
        n = u.shape[0]
        si = _mk_si(jnp.tile(wi[None], (n, 1)))
        bs = bsdf_sample(sc, si, u[:, 2], u[:, :2])
        return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

    def pdf(d):
        si = _mk_si(jnp.tile(wi[None], (d.shape[0], 1)))
        _, p = bsdf_eval_pdf(sc, si, d)
        return p

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                      sample_count=400_000, res=31, ires=8, seed=3)
    assert t.run(significance_level=0.002), t.messages


def test_pigmentation_defaults():
    """Default melanin mix -> sigma_a = 1.3*eu + 0.2*pheo
    (hair.cpp:740-760)."""
    sc = _scene()
    sig = np.asarray(sc.materials.albedo[0])
    expect = 1.3 * np.array([0.419, 0.697, 1.37]) \
        + 0.2 * np.array([0.187, 0.4, 1.05])
    np.testing.assert_allclose(sig, expect, rtol=1e-5)
    # absorption darkens + reddens vs the white-furnace case
    rng = np.random.default_rng(2)
    n = 1 << 15
    wi = warp.square_to_uniform_sphere(jnp.asarray(
        rng.uniform(size=(n, 2)), jnp.float32))
    u1 = jnp.asarray(rng.uniform(size=(n,)), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    bs = bsdf_sample(sc, _mk_si(wi), u1, u2)
    w = np.asarray(bs.weight)
    ok = np.asarray(bs.pdf) > 0
    assert w[ok].mean() < 0.9
    assert w[ok, 0].mean() > w[ok, 2].mean()   # red survives melanin
