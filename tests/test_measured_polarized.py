"""measured_polarized pBSDF tests (src/bsdfs/tests/
test_measured_polarized.py role): constant-tensor analytic checks,
wavelength interpolation, chi2 of the diffuse/GGX mixture sampler, and
stokes-integrator consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.core import math as m
from mitsuba3_amvpt_tpu.core import warp
from mitsuba3_amvpt_tpu.render.bsdfs import bsdf_eval_pdf, bsdf_sample
from mitsuba3_amvpt_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
from mitsuba3_amvpt_tpu.utils.measured_bake import bake_constant_pbsdf

M00 = (0.20, 0.25, 0.30)


@pytest.fixture(scope="module")
def pbsdf_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pbsdf") / "const.pbsdf")
    return bake_constant_pbsdf(path, m00=M00)


def _scene(pbsdf_file, **kw):
    return mt.load_dict({
        "type": "scene",
        "s": {"type": "rectangle",
              "bsdf": dict({"type": "measured_polarized",
                            "filename": pbsdf_file}, **kw)},
    })


def _mk_si(sc, wi, n):
    from tests.test_hair import _mk_si as mk
    return mk(jnp.tile(jnp.asarray(wi, jnp.float32)[None], (n, 1)))


class TestScalar:
    def test_eval_constant(self, pbsdf_file):
        """Constant M00 tensor -> f = M00 per channel (x cos)."""
        sc = _scene(pbsdf_file)
        wi = m.normalize(jnp.asarray([0.3, -0.2, 0.9], jnp.float32))
        rng = np.random.default_rng(0)
        n = 1024
        wo = warp.square_to_cosine_hemisphere(
            jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32))
        f, pdf = bsdf_eval_pdf(sc, _mk_si(sc, wi, n), wo)
        co = np.asarray(m.cos_theta(wo))[:, None]
        np.testing.assert_allclose(np.asarray(f), np.array(M00) * co,
                                   rtol=1e-4, atol=1e-5)
        assert (np.asarray(pdf) > 0).all()

    def test_fixed_wavelength(self, pbsdf_file):
        """`wavelength` override reads one band for all channels
        (measured_polarized.cpp:118-121)."""
        sc = _scene(pbsdf_file, wavelength=550.0)
        wi = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
        f, _ = bsdf_eval_pdf(sc, _mk_si(sc, wi, 4), wo)
        np.testing.assert_allclose(np.asarray(f), M00[1], rtol=1e-4)

    def test_chi2(self, pbsdf_file):
        sc = _scene(pbsdf_file)
        wi = m.normalize(jnp.asarray([0.4, 0.2, 0.6], jnp.float32))

        def sample(u):
            n = u.shape[0]
            bs = bsdf_sample(sc, _mk_si(sc, wi, n), u[:, 2], u[:, :2])
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, _mk_si(sc, wi, d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                          sample_count=300_000, res=31, ires=8, seed=5)
        assert t.run(significance_level=0.002), t.messages

    def test_render_matches_diffuse(self, pbsdf_file):
        """Constant M00 == diffuse with albedo = pi * M00."""
        def scene_with(bsdf):
            return mt.load_dict({
                "type": "scene",
                "sensor": {"type": "perspective", "fov": 45,
                           "to_world": {"lookat": {
                               "origin": [0, 0, 4], "target": [0, 0, 0],
                               "up": [0, 1, 0]}},
                           "film": {"type": "hdrfilm", "width": 24,
                                    "height": 24,
                                    "rfilter": {"type": "box"}}},
                "light": {"type": "constant", "radiance": 1.0},
                "ball": {"type": "sphere", "radius": 1.0, "bsdf": bsdf},
            })
        a = np.asarray(mt.render(scene_with(
            {"type": "measured_polarized", "filename": pbsdf_file}),
            spp=32, max_depth=4, seed=0))
        b = np.asarray(mt.render(scene_with(
            {"type": "diffuse",
             "reflectance": [np.pi * c for c in M00]}),
            spp=32, max_depth=4, seed=0))
        assert abs(a.mean() - b.mean()) / b.mean() < 0.05


class TestPolarized:
    def test_stokes_s0_consistency(self, tmp_path):
        """Depolarizing tensor: stokes S0 == scalar render; polarizing
        tensor (dop>0) produces nonzero S1."""
        from mitsuba3_amvpt_tpu.render.integrators.stokes import \
            render_stokes

        def scene_with(f):
            return mt.load_dict({
                "type": "scene",
                "sensor": {"type": "perspective", "fov": 45,
                           "to_world": {"lookat": {
                               "origin": [0, 0, 4], "target": [0, 0, 0],
                               "up": [0, 1, 0]}},
                           "film": {"type": "hdrfilm", "width": 16,
                                    "height": 16,
                                    "rfilter": {"type": "box"}}},
                "light": {"type": "constant", "radiance": 1.0},
                "ball": {"type": "sphere", "radius": 1.0,
                         "bsdf": {"type": "measured_polarized",
                                  "filename": f}},
            })
        f_dep = bake_constant_pbsdf(str(tmp_path / "dep.pbsdf"), m00=M00)
        sc = scene_with(f_dep)
        stokes = np.asarray(render_stokes(sc, spp=16, seed=0,
                                          max_depth=3))
        scal = np.asarray(mt.render(sc, spp=16, max_depth=3, seed=0))
        np.testing.assert_allclose(stokes[..., 0], scal,
                                   rtol=2e-2, atol=2e-3)
        assert np.abs(stokes[..., 1:]).max() < 1e-4

        f_pol = bake_constant_pbsdf(str(tmp_path / "pol.pbsdf"),
                                    m00=M00, dop=0.8)
        stokes_p = np.asarray(render_stokes(scene_with(f_pol), spp=16,
                                            seed=0, max_depth=3))
        assert np.abs(stokes_p[..., 1]).max() > 1e-3
