"""Measured-BSDF tests: tensor-file IO round-trip, chi2 sampling
consistency, and closed-form validation against the analytic GGX
conductor it was baked from (reference: src/bsdfs/measured.cpp +
src/bsdfs/tests/test_measured.py's role)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.core import math as m
from mitsuba3_amvpt_tpu.loader.tensor_file import (read_tensor_file,
                                                   write_tensor_file)
from mitsuba3_amvpt_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
from mitsuba3_amvpt_tpu.utils.measured_bake import bake_ggx_conductor

ALPHA = 0.3
ETA = (0.2, 0.92, 1.1)
K = (3.9, 2.45, 2.14)


@pytest.fixture(scope="module")
def bsdf_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rgl") / "ggx.bsdf")
    return bake_ggx_conductor(path, alpha=ALPHA, eta=ETA, k=K)


class TestTensorFile:
    def test_roundtrip(self, tmp_path):
        fields = {
            "a": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
            "b": np.array([3], np.uint8),
            "name": np.frombuffer(b"hello", dtype=np.uint8),
            "w": np.linspace(0, 1, 7).astype(np.float64),
        }
        p = str(tmp_path / "t.bsdf")
        write_tensor_file(p, fields)
        back = read_tensor_file(p)
        assert set(back) == set(fields)
        for k in fields:
            np.testing.assert_array_equal(back[k], fields[k])
            assert back[k].dtype == fields[k].dtype


def _scene(bsdf_file):
    return mt.load_dict({
        "type": "scene",
        "s": {"type": "rectangle",
              "bsdf": {"type": "measured", "filename": bsdf_file}},
    })


def _mk_si(sc, wi):
    from mitsuba3_amvpt_tpu.render.records import SurfaceInteraction

    def mk(n):
        z = jnp.zeros((n, 3))
        return SurfaceInteraction(
            t=jnp.ones((n,)), p=z,
            n=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
            sh_n=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
            sh_s=jnp.tile(jnp.array([[1.0, 0, 0]]), (n, 1)),
            sh_t=jnp.tile(jnp.array([[0.0, 1, 0]]), (n, 1)),
            uv=jnp.zeros((n, 2)),
            wi=jnp.tile(wi[None], (n, 1)),
            prim_index=jnp.zeros((n,), jnp.int32),
            shape_index=jnp.zeros((n,), jnp.int32),
            material_index=jnp.zeros((n,), jnp.int32),
            emitter_index=jnp.full((n,), -1, jnp.int32))
    return mk


class TestMeasuredGGX:
    @pytest.mark.parametrize("wi", [[0.0, 0.0, 1.0], [0.4, 0.1, 0.85],
                                    [0.7, -0.2, 0.55]])
    def test_chi2(self, bsdf_file, wi):
        from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                     bsdf_sample)
        sc = _scene(bsdf_file)
        wi = m.normalize(jnp.asarray(wi, jnp.float32))
        mk = _mk_si(sc, wi)

        def sample(u):
            bs = bsdf_sample(sc, mk(u.shape[0]), u[:, 0] * 0.0, u)
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, mk(d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=2,
                          sample_count=300_000, res=31, ires=8, seed=1)
        assert t.run(significance_level=0.002), t.messages

    def test_eval_matches_analytic_ggx(self, bsdf_file):
        """f*cos of the measured table vs the closed-form rough
        conductor it encodes (discretization tolerance)."""
        from mitsuba3_amvpt_tpu.render.bsdfs import bsdf_eval_pdf
        sc = _scene(bsdf_file)
        sc_ref = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "roughconductor", "alpha": ALPHA,
                           "eta": list(ETA), "k": list(K)}},
        })
        rng = np.random.default_rng(0)
        n = 4096
        wi = m.normalize(jnp.asarray([0.35, -0.1, 0.93], jnp.float32))
        mk = _mk_si(sc, wi)
        mk_ref = _mk_si(sc_ref, wi)
        # cosine-weighted wo samples over the upper hemisphere
        u = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        from mitsuba3_amvpt_tpu.core import warp
        wo = warp.square_to_cosine_hemisphere(jnp.asarray(u))
        f_meas, _ = bsdf_eval_pdf(sc, mk(n), wo)
        f_ref, _ = bsdf_eval_pdf(sc_ref, mk_ref(n), wo)
        # compare hemispherical averages (insensitive to table blur)
        mean_meas = np.asarray(f_meas).mean(0)
        mean_ref = np.asarray(f_ref).mean(0)
        np.testing.assert_allclose(mean_meas, mean_ref, rtol=0.08)
        # pointwise within a generous band away from grazing
        sel = np.asarray(m.cos_theta(wo)) > 0.15
        fm = np.asarray(f_meas)[sel].sum(-1)
        fr = np.asarray(f_ref)[sel].sum(-1)
        band = np.abs(fm - fr) / (fr + 0.05)
        assert np.quantile(band, 0.9) < 0.25

    @pytest.mark.slow
    def test_render_matches_roughconductor(self, bsdf_file):
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
            {"type": "measured", "filename": bsdf_file}),
            spp=48, max_depth=4, seed=0))
        b = np.asarray(mt.render(scene_with(
            {"type": "roughconductor", "alpha": ALPHA,
             "eta": list(ETA), "k": list(K)}),
            spp=48, max_depth=4, seed=0))
        # sphere region mean agreement
        assert abs(a.mean() - b.mean()) / b.mean() < 0.05
