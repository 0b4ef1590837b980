"""Chi-square sampling validation (mirrors reference BSDF/warp chi2
tests, e.g. src/bsdfs/tests/test_roughconductor.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_amvpt_tpu.core import math as m
from mitsuba3_amvpt_tpu.core import microfacet as mf
from mitsuba3_amvpt_tpu.core import warp
from mitsuba3_amvpt_tpu.utils.chi2 import ChiSquareTest, SphericalDomain


def _make_si_factory(wi):
    import jax.numpy as jnp
    from mitsuba3_amvpt_tpu.render.records import SurfaceInteraction

    def mk(n):
        z = jnp.zeros((n, 3))
        e = jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1))
        return SurfaceInteraction(
            t=jnp.ones((n,)), p=z, n=e, sh_n=e,
            sh_s=jnp.tile(jnp.array([[1.0, 0, 0]]), (n, 1)),
            sh_t=jnp.tile(jnp.array([[0.0, 1, 0]]), (n, 1)),
            uv=jnp.zeros((n, 2)), wi=jnp.tile(wi[None], (n, 1)),
            prim_index=jnp.zeros((n,), jnp.int32),
            shape_index=jnp.zeros((n,), jnp.int32),
            material_index=jnp.zeros((n,), jnp.int32),
            emitter_index=jnp.full((n,), -1, jnp.int32))
    return mk


def run_chi2(sample_func, pdf_func, dim=2, seed=0, res=51, ires=8):
    t = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                      sample_dim=dim, sample_count=400_000, res=res,
                      ires=ires, seed=seed)
    ok = t.run()
    assert ok, t.messages
    return t


class TestWarpChi2:
    def test_cosine_hemisphere(self):
        run_chi2(warp.square_to_cosine_hemisphere,
                 warp.square_to_cosine_hemisphere_pdf)

    def test_uniform_sphere(self):
        run_chi2(warp.square_to_uniform_sphere,
                 warp.square_to_uniform_sphere_pdf)

    def test_uniform_cone(self):
        run_chi2(lambda u: warp.square_to_uniform_cone(u, 0.7),
                 lambda d: warp.square_to_uniform_cone_pdf(d, 0.7))

    def test_vmf(self):
        run_chi2(lambda u: warp.square_to_von_mises_fisher(u, 10.0),
                 lambda d: warp.square_to_von_mises_fisher_pdf(d, 10.0))


class TestVNDFChi2:
    @pytest.mark.parametrize("alpha,wi,res,ires", [
        (0.25, [0.0, 0.0, 1.0], 51, 8),
        (0.5, [0.6, 0.2, 0.6], 51, 8),
        # sharp grazing lobe needs finer pdf integration (the sampler is
        # exact; midpoint integration under-resolves the peak otherwise)
        (0.1, [0.8, 0.0, 0.4], 101, 24),
    ])
    def test_ggx_vndf(self, alpha, wi, res, ires):
        wi = m.normalize(jnp.asarray([wi]))

        def sample(u):
            w = jnp.broadcast_to(wi, (u.shape[0], 3))
            h, _ = mf.sample_vndf(w, u, alpha, alpha)
            return h

        def pdf(d):
            w = jnp.broadcast_to(wi, d.shape)
            return mf.pdf_vndf(w, d, alpha, alpha)

        run_chi2(sample, pdf, res=res, ires=ires, seed=1)


class TestBSDFChi2:
    """Sample/pdf consistency of the BSDF lobes through the registry
    (reference: per-plugin chi2 tests)."""

    def test_principled_multilobe(self):
        """principled with all reflective lobes enabled (3rd sample dim
        drives the stochastic lobe selection)."""
        import mitsuba3_amvpt_tpu as mt
        import jax.numpy as jnp
        from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                     bsdf_sample)
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "principled",
                           "base_color": [0.7, 0.3, 0.2],
                           "roughness": 0.4, "metallic": 0.3,
                           "clearcoat": 0.5, "sheen": 0.3,
                           "anisotropic": 0.3}},
        })
        wi = m.normalize(jnp.asarray([0.4, 0.1, 0.8], jnp.float32))
        mk = _make_si_factory(wi)

        def sample(u):
            bs = bsdf_sample(sc, mk(u.shape[0]), u[:, 2], u[:, :2])
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, mk(d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                          sample_count=300_000, res=41, seed=2)
        assert t.run(significance_level=0.002), t.messages

    @pytest.mark.parametrize("wi,tag", [([0.4, 0.1, 0.8], "front"),
                                        ([0.3, -0.2, -0.9], "back")])
    def test_principled_spec_trans(self, wi, tag):
        """principled with the refractive lobe on, both incidence sides
        (principled.cpp spec_trans; pdf must cover both hemispheres)."""
        import mitsuba3_amvpt_tpu as mt
        import jax.numpy as jnp
        from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                     bsdf_sample)
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "principled",
                           "base_color": [0.9, 0.7, 0.6],
                           "roughness": 0.5, "spec_trans": 0.7,
                           "eta": 1.5, "metallic": 0.2,
                           "clearcoat": 0.3}},
        })
        wi = m.normalize(jnp.asarray(wi, jnp.float32))
        mk = _make_si_factory(wi)

        def sample(u):
            bs = bsdf_sample(sc, mk(u.shape[0]), u[:, 2], u[:, :2])
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, mk(d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                          sample_count=400_000, res=41, seed=3)
        assert t.run(significance_level=0.002), t.messages

    @pytest.mark.parametrize("wi,tag", [([0.4, 0.1, 0.8], "front"),
                                        ([0.3, -0.2, -0.9], "back")])
    def test_principledthin(self, wi, tag):
        """principledthin: symmetric thin sheet with specular reflection,
        flipped-reflection transmission and diffuse transmission
        (principledthin.cpp)."""
        import mitsuba3_amvpt_tpu as mt
        import jax.numpy as jnp
        from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                     bsdf_sample)
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "principledthin",
                           "base_color": [0.8, 0.6, 0.5],
                           "roughness": 0.5, "spec_trans": 0.6,
                           "diff_trans": 0.6, "eta": 1.33,
                           "anisotropic": 0.3, "sheen": 0.2}},
        })
        wi = m.normalize(jnp.asarray(wi, jnp.float32))
        mk = _make_si_factory(wi)

        def sample(u):
            bs = bsdf_sample(sc, mk(u.shape[0]), u[:, 2], u[:, :2])
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, mk(d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                          sample_count=400_000, res=41, seed=5)
        assert t.run(significance_level=0.002), t.messages

    def _bsdf_chi2(self, mat_dict, wi, seed=0):
        import mitsuba3_amvpt_tpu as mt
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle", "bsdf": mat_dict},
        })
        from mitsuba3_amvpt_tpu.render.bsdfs import bsdf_eval_pdf, bsdf_sample
        from mitsuba3_amvpt_tpu.render.records import SurfaceInteraction
        wi = m.normalize(jnp.asarray(wi, jnp.float32))

        def mk_si(n):
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

        def sample(u):
            n = u.shape[0]
            si = mk_si(n)
            u1 = u[..., 0] * 0.0  # lobe selection not needed for 1-lobe
            bs = bsdf_sample(sc, si, u1, u)
            # rejected samples (pdf 0, e.g. wo below the horizon) carry
            # no mass — exclude from the histogram like the reference
            # harness drops zero-weight samples
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            n = d.shape[0]
            si = mk_si(n)
            _, p = bsdf_eval_pdf(sc, si, d)
            return p

        run_chi2(sample, pdf, seed=seed)

    def test_diffuse(self):
        self._bsdf_chi2({"type": "diffuse", "reflectance": 0.5},
                        [0.3, -0.3, 0.9])

    def test_roughconductor(self):
        self._bsdf_chi2({"type": "roughconductor", "material": "Al",
                         "alpha": 0.3}, [0.5, 0.1, 0.85])

    def test_roughconductor_grazing(self):
        self._bsdf_chi2({"type": "roughconductor", "material": "Al",
                         "alpha": 0.5}, [0.9, 0.0, 0.25], seed=3)

    @pytest.mark.parametrize("wi,tag", [
        ([0.3, 0.1, 0.95], "above"),
        ([0.3, 0.1, -0.95], "below"),
    ])
    def test_roughdielectric_both_sides(self, wi, tag):
        """Transmission + reflection over the full sphere (regression:
        eval once lacked Walter's half-vector sidedness masks and
        over-integrated by ~4%)."""
        import mitsuba3_amvpt_tpu as mt
        import jax.numpy as jnp
        from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                     bsdf_sample)
        sc = mt.load_dict({"type": "scene", "s": {
            "type": "rectangle",
            "bsdf": {"type": "roughdielectric", "alpha": 0.3,
                     "int_ior": 1.5, "ext_ior": 1.0}}})
        wi = m.normalize(jnp.asarray(wi, jnp.float32))
        mk = _make_si_factory(wi)

        def sample(u):
            bs = bsdf_sample(sc, mk(u.shape[0]), u[:, 2], u[:, :2])
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, mk(d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                          sample_count=300_000, res=41, ires=16, seed=5)
        assert t.run(significance_level=0.002), (tag, t.messages)


class TestPPlasticChi2:
    """pplastic (src/bsdfs/pplastic.cpp): GGX specular + diffuse with
    fixed mean-reflectance lobe weights (3-dim sample drives the
    stochastic lobe pick)."""

    @pytest.mark.parametrize("alpha,wi", [
        (0.06, [0.4, 0.1, 0.8]),
        (0.3, [0.1, -0.6, 0.7]),
    ])
    def test_pplastic(self, alpha, wi):
        import mitsuba3_amvpt_tpu as mt
        from mitsuba3_amvpt_tpu.render.bsdfs import (bsdf_eval_pdf,
                                                     bsdf_sample)
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "pplastic",
                           "diffuse_reflectance": 0.6,
                           "alpha": alpha}},
        })
        wi = m.normalize(jnp.asarray(wi, jnp.float32))
        mk = _make_si_factory(wi)

        def sample(u):
            bs = bsdf_sample(sc, mk(u.shape[0]), u[:, 2], u[:, :2])
            return jnp.where((bs.pdf > 0)[..., None], bs.wo, jnp.nan)

        def pdf(d):
            _, p = bsdf_eval_pdf(sc, mk(d.shape[0]), d)
            return p

        t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_dim=3,
                          sample_count=300_000, res=41, seed=5)
        assert t.run(significance_level=0.002), t.messages

    def test_pplastic_energy_and_reciprocity_shape(self):
        """Eval is reflection-only, below-horizon wo rejected, and the
        diffuse floor carries the (1-Fi)(1-Fo) dimming."""
        import mitsuba3_amvpt_tpu as mt
        from mitsuba3_amvpt_tpu.render.bsdfs import bsdf_eval_pdf
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "pplastic", "diffuse_reflectance": 0.6,
                           "alpha": 0.2}},
        })
        wi = m.normalize(jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
        mk = _make_si_factory(wi)
        wo_up = jnp.asarray([[0.0, 0.0, 1.0]])
        wo_dn = jnp.asarray([[0.0, 0.0, -1.0]])
        f_up, _ = bsdf_eval_pdf(sc, mk(1), wo_up)
        f_dn, _ = bsdf_eval_pdf(sc, mk(1), wo_dn)
        assert float(f_up[0, 0]) > 0.0
        assert float(jnp.abs(f_dn).max()) == 0.0
        # diffuse floor at normal incidence: (1-F0)^2 * 0.6/pi, F0~0.04
        import numpy as np
        approx = (1 - 0.0394) ** 2 * 0.6 / np.pi
        assert float(f_up[0, 0]) > approx * 0.9
