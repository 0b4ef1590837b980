"""Core math layer tests (mirrors reference src/core/tests/test_warp.py,
test_distr_1d.py, test_distr_2d.py structure)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba3_amvpt_tpu.core import math as m
from mitsuba3_amvpt_tpu.core import warp, rng, fresnel, microfacet
from mitsuba3_amvpt_tpu.core.distr import (ContinuousDistribution,
                                           DiscreteDistribution, Marginal2D)


def _uniform2(n, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.random((n, 2), np.float32))


class TestFrames:
    def test_coordinate_system_orthonormal(self, rng):
        n = m.normalize(jnp.asarray(rng.normal(size=(100, 3)), jnp.float32))
        s, t = m.coordinate_system(n)
        assert np.allclose(m.dot(s, t), 0, atol=1e-5)
        assert np.allclose(m.dot(s, n), 0, atol=1e-5)
        assert np.allclose(m.dot(t, n), 0, atol=1e-5)
        assert np.allclose(m.norm(s), 1, atol=1e-5)
        # right-handed: cross(s, t) == n
        assert np.allclose(jnp.cross(s, t), n, atol=1e-5)

    def test_to_local_roundtrip(self, rng):
        n = m.normalize(jnp.asarray(rng.normal(size=(50, 3)), jnp.float32))
        s, t = m.coordinate_system(n)
        v = m.normalize(jnp.asarray(rng.normal(size=(50, 3)), jnp.float32))
        vl = m.frame_to_local(n, s, t, v)
        vw = m.frame_to_world(n, s, t, vl)
        assert np.allclose(vw, v, atol=1e-5)


class TestWarp:
    """MC pdf consistency: histogram of samples matches analytic pdf."""

    def _check_pdf_integral(self, sample_fn, pdf_fn, n=200_000):
        """pdf must integrate to 1 over the sphere via uniform MC."""
        u = _uniform2(n)
        d = warp.square_to_uniform_sphere(u)
        pdf = pdf_fn(d)
        integral = float(jnp.mean(pdf) * 4 * jnp.pi)
        assert abs(integral - 1.0) < 0.02, integral

    def test_cosine_hemisphere(self):
        self._check_pdf_integral(warp.square_to_cosine_hemisphere,
                                 warp.square_to_cosine_hemisphere_pdf)
        d = warp.square_to_cosine_hemisphere(_uniform2(10000))
        assert np.all(np.asarray(d[..., 2]) >= 0)
        assert np.allclose(m.norm(d), 1, atol=1e-5)
        # E[cos] = 2/3 under cosine-weighted sampling
        assert abs(float(jnp.mean(d[..., 2])) - 2 / 3) < 0.01

    def test_uniform_sphere(self):
        d = warp.square_to_uniform_sphere(_uniform2(100000))
        assert np.allclose(m.norm(d), 1, atol=1e-5)
        assert abs(float(jnp.mean(d[..., 2]))) < 0.02
        self._check_pdf_integral(None, warp.square_to_uniform_sphere_pdf)

    def test_uniform_cone(self):
        ct = 0.8
        d = warp.square_to_uniform_cone(_uniform2(100000), ct)
        assert np.all(np.asarray(d[..., 2]) >= ct - 1e-5)
        self._check_pdf_integral(None,
                                 lambda v: warp.square_to_uniform_cone_pdf(v, ct))

    def test_uniform_triangle(self):
        b = warp.square_to_uniform_triangle(_uniform2(100000))
        b = np.asarray(b)
        assert np.all(b >= 0) and np.all(b.sum(-1) <= 1 + 1e-6)
        # barycentric means = 1/3
        assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=0.01)

    def test_disk_concentric(self):
        p = np.asarray(warp.square_to_uniform_disk_concentric(_uniform2(100000)))
        r2 = (p ** 2).sum(-1)
        assert np.all(r2 <= 1 + 1e-6)
        assert abs(r2.mean() - 0.5) < 0.01  # E[r^2] = 1/2 for uniform disk

    def test_beckmann_pdf_integral(self):
        alpha = 0.3
        self._check_pdf_integral(
            None, lambda v: warp.square_to_beckmann_pdf(v, alpha))


class TestRng:
    def test_tea_reference_values(self):
        # determinism + decorrelation sanity
        a0, b0 = rng.sample_tea_32(jnp.uint32(1), jnp.uint32(1))
        a1, _ = rng.sample_tea_32(jnp.uint32(1), jnp.uint32(2))
        assert int(a0) != int(a1)
        a0b, _ = rng.sample_tea_32(jnp.uint32(1), jnp.uint32(1))
        assert int(a0) == int(a0b)

    def test_sampler_uniformity(self):
        s = rng.Sampler.seed(0, 100000)
        u, s = s.next_1d()
        u = np.asarray(u)
        assert 0 <= u.min() and u.max() < 1
        assert abs(u.mean() - 0.5) < 0.005
        assert abs(np.var(u) - 1 / 12) < 0.005

    def test_sampler_replay_determinism(self):
        """PRB linchpin: re-seeding reproduces the exact same stream."""
        s1 = rng.Sampler.seed(42, 1000)
        a, s1 = s1.next_2d()
        b, s1 = s1.next_1d()
        s2 = rng.Sampler.seed(42, 1000)
        a2, s2 = s2.next_2d()
        b2, s2 = s2.next_1d()
        assert np.array_equal(np.asarray(a), np.asarray(a2))
        assert np.array_equal(np.asarray(b), np.asarray(b2))

    def test_dims_decorrelated(self):
        s = rng.Sampler.seed(7, 50000)
        u1, s = s.next_1d()
        u2, s = s.next_1d()
        c = np.corrcoef(np.asarray(u1), np.asarray(u2))[0, 1]
        assert abs(c) < 0.01


class TestDistr:
    def test_discrete(self):
        d = DiscreteDistribution.from_pmf(jnp.asarray([1.0, 3.0, 0.0, 4.0]))
        u = jnp.asarray(np.random.default_rng(0).random(100000, np.float32))
        idx = np.asarray(d.sample(u))
        counts = np.bincount(idx, minlength=4) / len(idx)
        assert np.allclose(counts, [1 / 8, 3 / 8, 0, 4 / 8], atol=0.01)
        assert float(d.pmf_normalized(jnp.asarray(1))) == pytest.approx(3 / 8)

    def test_discrete_sample_reuse(self):
        d = DiscreteDistribution.from_pmf(jnp.asarray([1.0, 1.0]))
        u = jnp.asarray([0.25, 0.75])
        idx, u_re = d.sample_reuse(u)
        assert np.array_equal(np.asarray(idx), [0, 1])
        assert np.allclose(np.asarray(u_re), [0.5, 0.5], atol=1e-5)

    def test_continuous(self):
        nodes = jnp.asarray([0.0, 1.0, 2.0])
        pdf = jnp.asarray([0.0, 2.0, 0.0])
        d = ContinuousDistribution.from_pdf(nodes, pdf)
        assert float(d.total) == pytest.approx(2.0)
        u = jnp.asarray(np.random.default_rng(1).random(200000, np.float32))
        xs, p = d.sample(u)
        assert abs(float(jnp.mean(xs)) - 1.0) < 0.01
        # eval matches normalized tent
        assert float(d.eval_pdf_normalized(jnp.asarray(1.0))) == pytest.approx(1.0, rel=1e-4)

    def test_marginal2d_consistency(self, rng):
        data = jnp.asarray(rng.random((16, 32), np.float32) + 0.1)
        w = Marginal2D.from_data(data)
        u = jnp.asarray(rng.random((50000, 2), np.float32))
        uv, pdf = w.sample(u)
        uv_np = np.asarray(uv)
        assert uv_np.min() >= 0 and uv_np.max() <= 1
        # pdf at the sampled location matches the sample pdf
        assert np.allclose(np.asarray(w.pdf(uv)), np.asarray(pdf), rtol=1e-4)
        # mean pdf over its own samples ~ E_p[p]; integral of pdf = 1:
        inv = 1.0 / np.asarray(pdf)
        assert abs(inv.mean() - 1.0) < 0.02


class TestFresnel:
    def test_dielectric_normal_incidence(self):
        F, _, _, _ = fresnel.fresnel_dielectric(jnp.asarray(1.0), 1.5)
        assert float(F) == pytest.approx(0.04, abs=1e-3)

    def test_dielectric_tir(self):
        # from inside at grazing: total internal reflection
        F, cos_t, _, _ = fresnel.fresnel_dielectric(jnp.asarray(-0.2), 1.5)
        assert float(F) == 1.0

    def test_dielectric_energy(self):
        F, _, _, _ = fresnel.fresnel_dielectric(jnp.asarray(0.5), 1.5)
        assert 0.0 <= float(F) <= 1.0

    def test_conductor(self):
        F = fresnel.fresnel_conductor(jnp.asarray(1.0), jnp.asarray(0.2),
                                      jnp.asarray(3.0))
        assert 0.9 < float(F) <= 1.0  # metals reflect strongly


class TestMicrofacet:
    def test_ndf_normalization(self):
        """Integral of D(h) cos(h) over hemisphere = 1."""
        u = _uniform2(400000)
        d = warp.square_to_uniform_hemisphere(u)
        for alpha in (0.1, 0.5, 1.0):
            D = microfacet.ndf(d, alpha, alpha)
            integral = float(jnp.mean(D * d[..., 2]) * 2 * jnp.pi)
            assert abs(integral - 1.0) < 0.05, (alpha, integral)

    def test_vndf_pdf_integral(self):
        """pdf_vndf integrates to 1 over the hemisphere."""
        wi = m.normalize(jnp.asarray([[0.4, -0.2, 0.8]]))
        u = _uniform2(400000)
        d = warp.square_to_uniform_sphere(u)
        pdf = microfacet.pdf_vndf(wi, d, 0.3, 0.3)
        integral = float(jnp.mean(pdf) * 4 * jnp.pi)
        assert abs(integral - 1.0) < 0.05, integral

    def test_vndf_sample_matches_pdf(self):
        wi = m.normalize(jnp.asarray([[0.3, 0.1, 0.9]]))
        u = _uniform2(2000)
        h, pdf = microfacet.sample_vndf(jnp.broadcast_to(wi, (2000, 3)), u, 0.4, 0.4)
        pdf2 = microfacet.pdf_vndf(jnp.broadcast_to(wi, (2000, 3)), h, 0.4, 0.4)
        assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=2e-3)
        assert np.all(np.asarray(h[..., 2]) > 0)
