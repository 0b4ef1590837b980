"""Sampler family tests (mirrors src/samplers/tests/): uniformity,
stratification quality, and unbiasedness at the render level."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.core.qmc import (kensler_permute, radical_inverse_2,
                                         sobol_2)
from mitsuba3_amvpt_tpu.core.rng import Sampler
from mitsuba3_amvpt_tpu.utils import scenes

# (mode, spp) — orthogonal needs spp = prime^2 for full stratification
# (the reference rounds spp up the same way, orthogonal.cpp:94-110)
MODES = ("stratified", "multijitter", "ldsampler", "orthogonal")
SPP = {"stratified": 16, "multijitter": 16, "ldsampler": 16,
       "orthogonal": 25}


class TestQMC:
    def test_permutation_bijective(self):
        for l in (2, 7, 16, 33, 64):
            i = jnp.arange(l, dtype=jnp.uint32)
            for p in (3, 7919, 123457):
                out = np.asarray(kensler_permute(i, l, np.uint32(p)))
                assert sorted(out.tolist()) == list(range(l)), (l, p)

    def test_radical_inverse(self):
        # rev(1) = 0.5, rev(2) = 0.25, rev(3) = 0.75
        v = np.asarray(radical_inverse_2(jnp.asarray([1, 2, 3], jnp.uint32)))
        assert np.allclose(v, [0.5, 0.25, 0.75])

    def test_sobol02_stratified(self):
        """(0,2) property: first 4 points fall one in each 2x2 cell."""
        i = jnp.arange(4, dtype=jnp.uint32)
        x = np.asarray(radical_inverse_2(i))
        y = np.asarray(sobol_2(i))
        cells = {(int(a * 2), int(b * 2)) for a, b in zip(x, y)}
        assert len(cells) == 4


class TestSamplerStats:
    @pytest.mark.parametrize("mode", MODES)
    def test_uniform_marginals(self, mode):
        spp, n_pix = SPP[mode], 2000
        pixel = jnp.repeat(jnp.arange(n_pix), spp)
        sample = jnp.tile(jnp.arange(spp), n_pix)
        s = Sampler.seed_stratified(5, pixel, sample, spp, mode=mode)
        for _ in range(3):
            u, s = s.next_1d()
            assert abs(float(u.mean()) - 0.5) < 0.005
        u2, s = s.next_2d()
        assert abs(float(u2.mean()) - 0.5) < 0.005

    @pytest.mark.parametrize("mode", MODES)
    def test_stratification_coverage(self, mode):
        """Within one pixel, spp 1D samples cover all strata."""
        spp = SPP[mode]
        pixel = jnp.zeros(spp, jnp.int32)
        sample = jnp.arange(spp)
        s = Sampler.seed_stratified(1, pixel, sample, spp, mode=mode)
        u, s = s.next_1d()
        u = np.sort(np.asarray(u))
        err = np.abs(u - (np.arange(spp) + 0.5) / spp).max()
        assert err < 1.0 / spp, (mode, err)

    @pytest.mark.parametrize("mode", MODES)
    def test_variance_beats_independent(self, mode):
        """Pixel-mean estimation: stratified patterns must beat
        independent sampling on a smooth integrand."""
        spp, n_pix = SPP[mode], 4000
        pixel = jnp.repeat(jnp.arange(n_pix), spp)
        sample = jnp.tile(jnp.arange(spp), n_pix)

        def pixel_var(s):
            u, s = s.next_2d()
            f = np.asarray(jnp.cos(2 * jnp.pi * u[:, 0]) * u[:, 1])
            est = f.reshape(n_pix, spp).mean(1)
            return est.var()

        v_strat = pixel_var(Sampler.seed_stratified(3, pixel, sample, spp,
                                                    mode=mode))
        v_indep = pixel_var(Sampler.seed(3, n_pix * spp))
        assert v_strat < 0.6 * v_indep, (mode, v_strat, v_indep)


class TestRenderUnbiased:
    def test_all_modes_same_mean(self):
        cb = mt.load_dict(scenes.cornell_box(res=24))
        ref = np.asarray(mt.render(cb, spp=64, max_depth=3,
                                   sampler="independent", seed=0)).mean()
        for mode in MODES:
            spp = 49 if mode == "orthogonal" else 64
            im = np.asarray(mt.render(cb, spp=spp, max_depth=3, sampler=mode,
                                      seed=0)).mean()
            assert im == pytest.approx(ref, rel=0.03), (mode, im, ref)
