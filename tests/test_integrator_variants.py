"""Cross-integrator consistency tests (reference
src/integrators/tests/test_integrators.py: same scene through multiple
integrators must agree) + AOV/moment/spectral coverage."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render.integrators import (render_aovs,
                                                   render_moment,
                                                   render_spectral)
from mitsuba3_amvpt_tpu.render.integrators.spectral import render_specfilm
from mitsuba3_amvpt_tpu.utils import scenes


@pytest.fixture(scope="module")
def cb():
    return mt.load_dict(scenes.cornell_box(res=24))


class TestCrossIntegrator:
    def test_direct_matches_path_depth2(self, cb):
        """Per-pixel median ratio is robust to the near-contact-light
        fireflies that give the cornell image mean ~5% seed variance."""
        a = np.asarray(mt.render(cb, spp=64, max_depth=2,
                                 integrator="direct", seed=0))
        b = np.mean([np.asarray(mt.render(cb, spp=64, max_depth=2,
                                          integrator="path", seed=s))
                     for s in (1, 2)], axis=0)
        lit = b.mean(-1) > 0.02
        ratio = a.mean(-1)[lit] / b.mean(-1)[lit]
        assert abs(np.median(ratio) - 1.0) < 0.05
        assert a.mean() == pytest.approx(b.mean(), rel=0.08)

    def test_spectral_close_to_rgb(self, cb):
        """Spectral transport of RGB-defined materials differs from RGB
        multiplication, but for this near-neutral scene stays close."""
        s = np.asarray(render_spectral(cb, spp=48, max_depth=3, seed=0))
        r = np.asarray(mt.render(cb, spp=48, max_depth=3, seed=0))
        assert np.isfinite(s).all()
        assert s.mean() == pytest.approx(r.mean(), rel=0.15)

    def test_spectral_furnace_white(self):
        fu = mt.load_dict(scenes.furnace(albedo=0.8, res=12))
        img = np.asarray(render_spectral(fu, spp=48, max_depth=12,
                                         rr_depth=24, seed=1))
        assert np.allclose(img[0, 0], 1.0, atol=0.02)      # exact white
        assert np.allclose(img[6, 6], img[6, 6].mean(), atol=0.01)  # neutral


class TestSpecfilm:
    def test_box_bands_flat_spectrum(self):
        """A constant emitter with rgb (v,v,v) upsamples to the flat
        spectrum v (partition-of-unity basis), so each box-SRF channel
        must read v * band_width exactly (specfilm.cpp channel
        semantics: integral L(l) SRF(l) dl)."""
        v = 0.5
        d = {"type": "scene",
             "sensor": {"type": "perspective", "fov": 40,
                        "film": {"type": "hdrfilm", "width": 4, "height": 4,
                                 "rfilter": {"type": "box"}}},
             "env": {"type": "constant", "radiance": v}}
        sc = mt.load_dict(d)
        srfs = [([449.99, 450.0, 550.0, 550.01], [0.0, 1.0, 1.0, 0.0]),
                ([549.99, 550.0, 650.0, 650.01], [0.0, 1.0, 1.0, 0.0])]
        img = np.asarray(render_specfilm(sc, srfs, spp=64, max_depth=2,
                                         seed=0))
        assert img.shape == (4, 4, 2)
        assert img == pytest.approx(v * 100.0, rel=0.02)

    def test_cie_y_channel(self):
        """cie_y SRF on a flat unit spectrum = the CIE-Y integral
        (~106.857, spectrum.h MI_CIE_Y_NORMALIZATION)."""
        d = {"type": "scene",
             "sensor": {"type": "perspective", "fov": 40,
                        "film": {"type": "hdrfilm", "width": 2, "height": 2,
                                 "rfilter": {"type": "box"}}},
             "env": {"type": "constant", "radiance": 1.0}}
        sc = mt.load_dict(d)
        img = np.asarray(render_specfilm(sc, ["cie_y"], spp=128,
                                         max_depth=2, seed=1))
        assert img.shape == (2, 2, 1)
        assert img == pytest.approx(106.857, rel=0.03)


class TestAOV:
    def test_aov_channels(self, cb):
        out = render_aovs(cb, aovs=("depth", "sh_normal", "albedo",
                                    "position", "uv", "prim_index"), spp=2)
        assert out["depth"].shape[-1] == 1
        d = np.asarray(out["depth"])
        assert (d > 0).mean() > 0.9 and np.isfinite(d).all()
        n = np.asarray(out["sh_normal"])
        lens = np.linalg.norm(n, axis=-1)
        # edge pixels average normals of different surfaces across spp
        # samples (shorter vectors) — interior pixels must be unit
        assert (np.abs(lens[lens > 0.5] - 1.0) < 0.05).mean() > 0.85
        alb = np.asarray(out["albedo"])
        assert alb.max() <= 1.0 and alb.min() >= 0.0

    def test_moment_variance_positive(self, cb):
        mean, m2 = render_moment(cb, spp=16, max_depth=3)
        var = np.asarray(m2) - np.asarray(mean) ** 2
        # sample variance estimate must be non-negative up to fp noise
        assert (var > -1e-3).all()
        assert var.max() > 0.0


class TestDepthIntegrator:
    def test_depth_values(self, cb):
        img = np.asarray(mt.render(cb, spp=4, integrator="depth", seed=0))
        d = img[..., 0]
        # camera at z=3.9, box front plane at z=1 -> depths in [2.9, ~7]
        hit = d > 0
        assert hit.mean() > 0.9
        assert d[hit].min() > 1.5 and d[hit].max() < 8.0
