"""Volumetric path tracer tests (mirrors src/media/tests +
src/integrators/tests volpath coverage) with analytic homogeneous-fog
ground truths."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt


def fog_scene(sigma_t=0.3, albedo=0.0, g=None, radiance=2.0, refl=0.0):
    phase = {"type": "hg", "g": g} if g is not None else {"type": "isotropic"}
    return {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 10,
                   "medium": {"type": "homogeneous", "sigma_t": sigma_t,
                              "albedo": albedo, "phase": phase},
                   "to_world": {"lookat": {"origin": [0, 0, 4],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": 16, "height": 16,
                            "rfilter": {"type": "box"}}},
        "wall": {"type": "rectangle",
                 "to_world": {"ops": [{"scale": [3, 3, 1]}]},
                 "bsdf": {"type": "diffuse", "reflectance": refl},
                 "emitter": {"type": "area", "radiance": radiance}},
    }


class TestHomogeneousFog:
    def test_pure_absorption_beer_lambert(self):
        """albedo=0: L = Le * exp(-sigma_t * d), d = 4."""
        sc = mt.load_dict(fog_scene(sigma_t=0.3, albedo=0.0))
        img = np.asarray(mt.render(sc, spp=128, max_depth=3,
                                   integrator="volpath", seed=0))
        expected = 2.0 * np.exp(-0.3 * 4.0)
        assert img.mean() == pytest.approx(expected, rel=0.05)

    def test_scattering_adds_inscatter(self):
        sc_a = mt.load_dict(fog_scene(albedo=0.0))
        sc_s = mt.load_dict(fog_scene(albedo=0.8))
        a = np.asarray(mt.render(sc_a, spp=64, max_depth=6,
                                 integrator="volpath", seed=0)).mean()
        s = np.asarray(mt.render(sc_s, spp=64, max_depth=6,
                                 integrator="volpath", seed=0)).mean()
        assert s > a * 1.1

    def test_vacuum_falls_back_to_path(self):
        """Scene without media: volpath must equal path exactly."""
        from mitsuba3_amvpt_tpu.utils import scenes
        cb = mt.load_dict(scenes.cornell_box(res=16))
        a = np.asarray(mt.render(cb, spp=16, max_depth=3,
                                 integrator="volpath", seed=3))
        b = np.asarray(mt.render(cb, spp=16, max_depth=3,
                                 integrator="path", seed=3))
        assert np.array_equal(a, b)

    def test_hg_phase_anisotropy(self):
        """Forward-scattering fog (g>0) in-scatters more of the forward
        emissive wall than backward-scattering (g<0)."""
        f = np.asarray(mt.render(mt.load_dict(fog_scene(albedo=0.8, g=0.6)),
                                 spp=64, max_depth=4, integrator="volpath",
                                 seed=1)).mean()
        b = np.asarray(mt.render(mt.load_dict(fog_scene(albedo=0.8, g=-0.6)),
                                 spp=64, max_depth=4, integrator="volpath",
                                 seed=1)).mean()
        assert f > b

    def test_spectral_extinction(self):
        """Per-channel sigma_t tints the transmitted light."""
        d = fog_scene()
        d["sensor"]["medium"]["sigma_t"] = [0.5, 0.2, 0.05]
        d["sensor"]["medium"]["albedo"] = 0.0
        sc = mt.load_dict(d)
        img = np.asarray(mt.render(sc, spp=128, max_depth=3,
                                   integrator="volpath", seed=0))
        mean = img.reshape(-1, 3).mean(0)
        exp = 2.0 * np.exp(-np.array([0.5, 0.2, 0.05]) * 4.0)
        assert np.allclose(mean, exp, rtol=0.1), (mean, exp)
