"""Spectrum-plugin parity (src/spectra/{regular,irregular,blackbody,
uniform,d65}.cpp): tabulated spectra convert to linear sRGB by CIE/D65
integration; inline "wl:v" strings parse like the XML loader's."""

import numpy as np

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.loader.dict_loader import _spectrum3


class TestTabulated:
    def test_flat_regular_is_white(self):
        rgb = _spectrum3({"type": "regular", "lambda_min": 360,
                          "lambda_max": 830, "values": [1.0, 1.0]})
        np.testing.assert_allclose(rgb, 1.0, atol=2e-3)

    def test_scaled_flat(self):
        rgb = _spectrum3({"type": "regular", "lambda_min": 360,
                          "lambda_max": 830, "values": "0.25 0.25 0.25"})
        np.testing.assert_allclose(rgb, 0.25, atol=2e-3)

    def test_irregular_red(self):
        rgb = _spectrum3({"type": "irregular",
                          "wavelengths": [500, 580, 620, 700],
                          "values": [0, 0, 1, 1]})
        assert rgb[0] > 0.6 and rgb[1] < 0.1 and rgb[2] < 0.05

    def test_irregular_blue(self):
        rgb = _spectrum3({"type": "irregular",
                          "wavelengths": [380, 480, 520, 830],
                          "values": [1, 1, 0, 0]})
        assert rgb[2] > 0.5 and rgb[0] < 0.45

    def test_inline_string(self):
        rgb = _spectrum3("400:0.5, 700:0.5")
        np.testing.assert_allclose(rgb, 0.5, atol=5e-3)

    def test_blackbody_warm(self):
        warm = _spectrum3({"type": "blackbody", "temperature": 2700.0})
        cool = _spectrum3({"type": "blackbody", "temperature": 9000.0})
        assert warm[0] / max(warm[2], 1e-9) > cool[0] / max(cool[2], 1e-9)

    def test_scene_load(self):
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "rectangle",
                  "bsdf": {"type": "diffuse", "reflectance": {
                      "type": "regular", "lambda_min": 400,
                      "lambda_max": 700, "values": "0.5 0.5"}}},
        })
        alb = np.asarray(sc.materials.albedo[0])
        np.testing.assert_allclose(alb, 0.5, atol=0.01)
