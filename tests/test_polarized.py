"""Polarized rendering tests: Mueller calculus identities, optical
elements in transport, and the stokes integrator (reference:
render/mueller.h, src/bsdfs/{polarizer,retarder,circular}.cpp,
src/integrators/stokes.cpp, src/render/tests/test_mueller.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.core import fresnel as fr
from mitsuba3_amvpt_tpu.core import mueller as mu
from mitsuba3_amvpt_tpu.render.integrators.stokes import render_stokes


class TestMuellerCalculus:
    def test_malus_law(self):
        S = jnp.array([1.0, 0, 0, 0])
        P0 = mu.linear_polarizer(1.0)
        for deg in [0.0, 30.0, 45.0, 60.0, 90.0]:
            th = np.deg2rad(deg)
            P1 = mu.rotated_element(jnp.asarray(th, jnp.float32),
                                    mu.linear_polarizer(1.0))
            out = P1 @ (P0 @ S)
            assert float(out[0]) == pytest.approx(0.5 * np.cos(th) ** 2,
                                                  abs=1e-6)

    def test_quarter_wave_plate_circular(self):
        """H-polarized light through a QWP at 45 deg becomes circular."""
        S = jnp.array([1.0, 1.0, 0, 0])
        qwp = mu.rotated_element(jnp.asarray(np.pi / 4, jnp.float32),
                                 mu.linear_retarder(
                                     jnp.asarray(np.pi / 2, jnp.float32)))
        out = qwp @ S
        assert float(abs(out[1])) < 1e-6 and float(abs(out[2])) < 1e-6
        assert float(abs(out[3])) == pytest.approx(1.0, abs=1e-6)

    def test_specular_reflection_matches_scalar_fresnel(self):
        ci = jnp.asarray([0.95, 0.7, 0.4, 0.1], jnp.float32)
        M = mu.specular_reflection(ci, jnp.full((4,), 1.5))
        F, _, _, _ = fr.fresnel_dielectric(ci, jnp.full((4,), 1.5))
        np.testing.assert_allclose(np.asarray(M[..., 0, 0]),
                                   np.asarray(F), rtol=1e-5)
        # conductor with complex IOR
        Mc = mu.specular_reflection(jnp.asarray(0.6), jnp.asarray(0.2),
                                    jnp.asarray(3.9))
        Fc = fr.fresnel_conductor(jnp.asarray(0.6), jnp.asarray(0.2),
                                  jnp.asarray(3.9))
        assert float(Mc[0, 0]) == pytest.approx(float(Fc), rel=1e-4)

    def test_brewster_full_polarization(self):
        tb = np.arctan(1.5)
        M = mu.specular_reflection(jnp.asarray(np.cos(tb), jnp.float32),
                                   jnp.asarray(1.5))
        dop = float(abs(M[0, 1]) / M[0, 0])
        assert dop == pytest.approx(1.0, abs=1e-4)

    def test_transmission_energy(self):
        for ci in [0.95, 0.6, 0.3]:
            T = mu.specular_transmission(jnp.asarray(ci, jnp.float32),
                                         jnp.asarray(1.5))
            R = mu.specular_reflection(jnp.asarray(ci, jnp.float32),
                                       jnp.asarray(1.5))
            assert float(T[0, 0] + R[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_rotate_stokes_basis_roundtrip(self):
        fwd = jnp.asarray([0.0, 0.0, 1.0])
        b1 = mu.stokes_basis(fwd)
        b2 = jnp.asarray([0.0, 1.0, 0.0])
        R = mu.rotate_stokes_basis(fwd, b1, b2)
        Rb = mu.rotate_stokes_basis(fwd, b2, b1)
        np.testing.assert_allclose(np.asarray(R @ Rb), np.eye(4),
                                   atol=1e-6)


def _polarizer_scene(*elements, light_radiance=2.0):
    """Camera at +z looking -z through a stack of polarizing plates at a
    rectangle area light behind them."""
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 12,
                   "to_world": {"lookat": {"origin": [0, 0, 6],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}}},
        "light": {"type": "rectangle",
                  "to_world": {"ops": [{"scale": [3, 3, 1]},
                                       {"translate": [0, 0, -2]}]},
                  "emitter": {"type": "area", "radiance": light_radiance}},
    }
    for i, el in enumerate(elements):
        d[f"plate{i}"] = {
            "type": "rectangle",
            "to_world": {"ops": [{"scale": [3, 3, 1]},
                                 {"translate": [0, 0, float(i)]}]},
            "bsdf": el,
        }
    return d


def _stokes_mean(d, spp=32, max_depth=8):
    sc = mt.load_dict(d)
    S = np.asarray(render_stokes(sc, spp=spp, max_depth=max_depth, seed=0))
    return S.mean(axis=(0, 1, 2))   # average over pixels + rgb -> (4,)


class TestPolarizedTransport:
    def test_single_polarizer_halves_and_polarizes(self):
        S = _stokes_mean(_polarizer_scene({"type": "polarizer"}))
        # unpolarized light through an ideal vertical-absorbing polarizer
        assert S[0] == pytest.approx(1.0, rel=0.02)       # 0.5 * 2.0
        # fully linearly polarized output
        assert abs(S[1]) / S[0] == pytest.approx(1.0, abs=0.02)
        assert abs(S[2]) < 0.05 and abs(S[3]) < 0.05

    @pytest.mark.parametrize("deg", [0.0, 30.0, 45.0, 60.0, 90.0])
    def test_malus_in_transport(self, deg):
        S = _stokes_mean(_polarizer_scene(
            {"type": "polarizer", "theta": deg},
            {"type": "polarizer", "theta": 0.0}))
        # after plate 1: I1 = 0.5 * 2.0 = 1, fully polarized at `deg`;
        # plate 2 at 0 deg transmits I1 * cos^2(deg) (Malus)
        expect = np.cos(np.deg2rad(deg)) ** 2
        assert S[0] == pytest.approx(expect, abs=0.02)

    @pytest.mark.slow
    def test_quarter_wave_plate_between_crossed(self):
        """Crossed polarizers block; inserting a QWP at 45 deg lets
        half of the intermediate intensity through."""
        S_blocked = _stokes_mean(_polarizer_scene(
            {"type": "polarizer", "theta": 90.0},
            {"type": "polarizer", "theta": 0.0}))
        assert S_blocked[0] == pytest.approx(0.0, abs=0.01)
        S_qwp = _stokes_mean(_polarizer_scene(
            {"type": "polarizer", "theta": 90.0},
            {"type": "retarder", "theta": 45.0, "delta": 90.0},
            {"type": "polarizer", "theta": 0.0}))
        assert S_qwp[0] == pytest.approx(0.5, abs=0.02)

    @pytest.mark.slow
    def test_circular_polarizer_S3(self):
        Sr = _stokes_mean(_polarizer_scene({"type": "circular"}))
        assert Sr[0] == pytest.approx(1.0, rel=0.02)
        assert abs(Sr[3]) / Sr[0] == pytest.approx(1.0, abs=0.02)
        Sl = _stokes_mean(_polarizer_scene(
            {"type": "circular", "left_handed": True}))
        assert np.sign(Sl[3]) == -np.sign(Sr[3])

    @pytest.mark.slow
    def test_depolarizing_scene_matches_scalar_path(self):
        """S0 of a diffuse-only scene equals the scalar path render
        exactly (same sampler stream)."""
        from mitsuba3_amvpt_tpu.utils import scenes
        d = scenes.cornell_box(res=24)
        sc = mt.load_dict(d)
        S = np.asarray(render_stokes(sc, spp=8, max_depth=4, seed=3))
        ref = np.asarray(mt.render(sc, spp=8, max_depth=4, seed=3,
                                   integrator="path"))
        np.testing.assert_allclose(S[..., 0], ref, rtol=1e-4, atol=1e-5)
        # and a diffuse box depolarizes: S1..S3 ~ 0
        assert np.abs(S[..., 1:]).max() < 1e-4

    @pytest.mark.slow
    def test_brewster_reflection_polarizes(self):
        """Unpolarized light reflecting off smooth glass near Brewster's
        angle comes out strongly polarized perpendicular to the plane of
        incidence."""
        tb = float(np.degrees(np.arctan(1.5)))   # ~56.3 deg
        # camera and light arranged so the camera sees the specular
        # reflection of the light in a glass plate at Brewster geometry
        a = np.deg2rad(tb)
        d = {
            "type": "scene",
            "sensor": {"type": "perspective", "fov": 5,
                       "to_world": {"lookat": {
                           "origin": [float(4*np.sin(a)), 0.0,
                                      float(4*np.cos(a))],
                           "target": [0, 0, 0], "up": [0, 1, 0]}},
                       "film": {"type": "hdrfilm", "width": 8,
                                "height": 8,
                                "rfilter": {"type": "box"}}},
            "plate": {"type": "rectangle", "bsdf": {"type": "dielectric"}},
            "light": {"type": "rectangle",
                      "to_world": {"ops": [
                          {"rotate": {"axis": [0, 1, 0],
                                      "angle": 180.0 - tb}},
                          {"translate": [float(-4*np.sin(a)), 0.0,
                                         float(4*np.cos(a))]}]},
                      "emitter": {"type": "area", "radiance": 10.0}},
        }
        sc = mt.load_dict(d)
        S = np.asarray(render_stokes(sc, spp=64, max_depth=3, seed=0))
        Sm = S.mean(axis=(0, 1, 2))
        # reflection exists and is nearly fully polarized
        assert Sm[0] > 1e-3
        dop = np.sqrt(Sm[1]**2 + Sm[2]**2 + Sm[3]**2) / Sm[0]
        assert dop > 0.9
