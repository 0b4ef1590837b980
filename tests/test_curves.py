"""Curve shape tests (src/shapes/{linearcurve,bsplinecurve}.cpp parity):
file parsing, tube tessellation invariants, SI fiber-frame alignment,
and a hair-on-curve render smoke test."""

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.loader import curves


def _write(path, text):
    path.write_text(text)
    return str(path)


class TestParsing:
    def test_multi_curve(self, tmp_path):
        p = _write(tmp_path / "c.txt",
                   "0 0 0 0.1\n1 0 0 0.2\n\n"
                   "0 1 0 0.1\n1 1 0 0.1\n2 1 0 0.3\n")
        cs = curves.read_curve_file(p)
        assert len(cs) == 2
        assert cs[0].shape == (2, 4)
        assert cs[1].shape == (3, 4)

    def test_single_point_rejected(self, tmp_path):
        p = _write(tmp_path / "c.txt", "0 0 0 0.1\n")
        with pytest.raises(ValueError):
            curves.read_curve_file(p)

    def test_bspline_needs_four(self, tmp_path):
        p = _write(tmp_path / "c.txt", "0 0 0 .1\n1 0 0 .1\n2 0 0 .1\n")
        with pytest.raises(ValueError):
            curves.load_curves(p, kind="bspline")


class TestTessellation:
    def test_tube_invariants(self, tmp_path):
        # straight fiber along +y, constant radius
        p = _write(tmp_path / "c.txt", "0 0 0 0.25\n0 4 0 0.25\n")
        v, f, n, uv, t = curves.load_curves(p, radial=12)
        # all tangents along +y
        np.testing.assert_allclose(t, np.tile([[0, 1, 0.0]], (len(t), 1)),
                                   atol=1e-12)
        # ring vertices at distance r from the axis, radial normals
        body = slice(0, 2 * 12)   # exclude endcap apexes
        d = v[body].copy()
        d[:, 1] = 0.0
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 0.25,
                                   atol=1e-12)
        np.testing.assert_allclose(n[body],
                                   d / 0.25, atol=1e-12)
        # outward orientation: triangle normals point away from the axis
        e1 = v[f[:, 1]] - v[f[:, 0]]
        e2 = v[f[:, 2]] - v[f[:, 0]]
        fn = np.cross(e1, e2)
        c = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
        c[:, 1] = 0
        body_f = np.abs(fn[:, 1]) < 0.5
        assert (np.einsum("ij,ij->i", fn[body_f], c[body_f]) > 0).all()

    def test_bspline_smooth(self, tmp_path):
        p = _write(tmp_path / "c.txt",
                   "0 0 0 .1\n1 1 0 .1\n2 -1 0 .1\n3 0 0 .1\n4 1 0 .1\n")
        v, f, n, uv, t = curves.load_curves(p, kind="bspline", subdiv=8)
        assert len(v) > 8 * 8    # two segments, 8 subdiv, 8 radial
        assert np.isfinite(v).all() and np.isfinite(n).all()
        nt = np.linalg.norm(t, axis=1)
        np.testing.assert_allclose(nt, 1.0, atol=1e-9)

    def test_radii_invariant_to_scale(self, tmp_path):
        p = _write(tmp_path / "c.txt", "0 0 0 0.25\n0 1 0 0.25\n")
        tw = np.diag([3.0, 3.0, 3.0, 1.0])
        v, f, n, uv, t = curves.load_curves(p, to_world=tw, radial=8)
        d = v[: 2 * 8].copy()
        d[:, 1] = 0
        # positions scaled x3 (length), radius still 0.25
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 0.25,
                                   atol=1e-9)


class TestSceneIntegration:
    def _scene(self, tmp_path, bsdf):
        p = _write(tmp_path / "c.txt", "0 -2 0 0.4\n0 2 0 0.4\n")
        return mt.load_dict({
            "type": "scene",
            "light": {"type": "constant", "radiance": 1.0},
            "fiber": {"type": "linearcurve", "filename": p,
                      "radial": 16, "bsdf": bsdf},
        })

    def test_fiber_frame(self, tmp_path):
        """sh_t aligns with the fiber axis and h = sin(gamma(wi))
        recovers the ray's impact parameter (hair.cpp:580 geometry)."""
        from mitsuba3_amvpt_tpu.render.records import Ray
        sc = self._scene(tmp_path, {"type": "diffuse"})
        # rays parallel to -z hitting the fiber at lateral offsets x0
        x0 = jnp.asarray([0.0, 0.2, -0.3], jnp.float32)
        o = jnp.stack([x0, jnp.zeros(3), jnp.full((3,), 5.0)], -1)
        d = jnp.tile(jnp.asarray([[0.0, 0, -1.0]], jnp.float32), (3, 1))
        si = sc.ray_intersect(Ray(o=o, d=d, maxt=jnp.full((3,), 1e9)))
        assert bool((si.t < jnp.inf).all())
        tb = np.asarray(si.sh_t)
        np.testing.assert_allclose(np.abs(tb[:, 1]), 1.0, atol=1e-5)
        # h from the BSDF's gamma() of local wi == x0 / r
        from mitsuba3_amvpt_tpu.render.bsdfs.registry import _hair_gamma
        h = np.sin(np.asarray(_hair_gamma(si.wi)))
        r = 0.4
        np.testing.assert_allclose(np.abs(h), np.abs(np.asarray(x0)) / r,
                                   atol=0.04)   # tessellation tolerance

    def test_hair_render_smoke(self, tmp_path):
        sc = mt.load_dict({
            "type": "scene",
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": {"lookat": {
                           "origin": [0, 0, 5], "target": [0, 0, 0],
                           "up": [0, 1, 0]}},
                       "film": {"type": "hdrfilm", "width": 24,
                                "height": 24,
                                "rfilter": {"type": "box"}}},
            "light": {"type": "constant", "radiance": 1.0},
            "fiber": {"type": "linearcurve",
                      "filename": _write(tmp_path / "c.txt",
                                         "0 -2 0 0.8\n0 2 0 0.8\n"),
                      "radial": 16, "bsdf": {"type": "hair"}},
        })
        img = np.asarray(mt.render(sc, spp=16, max_depth=6, seed=0))
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        # fiber absorbs (melanin): center darker than background
        assert img[12, 12].mean() < 0.9
        assert abs(img[0, 0].mean() - 1.0) < 0.05
