"""SDF grid shape tests (src/shapes/sdfgrid.cpp parity): intersection
vs an analytic sphere, normals, render parity against a `sphere` shape,
and grid-parameter gradient flow through the tangent-plane
reattachment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render import sdf as S
from mitsuba3_amvpt_tpu.render.records import Ray


def _sphere_grid(res=48, r=0.3):
    zz, yy, xx = np.meshgrid(*([np.linspace(0, 1, res)] * 3),
                             indexing="ij")
    return (np.sqrt((xx - .5) ** 2 + (yy - .5) ** 2 + (zz - .5) ** 2)
            - r).astype(np.float32)


class TestIntersect:
    def test_vs_analytic_sphere(self):
        g = S.build_sdf(_sphere_grid())
        rng = np.random.default_rng(0)
        n = 2048
        tgt = rng.uniform(0.25, 0.75, (n, 3)).astype(np.float32)
        o = np.tile([[0.5, 0.5, 3.0]], (n, 1)).astype(np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t, hit = S.sdf_intersect(g, jnp.asarray(o), jnp.asarray(d),
                                 jnp.full((n,), 1e9))
        t, hit = np.asarray(t), np.asarray(hit)
        oc = o - 0.5
        b = np.einsum("ij,ij->i", oc, d)
        c = np.einsum("ij,ij->i", oc, oc) - 0.09
        disc = b * b - c
        hit_ref = disc > 0
        assert (hit == hit_ref).mean() > 0.995   # grazing rays excepted
        sel = hit & hit_ref
        t_ref = -b - np.sqrt(np.maximum(disc, 0))
        assert np.abs(t[sel] - t_ref[sel]).mean() < 2e-3

    def test_normals(self):
        g = S.build_sdf(_sphere_grid())
        p = np.array([[0.8, 0.5, 0.5], [0.5, 0.2, 0.5],
                      [0.5, 0.5, 0.8]], np.float32)
        n_ref = (p - 0.5) / np.linalg.norm(p - 0.5, axis=1, keepdims=True)
        for fn in (S.sdf_grad, S.sdf_smooth_normal):
            nv = np.asarray(fn(g, jnp.asarray(p)))
            nv = nv / np.linalg.norm(nv, axis=1, keepdims=True)
            np.testing.assert_allclose(nv, n_ref, atol=5e-3)

    def test_surface_value_zero(self):
        g = S.build_sdf(_sphere_grid())
        th = np.linspace(0, np.pi, 32)
        p = np.stack([0.5 + 0.3 * np.sin(th), np.full(32, 0.5),
                      0.5 + 0.3 * np.cos(th)], -1).astype(np.float32)
        v = np.asarray(S.sdf_value(g, jnp.asarray(p)))
        assert np.abs(v).max() < 2e-3


def _scene_with(ball):
    return mt.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 40,
                   "to_world": {"lookat": {
                       "origin": [0.5, 0.5, 3.0], "target": [0.5, 0.5, 0.5],
                       "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": 32, "height": 32,
                            "rfilter": {"type": "box"}}},
        "light": {"type": "constant", "radiance": 1.0},
        "ball": ball,
    })


class TestScene:
    def test_render_matches_sphere_shape(self):
        """sdfgrid of a sphere renders like the analytic sphere shape."""
        bsdf = {"type": "diffuse", "reflectance": 0.6}
        sc_sdf = _scene_with({"type": "sdfgrid",
                              "grid": _sphere_grid(64),
                              "bsdf": bsdf})
        sc_ref = _scene_with({"type": "sphere", "center": [0.5, 0.5, 0.5],
                              "radius": 0.3, "bsdf": bsdf})
        a = np.asarray(mt.render(sc_sdf, spp=32, max_depth=4, seed=0))
        b = np.asarray(mt.render(sc_ref, spp=32, max_depth=4, seed=0))
        assert np.isfinite(a).all()
        assert abs(a.mean() - b.mean()) / b.mean() < 0.03
        # silhouettes agree pixelwise away from the rim
        da = np.abs(a - b).mean(-1)
        assert np.quantile(da, 0.9) < 0.12

    def test_shadowing(self):
        """SDF occludes shadow rays (Scene.ray_test path)."""
        sc = _scene_with({"type": "sdfgrid", "grid": _sphere_grid(32, 0.35),
                          "bsdf": {"type": "diffuse"}})
        # rays through the ball center vs. rays well beside it
        o = jnp.asarray([[0.5, 0.5, 3.0]] * 2, jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0],
                         [0.6, 0.6, -1.0]], jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        occ = np.asarray(sc.ray_test(Ray(o=o, d=d,
                                         maxt=jnp.full((2,), 1e9))))
        assert occ[0] and not occ[1]

    def test_grid_gradients_flow(self):
        """d mean(render) / d grid is finite and nonzero (the
        tangent-plane reattachment, sdfgrid.cpp:390-420)."""
        bsdf = {"type": "diffuse", "reflectance": 0.6}
        sc = _scene_with({"type": "sdfgrid", "grid": _sphere_grid(24),
                          "bsdf": bsdf})

        def loss(grid):
            sc2 = sc.replace(sdfs=(sc.sdfs[0].replace(grid=grid),))
            img = mt.render(sc2, spp=8, max_depth=2, seed=0)
            return jnp.mean(img)

        g = jax.grad(loss)(sc.sdfs[0].grid)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0

    def test_emitter_rejected(self):
        with pytest.raises(ValueError):
            _scene_with({"type": "sdfgrid", "grid": _sphere_grid(16),
                         "emitter": {"type": "area"},
                         "bsdf": {"type": "diffuse"}})
