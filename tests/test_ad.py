"""Gradient correctness tests (mirrors reference
src/integrators/tests/test_ad_integrators.py: AD vs finite differences).

Three-way check on scene-parameter gradients:
  finite differences  <->  naive AD through the full render  <->  PRB.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.ad import render_ad, traverse, update_scene
from mitsuba3_amvpt_tpu.ad.prb import prb_pass
from mitsuba3_amvpt_tpu.render.film import film_develop
from mitsuba3_amvpt_tpu.utils import scenes

RES = 24
SPP = 48
DEPTH = 3


@pytest.fixture(scope="module")
def cb():
    return mt.load_dict(scenes.cornell_box(res=RES))


def _loss_weights(shape):
    r = np.random.default_rng(0)
    return jnp.asarray(r.random(shape, np.float32))


def _primal_loss(scene, w):
    img = film_develop(prb_pass(scene, jnp.uint32(0), SPP, DEPTH, 8))
    return jnp.sum(img * w)


def _naive_loss(scene, w):
    from mitsuba3_amvpt_tpu.render.integrators.api import render_pass
    from mitsuba3_amvpt_tpu.render.film import film_prepare
    acc = render_pass(scene, film_prepare(scene.film), jnp.uint32(0), SPP,
                      "path", DEPTH, 8)
    return jnp.sum(film_develop(acc) * w)


class TestPRBGradients:
    def _compare(self, cb, param_name, scale_fn, fd_eps, rel_tol=0.12):
        """d loss / d scalar-scale-of-param via FD, naive AD, PRB."""
        w = _loss_weights((RES, RES, 3))
        params = traverse(cb)
        base = params[param_name]

        def scene_of(theta):
            return update_scene(cb, {param_name: scale_fn(base, theta)})

        # finite differences (primal renderer, same seed => correlated,
        # low-variance FD like reference's ref_fd_epsilon runs)
        f = lambda t: float(_primal_loss(scene_of(t), w))  # noqa: E731
        fd = (f(fd_eps) - f(-fd_eps)) / (2 * fd_eps)

        # naive AD
        naive = float(jax.grad(
            lambda t: _naive_loss(scene_of(t), w))(0.0))

        # PRB
        prb = float(jax.grad(
            lambda t: _primal_loss(scene_of(t), w))(0.0))

        assert naive == pytest.approx(fd, rel=rel_tol, abs=1e-3), \
            (param_name, fd, naive, prb)
        assert prb == pytest.approx(fd, rel=rel_tol, abs=1e-3), \
            (param_name, fd, naive, prb)
        return fd, naive, prb

    def test_albedo_gradient(self, cb):
        fd, naive, prb = self._compare(
            cb, "materials.albedo",
            lambda base, t: base * (1.0 + t), 1e-2)
        assert abs(fd) > 1e-3  # non-trivial gradient

    def test_emitter_radiance_gradient(self, cb):
        fd, naive, prb = self._compare(
            cb, "emitters.radiance",
            lambda base, t: base * (1.0 + t), 1e-2)
        assert abs(fd) > 1e-3

    def test_radiance_gradient_is_linear(self, cb):
        """Image is linear in emitter radiance: PRB gradient of the sum
        w.r.t. a radiance scale == the emissive part of the image."""
        w = jnp.ones((RES, RES, 3))
        params = traverse(cb)
        base = params["emitters.radiance"]

        def loss(t):
            sc = update_scene(cb, {"emitters.radiance": base * t})
            return _primal_loss(sc, w)

        g = float(jax.grad(loss)(1.0))
        val = float(loss(1.0))
        assert g == pytest.approx(val, rel=0.05)


class TestTextureGradients:
    def test_texture_recovery_direction(self):
        """One Adam-free SGD step on a textured floor must reduce the
        loss (config-3 smoke: texture optimization works end-to-end)."""
        d = {
            "type": "scene",
            "sensor": {
                "type": "perspective", "fov": 45,
                "to_world": {"lookat": {"origin": [0, 2, 2], "target": [0, 0, 0],
                                        "up": [0, 1, 0]}},
                "film": {"type": "hdrfilm", "width": 24, "height": 24,
                         "rfilter": {"type": "box"}}},
            "floor": {"type": "rectangle",
                      "to_world": {"ops": [{"rotate": {"axis": [1, 0, 0],
                                                       "angle": -90}},
                                           {"scale": [2, 2, 2]}]},
                      "bsdf": {"type": "diffuse",
                               "reflectance": {"type": "checkerboard",
                                               "color0": 0.8, "color1": 0.3,
                                               "res": 8}}},
            "light": {"type": "point", "position": [0, 3, 0],
                      "intensity": 20.0},
        }
        sc = mt.load_dict(d)
        target = render_ad(sc, spp=32, max_depth=2, seed=7)

        # perturb the texture and take gradient steps back
        tex0 = sc.textures.texels
        sc_bad = update_scene(sc, {"textures.texels": jnp.full_like(tex0, 0.5)})

        def loss(texels):
            s = update_scene(sc_bad, {"textures.texels": texels})
            img = film_develop(prb_pass(s, jnp.uint32(1), 32, 2, 8))
            return jnp.mean((img - target) ** 2)

        t = sc_bad.textures.texels
        l0, g = jax.value_and_grad(loss)(t)
        assert float(jnp.abs(g).max()) > 0
        t2 = t - 40.0 * g
        l1 = loss(t2)
        assert float(l1) < float(l0)
        # gradient points toward the true texture on average
        moved = jnp.sign(t2 - t)
        want = jnp.sign(tex0 - t)
        agree = float(jnp.mean((moved == want) & (jnp.abs(g) > 1e-7)))
        assert agree > 0.3
