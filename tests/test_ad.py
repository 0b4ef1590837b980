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

    @pytest.mark.slow
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
    @pytest.mark.slow
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


class TestRoughnessTextureRecovery:
    """Gradients through GGX sampling/eval w.r.t. a roughness TEXTURE
    (BASELINE config 3 'albedo/roughness textures'; VERDICT r2 item 8:
    the unproven half)."""

    def _scene(self):
        return mt.load_dict({
            "type": "scene",
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": {"lookat": {
                           "origin": [0, 2.0, 2.0], "target": [0, 0, 0],
                           "up": [0, 1, 0]}},
                       "film": {"type": "hdrfilm", "width": 32,
                                "height": 32,
                                "rfilter": {"type": "box"}}},
            "floor": {"type": "rectangle",
                      "to_world": {"ops": [
                          {"rotate": {"axis": [1, 0, 0], "angle": -90}},
                          {"scale": [1.5, 1.5, 1.5]}]},
                      "bsdf": {"type": "roughconductor",
                               "material": "Al",
                               "alpha": {"type": "checkerboard",
                                         "color0": [0.08, 0.08, 0.08],
                                         "color1": [0.45, 0.45, 0.45],
                                         "res": 8}}},
            "light": {"type": "sphere", "radius": 0.35,
                      "center": [0, 2.5, 1.0],
                      "emitter": {"type": "area", "radiance": 30.0}},
            "env": {"type": "constant", "radiance": 0.05},
        })

    @pytest.mark.slow
    def test_alpha_texels_recoverable(self):
        from mitsuba3_amvpt_tpu.ad import update_scene
        from mitsuba3_amvpt_tpu.ad.prb import prb_pass
        from mitsuba3_amvpt_tpu.ad.optimizers import Adam
        from mitsuba3_amvpt_tpu.render.film import film_develop

        scene = self._scene()
        tex0 = scene.textures.texels
        target = film_develop(prb_pass(scene, jnp.uint32(3), 32, 3, 8))

        t_init = jnp.full_like(tex0, 0.25)
        opt = Adam(lr=0.035, params={"tex": t_init})

        @jax.jit
        def lg(texels, seed):
            def loss(t):
                s = update_scene(scene, {"textures.texels": t})
                img = film_develop(prb_pass(s, seed, 16, 3, 8))
                return jnp.mean((img - target) ** 2)
            return jax.value_and_grad(loss)(texels)

        l0, g0 = lg(t_init, jnp.uint32(100))
        assert float(jnp.abs(g0).max()) > 0.0, "no gradient through GGX"
        losses = [float(l0)]
        e_init = float(jnp.abs(t_init - tex0).mean())
        for it in range(40):
            l, g = lg(opt["tex"], jnp.uint32(101 + it))
            opt.step({"tex": g})
            opt["tex"] = jnp.clip(opt["tex"], 0.02, 1.0)
            losses.append(float(l))
        e_final = float(jnp.abs(opt["tex"] - tex0).mean())
        # loss decreases and texels move toward the truth.  The texel
        # error bar is loose because the mean includes texels the 32^2
        # view never observes (no gradient signal reaches them).
        assert np.mean(losses[-4:]) < 0.5 * np.mean(losses[:2]), losses
        assert e_final < 0.8 * e_init, (e_init, e_final)
