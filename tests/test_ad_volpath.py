"""Volumetric PRB gradient tests: FD vs naive AD vs prbvolpath on
homogeneous-media scenes (mirrors the reference's
test_ad_integrators.py Config pattern applied to prbvolpath)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.ad.prbvolpath import prbvol_pass
from mitsuba3_amvpt_tpu.render.film import film_develop, film_prepare
from mitsuba3_amvpt_tpu.render.integrators.api import render_pass

RES = 16
SPP = 64
DEPTH = 4


def fog_scene(sigma_t=0.4, albedo=0.6, g=0.0, radiance=2.0):
    phase = {"type": "hg", "g": g} if g else {"type": "isotropic"}
    return {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 10,
                   "medium": {"type": "homogeneous", "sigma_t": sigma_t,
                              "albedo": albedo, "phase": phase},
                   "to_world": {"lookat": {"origin": [0, 0, 4],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": RES, "height": RES,
                            "rfilter": {"type": "box"}}},
        "wall": {"type": "rectangle",
                 "to_world": {"ops": [{"scale": [3, 3, 1]}]},
                 "bsdf": {"type": "diffuse", "reflectance": 0.3},
                 "emitter": {"type": "area", "radiance": radiance}},
    }


def _prb_loss(scene, w):
    img = film_develop(prbvol_pass(scene, jnp.uint32(0), SPP, DEPTH, 8))
    return jnp.sum(img * w)


def _naive_loss(scene, w):
    acc = render_pass(scene, film_prepare(scene.film), jnp.uint32(0), SPP,
                      "volpath", DEPTH, 8)
    return jnp.sum(film_develop(acc) * w)


class TestVolPRB:
    def _compare(self, base_scene, leaf, scale_fn, fd_eps, rel_tol=0.15):
        w = jnp.asarray(np.random.default_rng(0).random((RES, RES, 3),
                                                        np.float32))

        def scene_of(theta):
            val = scale_fn(getattr_path(base_scene, leaf), theta)
            return setattr_path(base_scene, leaf, val)

        f = lambda t: float(_prb_loss(scene_of(t), w))     # noqa: E731
        fd = (f(fd_eps) - f(-fd_eps)) / (2 * fd_eps)
        naive = float(jax.grad(lambda t: _naive_loss(scene_of(t), w))(0.0))
        prb = float(jax.grad(lambda t: _prb_loss(scene_of(t), w))(0.0))
        assert naive == pytest.approx(fd, rel=rel_tol, abs=2e-3), \
            (leaf, fd, naive, prb)
        assert prb == pytest.approx(fd, rel=rel_tol, abs=2e-3), \
            (leaf, fd, naive, prb)
        return fd, naive, prb

    @pytest.mark.slow
    def test_sigma_t_gradient(self):
        sc = mt.load_dict(fog_scene())
        fd, naive, prb = self._compare(
            sc, "media.sigma_t", lambda b, t: b * (1.0 + t), 5e-3)
        assert abs(fd) > 1e-3

    @pytest.mark.slow
    def test_albedo_gradient(self):
        sc = mt.load_dict(fog_scene(albedo=0.7))
        fd, naive, prb = self._compare(
            sc, "media.albedo", lambda b, t: b * (1.0 + t), 5e-3)
        assert abs(fd) > 1e-3

    @pytest.mark.slow
    def test_hg_g_gradient(self):
        sc = mt.load_dict(fog_scene(albedo=0.8, g=0.4))
        fd, naive, prb = self._compare(
            sc, "media.g", lambda b, t: b + t, 5e-3, rel_tol=0.25)

    @pytest.mark.slow
    def test_emitter_radiance_linearity(self):
        """Image linear in radiance: grad of sum w.r.t. radiance scale
        equals the image sum itself."""
        sc = mt.load_dict(fog_scene(albedo=0.5))
        w = jnp.ones((RES, RES, 3))

        def loss(t):
            s = setattr_path(sc, "emitters.radiance",
                             sc.emitters.radiance * (1.0 + t))
            return _prb_loss(s, w)

        g = float(jax.grad(loss)(0.0))
        # emission-only scene contribution: all light comes from the
        # emissive wall, so d(sum)/d(scale) == sum
        total = float(loss(0.0))
        assert g == pytest.approx(total, rel=0.02)

    @pytest.mark.slow
    def test_surface_albedo_through_fog(self):
        """BSDF gradients still flow when the path crosses a medium."""
        sc = mt.load_dict(fog_scene(albedo=0.3, radiance=3.0))
        fd, naive, prb = self._compare(
            sc, "materials.albedo", lambda b, t: b * (1.0 + t), 1e-2,
            rel_tol=0.2)
        assert abs(fd) > 1e-4

    def test_vacuum_matches_surface_prb(self):
        """No media: prbvol_pass must not be used — render_ad falls back
        to the surface PRB and the primal images agree exactly."""
        from mitsuba3_amvpt_tpu.ad import render_ad
        from mitsuba3_amvpt_tpu.utils import scenes
        cb = mt.load_dict(scenes.cornell_box(res=16))
        a = np.asarray(render_ad(cb, spp=8, max_depth=3, seed=1,
                                 integrator="volpath"))
        b = np.asarray(render_ad(cb, spp=8, max_depth=3, seed=1,
                                 integrator="path"))
        assert np.array_equal(a, b)


def getattr_path(obj, path):
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def setattr_path(scene, path, value):
    """Functional update of a nested flax-struct field."""
    head, _, rest = path.partition(".")
    child = getattr(scene, head)
    if rest:
        child = setattr_path(child, rest, value)
    else:
        child = value
    return scene.replace(**{head: child})
