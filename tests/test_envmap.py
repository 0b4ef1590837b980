"""Environment-map emitter tests (reference: src/emitters/envmap.cpp,
src/emitters/tests/test_envmap.py) — bilinear warp correctness, render
equivalences, NEE importance sampling and MIS compensation."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.core.distr import Marginal2D

pytestmark = pytest.mark.smoke


def env_scene(img, res=24, albedo=0.6, scale=1.0, **env_kw):
    return {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"lookat": {"origin": [0, 0, 3],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": res, "height": res,
                            "rfilter": {"type": "box"}}},
        "sph": {"type": "sphere", "radius": 0.8,
                "bsdf": {"type": "diffuse", "reflectance": albedo}},
        "env": {"type": "envmap", "data": img, "scale": scale, **env_kw},
    }


class TestWarp:
    def test_histogram_matches_bilinear_pdf(self, rng):
        """Sampled density == the bilinear interpolant of the nodes
        (Hierarchical2D parity, distr_2d.h:49): histogram over a fine
        grid vs pdf() at cell centers."""
        data = rng.random((7, 9)).astype(np.float32) + 0.05
        w = Marginal2D.from_data(data)
        n = 400_000
        u = rng.random((n, 2)).astype(np.float32)
        uv, pdf = w.sample(u)
        uv = np.asarray(uv)
        G = 12
        hist, xe, ye = np.histogram2d(uv[:, 0], uv[:, 1], bins=G,
                                      range=[[0, 1], [0, 1]])
        hist = hist / n * G * G     # density estimate
        xc = (xe[:-1] + xe[1:]) / 2
        yc = (ye[:-1] + ye[1:]) / 2
        X, Y = np.meshgrid(xc, yc, indexing="ij")
        import jax.numpy as jnp
        p = np.asarray(w.pdf(jnp.stack([jnp.asarray(X.ravel()),
                                        jnp.asarray(Y.ravel())], -1)))
        p = p.reshape(G, G)
        # cell-center pdf vs cell-average histogram: tolerate the
        # within-cell variation of the interpolant + MC noise
        assert np.abs(hist - p).max() / p.max() < 0.15

    def test_pdf_is_continuous(self):
        """No texel-constant steps: pdf varies smoothly across what used
        to be texel boundaries."""
        data = np.array([[1.0, 5.0], [1.0, 5.0]], np.float32)
        w = Marginal2D.from_data(data)
        import jax.numpy as jnp
        xs = jnp.linspace(0.0, 1.0, 33)
        uv = jnp.stack([xs, jnp.full_like(xs, 0.5)], -1)
        p = np.asarray(w.pdf(uv))
        diffs = np.diff(p)
        assert (diffs > 0).all()                      # monotone ramp
        assert np.allclose(np.diff(diffs), 0, atol=1e-4)  # linear

    def test_sample_pdf_consistency(self, rng):
        data = rng.random((16, 33)).astype(np.float32) + 0.01
        w = Marginal2D.from_data(data)
        import jax.numpy as jnp
        u = jnp.asarray(rng.random((100_000, 2), np.float32))
        uv, pdf = w.sample(u)
        assert np.allclose(np.asarray(w.pdf(uv)), np.asarray(pdf),
                           rtol=2e-3, atol=1e-4)
        inv = 1.0 / np.asarray(pdf)
        assert abs(inv.mean() - 1.0) < 0.02   # integral of pdf == 1


class TestRender:
    def test_uniform_envmap_equals_constant(self):
        """A constant-valued envmap must render like a constant emitter
        (same transport, different sampling machinery)."""
        img = np.full((8, 16, 3), 0.9, np.float32)
        a = np.asarray(mt.render(mt.load_dict(env_scene(img)),
                                 spp=96, max_depth=4, seed=0))
        sc = env_scene(img)
        sc["env"] = {"type": "constant", "radiance": 0.9}
        b = np.asarray(mt.render(mt.load_dict(sc),
                                 spp=96, max_depth=4, seed=0))
        assert np.allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.04)

    def test_background_shows_map(self):
        """Escaped rays look up the map: a map bright only in the
        camera-facing hemisphere tints the background."""
        img = np.zeros((16, 32, 3), np.float32)
        img[:, :, 2] = 0.1
        img[6:10, :, 0] = 2.0     # bright red band around the equator
        sc = mt.load_dict(env_scene(img, res=32))
        im = np.asarray(mt.render(sc, spp=16, max_depth=2, seed=0))
        corner = im[0, 0]
        mid_edge = im[16, 0]      # equator direction, off the sphere
        assert mid_edge[0] > corner[0]

    def test_hdr_importance_sampling_variance(self):
        """A tiny very bright sun: warp importance sampling must keep
        NEE noise bounded; compare per-pixel std to the mean signal."""
        img = np.full((32, 64, 3), 0.02, np.float32)
        img[8, 16] = 800.0        # sun node
        sc = mt.load_dict(env_scene(img, res=24))
        seeds = [np.asarray(mt.render(sc, spp=32, max_depth=2, seed=s))
                 for s in range(6)]
        a = np.stack(seeds)
        mean = a.mean()
        rel_std = a.mean((1, 2, 3)).std() / mean
        assert mean > 0.0
        assert rel_std < 0.15, rel_std

    def test_mis_compensation_unbiased(self):
        """mis_compensation changes sampling only — means agree."""
        rng = np.random.default_rng(0)
        img = (rng.random((16, 32, 3)).astype(np.float32) * 0.2)
        img[4:6, 8:12] += 5.0
        a = np.asarray(mt.render(mt.load_dict(env_scene(img)),
                                 spp=128, max_depth=2, seed=0))
        b = np.asarray(mt.render(
            mt.load_dict(env_scene(img, mis_compensation=True)),
            spp=128, max_depth=2, seed=0))
        assert np.allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.06), \
            (a.mean((0, 1)), b.mean((0, 1)))
