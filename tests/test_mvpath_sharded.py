"""View-axis sharded AMVPT (2D (views, rays) mesh) — device-count
invariance and estimator parity on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.parallel.sharding import (make_mesh2d,
                                                  render_mvpath_sharded)
from mitsuba3_amvpt_tpu.render.integrators.mvpath import render_mvpath
from mitsuba3_amvpt_tpu.utils import scenes



@pytest.fixture(scope="module")
def scene():
    res = 16
    views = 8
    d = scenes.cornell_box(res=res)
    d["sensor"] = {
        "type": "grid", "grid": [views, 1], "mode": "cone",
        "fov": 39.3077, "focus_distance": 3.9,
        "to_world": {"lookat": {"origin": [0, 0, 3.9],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": res * views, "height": res,
                 "rfilter": {"type": "box"}}}
    return mt.load_dict(d)


@pytest.mark.smoke
@pytest.mark.slow
def test_mesh_shape_invariance(scene):
    """(1,1) == (2,4) == (4,2): lanes are globally indexed, so the
    mesh factorization must not change a single sample."""
    devs = jax.devices()
    img1 = np.asarray(render_mvpath_sharded(
        scene, make_mesh2d(1, devs[:1]), spp=4, max_depth=3, seed=3))
    img2 = np.asarray(render_mvpath_sharded(
        scene, make_mesh2d(2, devs[:8]), spp=4, max_depth=3, seed=3))
    img3 = np.asarray(render_mvpath_sharded(
        scene, make_mesh2d(4, devs[:8]), spp=4, max_depth=3, seed=3))
    assert np.allclose(img1, img2, atol=1e-5), \
        np.abs(img1 - img2).max()
    assert np.allclose(img2, img3, atol=1e-5)


def test_matches_unsharded_mean(scene):
    """Sharded estimator is the same math as render_mvpath (different
    lane enumeration -> different samples, same expectation)."""
    devs = jax.devices()
    a = np.asarray(render_mvpath_sharded(
        scene, make_mesh2d(2, devs[:8]), spp=48, max_depth=3, seed=0))
    b = np.asarray(render_mvpath(scene, spp=48, max_depth=3, seed=1))
    lit = b.mean(-1) > 0.05
    ratio = a.mean(-1)[lit] / b.mean(-1)[lit]
    assert abs(np.median(ratio) - 1.0) < 0.04, np.median(ratio)


def test_view_divisibility_assert(scene):
    """8 views cannot split across 3 view-shards."""
    devs = jax.devices()
    with pytest.raises(AssertionError):
        render_mvpath_sharded(scene, make_mesh2d(3, devs[:6]),
                              spp=2)
