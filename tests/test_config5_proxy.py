"""BASELINE config-5 triple: spectral integrator x binned tracer x
multi-view grid sensor in ONE program (VERDICT r3 #5 — these axes were
previously only ever tested pairwise).  Tiny shapes; the binned Pallas
kernels run in interpret mode on CPU."""

import os

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render.integrators.spectral import render_spectral
from mitsuba3_amvpt_tpu.utils import scenes


VIEWS = 4
RES = 8


def _scene_dict():
    d = scenes.sphere_field(3000, res=RES, grid=2, max_depth=2)
    ext = 2 * 2.5
    d["sensor"] = {
        "type": "grid", "grid": [VIEWS, 1], "mode": "cone",
        "fov": 60.0, "focus_distance": ext * 1.4, "cone_deg": 15.0,
        "to_world": {"lookat": {"origin": [0, 0, -ext * 1.4],
                                "target": [0, 0, 0], "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": RES * VIEWS, "height": RES,
                 "rfilter": {"type": "box"}}}
    return d


def test_spectral_binned_multiview():
    os.environ["MT_FORCE_BINNED"] = "1"
    try:
        scene = mt.load_dict(_scene_dict())
        assert scene.geom.accel_mode == "tiled"   # binned-eligible
        img = np.asarray(render_spectral(scene, spp=2, max_depth=2,
                                         seed=0))
    finally:
        del os.environ["MT_FORCE_BINNED"]
    assert img.shape == (RES, RES * VIEWS, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4                      # lit geometry visible
    # per-view tiles all see the scene (multi-view axis exercised)
    for v in range(VIEWS):
        tile = img[:, v * RES:(v + 1) * RES]
        assert tile.mean() > 1e-5, v

    # parity: the same scene through the default (tiled) tracer must
    # produce the same spectral image — the tracer is an accel detail.
    # clear_caches is load-bearing: MT_FORCE_BINNED is consulted at
    # trace time inside jitted code, so without it the second render
    # hits the jit cache compiled during the binned render and the
    # assertion compares the binned image to itself (ADVICE r4 #1)
    import jax
    jax.clear_caches()
    scene2 = mt.load_dict(_scene_dict())
    img2 = np.asarray(render_spectral(scene2, spp=2, max_depth=2,
                                      seed=0))
    np.testing.assert_allclose(img, img2, rtol=1e-4, atol=1e-5)
