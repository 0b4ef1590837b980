"""mesh_attribute texture (src/textures/mesh_attribute.cpp): per-vertex
colors drive BSDF reflectance via barycentric interpolation."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt

pytestmark = pytest.mark.smoke


def quad_scene(res=32, scale=1.0):
    # unit quad in z=0, vertex colors: left red -> right green
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                 np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    c = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0]], np.float32)
    return {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 35,
                   "to_world": {"lookat": {"origin": [0, 0, 3.2],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": res, "height": res,
                            "rfilter": {"type": "box"}}},
        "quad": {"type": "trimesh", "vertices": v, "faces": f,
                 "vertex_colors": c,
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "mesh_attribute",
                                          "name": "vertex_color",
                                          "scale": scale}}},
        "env": {"type": "constant", "radiance": 1.0},
    }


def test_vertex_color_gradient():
    img = np.asarray(mt.render(mt.load_dict(quad_scene()), spp=64,
                               max_depth=3, seed=0))
    H = img.shape[0]
    left = img[H // 2, 2]
    right = img[H // 2, -3]
    mid = img[H // 2, H // 2]
    # left: red dominates; right: green dominates; center: ~equal mix
    assert left[0] > 3 * left[1], left
    assert right[1] > 3 * right[0], right
    assert abs(mid[0] - mid[1]) < 0.25 * max(mid[0], mid[1], 1e-3), mid
    # diffuse quad under unit constant env: L ~= albedo; the red channel
    # at the left edge interpolates to ~1
    assert 0.6 < left[0] <= 1.2, left


def test_scale_prop():
    a = np.asarray(mt.render(mt.load_dict(quad_scene(scale=1.0)),
                             spp=32, max_depth=2, seed=1))
    b = np.asarray(mt.render(mt.load_dict(quad_scene(scale=0.5)),
                             spp=32, max_depth=2, seed=1))
    H = a.shape[0]
    ratio = b[H // 2, 4, 0] / max(a[H // 2, 4, 0], 1e-6)
    assert abs(ratio - 0.5) < 0.1, ratio


def test_scene_without_attrs_unchanged():
    """No vertex colors anywhere: si.vattr stays None and renders are
    unaffected (static pack-column pruning)."""
    from mitsuba3_amvpt_tpu.utils import scenes
    sc = mt.load_dict(scenes.cornell_box(res=16))
    assert sc.geom.vattrs is None
    img = np.asarray(mt.render(sc, spp=4, max_depth=2, seed=0))
    assert np.isfinite(img).all()
