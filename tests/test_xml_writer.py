"""dict -> XML writer round-trip tests (reference python/xml.py
WriteXML analog): written XML re-loaded through the XML loader must
produce the identical scene."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.utils import scenes
from mitsuba3_amvpt_tpu.utils.xml_writer import dict_to_xml

pytestmark = pytest.mark.smoke


def roundtrip_render(d, **kw):
    a = np.asarray(mt.render(mt.load_dict(d), seed=0, **kw))
    b = np.asarray(mt.render(mt.load_string(dict_to_xml(d)), seed=0,
                             **kw))
    return a, b


def test_cornell_roundtrip_bit_identical():
    a, b = roundtrip_render(scenes.cornell_box(res=24), spp=8,
                            max_depth=3)
    assert np.array_equal(a, b)


def test_medium_scene_roundtrip():
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 10,
                   "medium": {"type": "homogeneous",
                              "sigma_t": [0.2, 0.4, 0.6], "albedo": 0.5,
                              "phase": {"type": "hg", "g": 0.3}},
                   "to_world": {"lookat": {"origin": [0, 0, 4],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": 12, "height": 12,
                            "rfilter": {"type": "box"}}},
        "wall": {"type": "rectangle",
                 "to_world": {"ops": [{"scale": [3, 3, 1]}]},
                 "bsdf": {"type": "roughconductor", "alpha": 0.2},
                 "emitter": {"type": "area", "radiance": 2.0}},
    }
    a, b = roundtrip_render(d, spp=16, max_depth=3,
                            integrator="volpath")
    assert np.array_equal(a, b)


def test_trimesh_sidecar(tmp_path):
    v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 40,
                   "to_world": {"lookat": {"origin": [0, 0, 3],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": 16, "height": 16,
                            "rfilter": {"type": "box"}}},
        "tri": {"type": "trimesh", "vertices": v, "faces": f,
                "bsdf": {"type": "diffuse", "reflectance": 0.8}},
        "env": {"type": "constant", "radiance": 1.0},
    }
    path = str(tmp_path / "scene.xml")
    dict_to_xml(d, path=path)
    a = np.asarray(mt.render(mt.load_dict(d), spp=8, max_depth=2, seed=0))
    b = np.asarray(mt.render(mt.load_file(path), spp=8, max_depth=2,
                             seed=0))
    assert np.allclose(a, b, atol=1e-6)


def test_ref_roundtrip():
    d = scenes.cornell_box(res=16)   # uses {"type": "ref", "id": ...}
    xml = dict_to_xml(d)
    assert '<ref id="white"' in xml
    sc = mt.load_string(xml)
    assert sc.geom.faces.shape[0] > 0
