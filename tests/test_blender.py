"""Blender pointer-mesh importer (src/shapes/blender.cpp:443 analog).

The plugin consumes raw pointers into Blender's in-memory structures;
here we synthesize those buffers with numpy/ctypes for each layout
family the reference supports and check decode + weld + render."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.loader.blender import (_MLOOP, _MLOOPTRI,
                                               _MLOOPUV, _MPOLY, _MVERT2,
                                               load_blender_mesh)


def _quad_mesh_36(smooth=True, two_mats=False):
    """A unit quad (2 tris, 4 verts) in Blender 3.6 layout buffers.
    Returns (props, keepalive) — keepalive holds the buffers so the
    addresses stay valid."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    loops = np.array([0, 1, 2, 0, 2, 3], np.int32)        # loop -> vert
    loop_tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    polys = np.array([0, 1], np.int32)                    # tri -> face
    uvs = np.array([[0, 0], [1, 0], [1, 1],
                    [0, 0], [1, 1], [0, 1]], np.float32)
    sharp = np.array([0 if smooth else 1] * 2, np.uint8)
    mat_indices = np.array([0, 1 if two_mats else 0], np.int32)
    keep = [verts, normals, loops, loop_tris, polys, uvs, sharp,
            mat_indices]
    props = {
        "type": "blender", "name": "quad", "version": "3.6.2",
        "mat_nr": 0, "vert_count": 4, "loop_tri_count": 2,
        "verts": verts.ctypes.data, "normals": normals.ctypes.data,
        "loops": loops.ctypes.data, "loop_tris": loop_tris.ctypes.data,
        "polys": polys.ctypes.data, "uvs": uvs.ctypes.data,
        "mat_indices": mat_indices.ctypes.data,
    }
    if not smooth:
        props["sharp_face"] = sharp.ctypes.data
    return props, keep


def test_v36_smooth_welds_shared_vertices():
    props, keep = _quad_mesh_36(smooth=True)
    out = load_blender_mesh(props)
    # smooth + matching uv at shared corners 0/2 -> welded to 4 verts
    assert out["faces"].shape == (2, 3)
    assert out["vertices"].shape == (4, 3)
    assert not out["face_normals"]
    np.testing.assert_allclose(
        np.abs(out["normals"][:, 2]), 1.0, atol=1e-6)
    # uv flip: blender v -> 1 - v (blender.cpp MLoopUV handling)
    ref_uv = {(0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)}
    got = {tuple(np.round(u, 6)) for u in out["uvs"]}
    assert got == ref_uv


def test_v36_flat_is_globally_flat():
    props, keep = _quad_mesh_36(smooth=False)
    out = load_blender_mesh(props)
    assert out["face_normals"]
    assert "normals" not in out


def test_v36_material_filter():
    props, keep = _quad_mesh_36(smooth=True, two_mats=True)
    out = load_blender_mesh(props)
    assert out["faces"].shape == (1, 3)     # only mat 0's triangle
    props["mat_nr"] = 1
    out1 = load_blender_mesh(props)
    assert out1["faces"].shape == (1, 3)


def _quad_mesh_29():
    """Same quad in the Blender 2.x layout (MVert short normals +
    MLoop/MLoopTri/MPoly structs + MLoopUV)."""
    mv = np.zeros(4, _MVERT2)
    mv["co"] = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    mv["no"] = [[0, 0, 32767]] * 4
    ml = np.zeros(6, _MLOOP)
    ml["v"] = [0, 1, 2, 0, 2, 3]
    mlt = np.zeros(2, _MLOOPTRI)
    mlt["tri"] = [[0, 1, 2], [3, 4, 5]]
    mlt["poly"] = [0, 1]
    mp = np.zeros(2, _MPOLY)
    mp["flag"] = 1                       # ME_SMOOTH
    mp["mat_nr"] = 0
    uv = np.zeros(6, _MLOOPUV)
    uv["uv"] = [[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]]
    keep = [mv, ml, mlt, mp, uv]
    props = {
        "type": "blender", "name": "quad29", "version": "2.93.1",
        "mat_nr": 0, "vert_count": 4, "loop_tri_count": 2,
        "verts": mv.ctypes.data, "loops": ml.ctypes.data,
        "loop_tris": mlt.ctypes.data, "polys": mp.ctypes.data,
        "uvs": uv.ctypes.data,
    }
    return props, keep


def test_v29_struct_layout():
    props, keep = _quad_mesh_29()
    out = load_blender_mesh(props)
    assert out["vertices"].shape == (4, 3)
    assert out["faces"].shape == (2, 3)
    np.testing.assert_allclose(np.abs(out["normals"][:, 2]), 1.0,
                               atol=1e-4)


def test_missing_property_raises():
    props, keep = _quad_mesh_36()
    del props["verts"]
    with pytest.raises(ValueError, match="verts"):
        load_blender_mesh(props)


def test_blender_shape_renders():
    """End-to-end: a blender-type emissive quad lights a diffuse
    floor through the standard loader path."""
    props, keep = _quad_mesh_36(smooth=True)
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"lookat": {"origin": [0.5, 0.5, 2.5],
                                           "target": [0.5, 0.5, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": 16, "height": 16,
                            "rfilter": {"type": "box"}}},
        "quad": dict(props, bsdf={"type": "diffuse",
                                  "reflectance": 0.8}),
        "light": {"type": "point", "position": [0.5, 0.5, 1.5],
                  "intensity": 3.0},
    }
    img = np.asarray(mt.render(mt.load_dict(d), spp=16, max_depth=2,
                               seed=0))
    assert img.shape == (16, 16, 3)
    assert img.mean() > 1e-3           # the quad is visible and lit
