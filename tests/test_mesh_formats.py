"""Mesh importer tests: Mitsuba .serialized (V3/V4, multi-mesh,
shape_index), OBJ, PLY — mirroring src/shapes/tests/{test_obj,test_ply}.py
and the serialized.cpp format contract (serialized.cpp:198-405)."""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.loader import meshes


def _tri():
    v = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    f = np.array([[0, 1, 2]], np.int32)
    vn = np.tile([[0.0, 0, 1]], (3, 1))
    uv = v[:, :2].copy()
    return v, f, vn, uv


class TestSerialized:
    @pytest.mark.parametrize("version", [3, 4])
    def test_roundtrip(self, tmp_path, version):
        v, f, vn, uv = _tri()
        p = str(tmp_path / "m.serialized")
        meshes.write_serialized(p, [dict(v=v, f=f, vn=vn, uv=uv)],
                                version=version)
        rv, rf, rvn, ruv = meshes.load_serialized(p)
        np.testing.assert_allclose(rv, v, atol=1e-6)
        np.testing.assert_array_equal(rf, f)
        np.testing.assert_allclose(rvn, vn, atol=1e-6)
        np.testing.assert_allclose(ruv, uv, atol=1e-6)

    @pytest.mark.parametrize("version", [3, 4])
    def test_shape_index(self, tmp_path, version):
        v, f, vn, uv = _tri()
        p = str(tmp_path / "multi.serialized")
        meshes.write_serialized(
            p, [dict(v=v, f=f), dict(v=v + 5.0, f=f, vn=vn),
                dict(v=v - 2.0, f=f, uv=uv)], version=version)
        for k, shift in [(0, 0.0), (1, 5.0), (2, -2.0)]:
            rv, rf, rvn, ruv = meshes.load_serialized(p, shape_index=k)
            np.testing.assert_allclose(rv, v + shift, atol=1e-6)
            np.testing.assert_array_equal(rf, f)
        assert meshes.load_serialized(p, 1)[2] is not None
        assert meshes.load_serialized(p, 2)[3] is not None
        with pytest.raises(ValueError):
            meshes.load_serialized(p, 3)

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "junk.serialized"
        p.write_bytes(b"\x00\x01\x02\x03rubbish")
        with pytest.raises(ValueError):
            meshes.load_serialized(str(p))

    def test_scene_load(self, tmp_path):
        """serialized shape through load_dict renders like trimesh."""
        v, f, vn, uv = _tri()
        p = str(tmp_path / "m.serialized")
        meshes.write_serialized(p, [dict(v=v, f=f, vn=vn)])
        sc = mt.load_dict({
            "type": "scene",
            "s": {"type": "serialized", "filename": p},
        })
        np.testing.assert_allclose(
            np.asarray(sc.geom.verts)[:3], v, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sc.geom.faces)[:1], f)


class TestObjPly:
    def test_obj(self, tmp_path):
        p = tmp_path / "m.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                     "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
                     "f 1/1/1 2/2/1 4/4/1 3/3/1\n")
        v, f, vn, uv = meshes.load_obj(str(p))
        assert f.shape == (2, 3)            # quad fan-triangulated
        np.testing.assert_allclose(vn, np.tile([[0, 0, 1.0]], (6, 1)))
        assert uv.shape == (6, 2)

    def test_obj_negative_indices(self, tmp_path):
        p = tmp_path / "m.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        v, f, _, _ = meshes.load_obj(str(p))
        np.testing.assert_array_equal(f, [[0, 1, 2]])

    def test_ply_ascii(self, tmp_path):
        p = tmp_path / "m.ply"
        p.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "3 0 1 2\n")
        v, f, vn, uv = meshes.load_ply(str(p))
        np.testing.assert_allclose(v, _tri()[0])
        np.testing.assert_array_equal(f, [[0, 1, 2]])
