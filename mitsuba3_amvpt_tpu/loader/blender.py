"""Blender-exporter mesh importer (src/shapes/blender.cpp:443 analog).

The reference plugin is fed RAW POINTERS into Blender's in-memory mesh
structures by the mitsuba-blender add-on (GeometryExporter.save_mesh)
and assembles a Mitsuba mesh for one material slot.  This analog does
the same job host-side with numpy: pointer properties are read through
ctypes into arrays, decoded per Blender-version layout, and welded
into (vertices, faces, normals, uvs, colors) for the generic trimesh
ingestion path.  Supported layout families match the reference:

* Blender 2.xx-3.0: ``MVert`` with short normals, ``MLoop``/
  ``MLoopTri``/``MPoly`` structs, ``MLoopUV``/``MLoopCol`` loops.
* Blender 3.1-3.4: ``MVert`` without normals + separate float normal
  buffer; 3.4 adds the ``mat_indices`` int buffer.
* Blender 3.5: plain float vertex/uv buffers.
* Blender 3.6+: ``loops``/``loop_tris``/``polys`` are plain int
  buffers and flat shading comes from the ``sharp_face`` bool buffer.

Vertex welding follows blender.cpp's hash map exactly — a corner is
unique by (blender vertex id, smooth?, normal-or-poly, uv) — done here
as one vectorized ``np.unique`` over bit-exact key rows.
"""

from __future__ import annotations

import ctypes

import numpy as np

_MLOOP = np.dtype([("v", "<u4"), ("e", "<u4")])
_MLOOPTRI = np.dtype([("tri", "<u4", 3), ("poly", "<u4")])
_MPOLY = np.dtype([("loopstart", "<i4"), ("totloop", "<i4"),
                   ("mat_nr", "<i2"), ("flag", "i1"), ("_pad", "i1")])
_MVERT2 = np.dtype([("co", "<f4", 3), ("no", "<i2", 3),
                    ("flag", "i1"), ("bweight", "i1")])
_MVERT3 = np.dtype([("co", "<f4", 3), ("flag", "i1"), ("bweight", "i1"),
                    ("_pad", "i1", 2)])
_MLOOPUV = np.dtype([("uv", "<f4", 2), ("flag", "<i4")])
_MLOOPCOL = np.dtype([("r", "u1"), ("g", "u1"), ("b", "u1"), ("a", "u1")])
_ME_SMOOTH = 1


def _buf(ptr: int, dtype, count: int) -> np.ndarray:
    """Copy ``count`` items of ``dtype`` at raw address ``ptr``."""
    nbytes = int(np.dtype(dtype).itemsize) * int(count)
    raw = ctypes.string_at(int(ptr), nbytes)
    return np.frombuffer(raw, dtype=dtype, count=int(count)).copy()


def _version(s: str):
    return tuple(int(x) for x in str(s).split(".")[:3])


def load_blender_mesh(props: dict) -> dict:
    """Decode one material slot of a Blender mesh -> trimesh dict.

    ``props`` uses the reference plugin's property names
    (blender.cpp:105-163): name, version, mat_nr, vert_count,
    loop_tri_count, loops, loop_tris, polys, verts (+ normals, uvs,
    mat_indices, sharp_face, vertex_<name> color layers) — pointer
    fields are integer addresses into live Blender buffers.
    """
    for k in ("name", "version", "mat_nr", "vert_count",
              "loop_tri_count", "loops", "loop_tris", "polys", "verts"):
        if k not in props:
            raise ValueError(
                f"blender mesh {props.get('name', '?')!r}: "
                f"missing property {k!r}")
    ver = _version(props["version"])
    mat_nr = int(props["mat_nr"])
    vert_count = int(props["vert_count"])
    ntri = int(props["loop_tri_count"])
    if ntri == 0:
        return dict(vertices=np.zeros((0, 3)), faces=np.zeros((0, 3),
                    np.int32), face_normals=False)

    # ---- decode the tri -> loop -> vertex indirection per layout
    if ver >= (3, 6, 0):
        tri_loops = _buf(props["loop_tris"], "<i4", ntri * 3) \
            .reshape(ntri, 3)
        face_id = _buf(props["polys"], "<i4", ntri)
        nloops = int(tri_loops.max()) + 1
        loop_v = _buf(props["loops"], "<i4", nloops)
        polys_old = None
    else:
        tl = _buf(props["loop_tris"], _MLOOPTRI, ntri)
        tri_loops = tl["tri"].astype(np.int64)
        face_id = tl["poly"].astype(np.int64)
        nloops = int(tri_loops.max()) + 1
        loop_v = _buf(props["loops"], _MLOOP, nloops)["v"]
        npolys = int(face_id.max()) + 1
        polys_old = _buf(props["polys"], _MPOLY, npolys)

    # ---- vertices (+ legacy short normals)
    no_short = None
    if ver <= (3, 0, 0):
        mv = _buf(props["verts"], _MVERT2, vert_count)
        verts = mv["co"].astype(np.float64)
        no_short = mv["no"].astype(np.float64) / 32767.0
    elif (3, 1, 0) <= ver <= (3, 4, 99):
        verts = _buf(props["verts"], _MVERT3,
                     vert_count)["co"].astype(np.float64)
    else:
        verts = _buf(props["verts"], "<f4",
                     vert_count * 3).reshape(-1, 3).astype(np.float64)

    if props.get("normals"):
        vnorm = _buf(props["normals"], "<f4",
                     vert_count * 3).reshape(-1, 3).astype(np.float64)
    else:
        vnorm = no_short

    # ---- per-face material + smoothness
    if ver >= (3, 6, 0):
        npolys = int(face_id.max()) + 1
        if props.get("sharp_face"):
            sharp = _buf(props["sharp_face"], "u1", npolys) != 0
        else:
            sharp = np.zeros(npolys, bool)       # globally smooth
        smooth_face = ~sharp[face_id]
        if ver >= (3, 4, 0) and props.get("mat_indices"):
            mat_idx = _buf(props["mat_indices"], "<i4", npolys)
            keep = mat_idx[face_id] == mat_nr
        else:
            keep = np.ones(ntri, bool)
    else:
        smooth_face = (polys_old["flag"][face_id]
                       & _ME_SMOOTH).astype(bool)
        if ver >= (3, 4, 0) and props.get("mat_indices"):
            mat_idx = _buf(props["mat_indices"], "<i4",
                           int(face_id.max()) + 1)
            keep = mat_idx[face_id] == mat_nr
        else:
            keep = polys_old["mat_nr"][face_id] == mat_nr

    tri_loops = tri_loops[keep]
    face_id = face_id[keep]
    smooth_face = smooth_face[keep]
    ntri = tri_loops.shape[0]
    if ntri == 0:
        return dict(vertices=np.zeros((0, 3)), faces=np.zeros((0, 3),
                    np.int32), face_normals=False)

    # globally flat <=> no face is smooth (blender.cpp m_face_normals)
    face_normals = not bool(smooth_face.any())

    # ---- uv / color loop layers
    uv_loop = None
    if props.get("uvs"):
        if ver <= (3, 4, 99):
            uv_loop = _buf(props["uvs"], _MLOOPUV,
                           nloops)["uv"].astype(np.float64)
        else:
            uv_loop = _buf(props["uvs"], "<f4",
                           nloops * 2).reshape(-1, 2).astype(np.float64)
        uv_loop[:, 1] = 1.0 - uv_loop[:, 1]
    col_layers = {k[len("vertex_"):]: _buf(v, _MLOOPCOL, nloops)
                  for k, v in props.items() if k.startswith("vertex_")}

    # ---- per-corner arrays (ntri, 3)
    corner_v = loop_v[tri_loops].astype(np.int64)
    if (corner_v >= vert_count).any():
        raise ValueError(f"blender mesh {props['name']!r}: reference "
                         f"to invalid vertex {int(corner_v.max())}")
    p = verts[corner_v]                                  # (T, 3, 3)
    fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])  # flat normals
    fl = np.linalg.norm(fn, axis=-1, keepdims=True)
    degenerate = ((fl[:, 0] == 0.0) & ~smooth_face
                  & (not face_normals))
    fn = fn / np.maximum(fl, 1e-300)

    if not face_normals:
        if vnorm is None and smooth_face.any():
            raise ValueError(
                f"blender mesh {props['name']!r}: smooth faces but no "
                "normal data")
        n_corner = np.where(
            smooth_face[:, None, None],
            (vnorm[corner_v] if vnorm is not None
             else np.zeros_like(p)),
            fn[:, None, :])
        nl = np.linalg.norm(n_corner, axis=-1, keepdims=True)
        if (smooth_face & (nl[:, :, 0] == 0.0).any(-1)).any():
            raise ValueError(
                f"blender mesh {props['name']!r}: invalid normals!")
        n_corner = n_corner / np.maximum(nl, 1e-300)
    else:
        n_corner = np.zeros_like(p)

    uv_corner = (uv_loop[tri_loops] if uv_loop is not None
                 else np.zeros((ntri, 3, 2)))

    # ---- weld: corner key = (vert id, smooth, poly-or-(-1),
    # bit-exact normal, bit-exact uv) — blender.cpp's Key struct
    poly_key = np.where(smooth_face, -1, face_id)[:, None]
    key = np.concatenate([
        corner_v.reshape(-1, 1),
        np.broadcast_to(smooth_face[:, None].astype(np.int64),
                        (ntri, 3)).reshape(-1, 1),
        np.broadcast_to(poly_key, (ntri, 3)).reshape(-1, 1),
        n_corner.astype(np.float32).view(np.int32).astype(
            np.int64).reshape(-1, 3),
        uv_corner.astype(np.float32).view(np.int32).astype(
            np.int64).reshape(-1, 2),
    ], axis=1)
    uniq, first, inv = np.unique(key, axis=0, return_index=True,
                                 return_inverse=True)
    faces = inv.reshape(ntri, 3).astype(np.int32)[~degenerate]

    out = dict(
        vertices=verts[corner_v.reshape(-1)[first]],
        faces=faces,
        face_normals=face_normals,
    )
    if not face_normals:
        out["normals"] = n_corner.reshape(-1, 3)[first]
    if uv_loop is not None:
        out["uvs"] = uv_corner.reshape(-1, 2)[first]
    if col_layers:
        # first color layer -> vertex colors (mesh_attribute texture)
        cl = next(iter(col_layers.values()))
        rgba = np.stack([cl["r"], cl["g"], cl["b"]],
                        -1).astype(np.float64) / 255.0
        out["vertex_colors"] = rgba[tri_loops.reshape(-1)[first]]
    return out
