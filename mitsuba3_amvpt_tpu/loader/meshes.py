"""Procedural mesh generators + OBJ/PLY import.

Replaces the reference's shape plugins that produce triangle meshes
(src/shapes/{rectangle,cube,disk,cylinder,obj,ply}.cpp).  All generators
return (verts (V,3) f64, faces (F,3) i32, normals or None, uvs or None)
in *object space*; the loader bakes to_world.
"""

from __future__ import annotations

import numpy as np


def rectangle():
    """[-1,1]^2 quad in z=0 facing +z (src/shapes/rectangle.cpp)."""
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
    f = np.array([[0, 1, 2], [2, 3, 0]], np.int32)
    n = np.tile([0.0, 0.0, 1.0], (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    return v, f, n, uv


def cube():
    """[-1,1]^3 box, outward normals (src/shapes/cube.cpp)."""
    verts, faces, normals, uvs = [], [], [], []
    axes = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    for ax, (a, b, c) in enumerate(axes):
        for s in (-1.0, 1.0):
            base = len(verts)
            for (ua, ub) in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
                p = np.zeros(3)
                p[c] = s
                p[a] = ua
                p[b] = ub * s  # keep winding outward
                verts.append(p)
                n = np.zeros(3)
                n[c] = s
                normals.append(n)
                uvs.append([(ua + 1) / 2, (ub + 1) / 2])
            faces.append([base, base + 1, base + 2])
            faces.append([base + 2, base + 3, base])
    return (np.asarray(verts), np.asarray(faces, np.int32),
            np.asarray(normals), np.asarray(uvs))


def disk(res: int = 64):
    """Unit disk in z=0 (src/shapes/disk.cpp), fan triangulation."""
    ang = np.linspace(0, 2 * np.pi, res, endpoint=False)
    rim = np.stack([np.cos(ang), np.sin(ang), np.zeros(res)], -1)
    v = np.concatenate([[[0, 0, 0]], rim], 0)
    f = np.array([[0, 1 + i, 1 + (i + 1) % res] for i in range(res)], np.int32)
    n = np.tile([0.0, 0.0, 1.0], (res + 1, 1))
    uv = 0.5 * (v[:, :2] + 1.0)
    return v, f, n, uv


def cylinder(res: int = 32):
    """Unit cylinder along +z, radius 1, height 1 (cylinder.cpp), open."""
    ang = np.linspace(0, 2 * np.pi, res, endpoint=False)
    c, s = np.cos(ang), np.sin(ang)
    bot = np.stack([c, s, np.zeros(res)], -1)
    top = np.stack([c, s, np.ones(res)], -1)
    v = np.concatenate([bot, top], 0)
    n = np.concatenate([np.stack([c, s, np.zeros(res)], -1)] * 2, 0)
    f = []
    for i in range(res):
        j = (i + 1) % res
        f.append([i, j, res + i])
        f.append([j, res + j, res + i])
    uv = np.stack([np.concatenate([ang, ang]) / (2 * np.pi),
                   np.concatenate([np.zeros(res), np.ones(res)])], -1)
    return v, np.asarray(f, np.int32), n, uv


def sphere_mesh(res: int = 32):
    """UV-sphere mesh fallback (analytic spheres preferred)."""
    th = np.linspace(0, np.pi, res + 1)
    ph = np.linspace(0, 2 * np.pi, 2 * res, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1)
    v = v.reshape(-1, 3)
    f = []
    W = 2 * res
    for i in range(res):
        for j in range(W):
            a = i * W + j
            b = i * W + (j + 1) % W
            c = (i + 1) * W + j
            d = (i + 1) * W + (j + 1) % W
            if i > 0:
                f.append([a, c, b])
            if i < res - 1:
                f.append([b, c, d])
    return v, np.asarray(f, np.int32), v.copy(), None


def load_obj(path: str):
    """Minimal OBJ importer (src/shapes/obj.cpp equivalent): v/vn/vt/f
    with polygon fan triangulation."""
    vs, vns, vts = [], [], []
    fv, fn, ft = [], [], []
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                vs.append([float(x) for x in t[1:4]])
            elif t[0] == "vn":
                vns.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                vts.append([float(x) for x in t[1:3]])
            elif t[0] == "f":
                idx = []
                for w in t[1:]:
                    parts = (w.split("/") + ["", ""])[:3]
                    vi = int(parts[0])
                    ti = int(parts[1]) if parts[1] else 0
                    ni = int(parts[2]) if parts[2] else 0
                    idx.append((vi, ti, ni))
                for k in range(1, len(idx) - 1):
                    for (vi, ti, ni) in (idx[0], idx[k], idx[k + 1]):
                        fv.append(vi - 1 if vi > 0 else len(vs) + vi)
                        ft.append(ti - 1 if ti > 0 else (len(vts) + ti if ti else -1))
                        fn.append(ni - 1 if ni > 0 else (len(vns) + ni if ni else -1))
    v = np.asarray(vs, np.float64)
    faces_flat = np.asarray(fv, np.int32).reshape(-1, 3)
    # re-index: OBJ allows per-corner attribute indices; expand to
    # per-corner vertices when normals/uvs present
    if (vns and any(i >= 0 for i in fn)) or (vts and any(i >= 0 for i in ft)):
        nv = v[faces_flat.reshape(-1)]
        nn = (np.asarray(vns, np.float64)[np.asarray(fn).clip(0)]
              if vns else None)
        nt = (np.asarray(vts, np.float64)[np.asarray(ft).clip(0)]
              if vts else None)
        nf = np.arange(len(nv), dtype=np.int32).reshape(-1, 3)
        return nv, nf, nn, nt
    return v, faces_flat, None, None


def load_ply(path: str):
    """Minimal binary/ascii PLY importer (src/shapes/ply.cpp)."""
    with open(path, "rb") as fh:
        header = []
        while True:
            line = fh.readline().decode("ascii", "replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vert = n_face = 0
        vert_props = []
        cur = None
        for l in header:
            t = l.split()
            if not t:
                continue
            if t[0] == "element":
                cur = t[1]
                if t[1] == "vertex":
                    n_vert = int(t[2])
                elif t[1] == "face":
                    n_face = int(t[2])
            elif t[0] == "property" and cur == "vertex" and t[1] != "list":
                vert_props.append((t[2], t[1]))
        type_map = {"float": "f4", "float32": "f4", "double": "f8",
                    "uchar": "u1", "uint8": "u1", "int": "i4", "uint": "u4",
                    "short": "i2", "ushort": "u2", "char": "i1",
                    "int32": "i4"}
        endian = "<" if "little" in fmt else ">"
        if fmt == "ascii":
            vd = np.loadtxt([fh.readline() for _ in range(n_vert)])
            vd = vd.reshape(n_vert, -1)
            names = [p[0] for p in vert_props]
            faces = []
            for _ in range(n_face):
                t = fh.readline().split()
                cnt = int(t[0])
                poly = [int(x) for x in t[1:1 + cnt]]
                for k in range(1, cnt - 1):
                    faces.append([poly[0], poly[k], poly[k + 1]])
            arr = {nm: vd[:, i] for i, nm in enumerate(names)}
        else:
            dt = np.dtype([(nm, endian + type_map[ty]) for nm, ty in vert_props])
            vd = np.frombuffer(fh.read(dt.itemsize * n_vert), dt)
            arr = {nm: vd[nm].astype(np.float64) for nm, _ in vert_props}
            faces = []
            # face list property types: assume uchar count + int indices
            raw = fh.read()
            off = 0
            cnt_t = np.dtype(endian + "u1")
            idx_t = np.dtype(endian + "i4")
            for _ in range(n_face):
                cnt = int(np.frombuffer(raw, cnt_t, 1, off)[0])
                off += 1
                poly = np.frombuffer(raw, idx_t, cnt, off)
                off += 4 * cnt
                for k in range(1, cnt - 1):
                    faces.append([poly[0], poly[k], poly[k + 1]])
        v = np.stack([arr["x"], arr["y"], arr["z"]], -1)
        n = (np.stack([arr["nx"], arr["ny"], arr["nz"]], -1)
             if "nx" in arr else None)
        uv = (np.stack([arr["u"], arr["v"]], -1) if "u" in arr
              else (np.stack([arr["s"], arr["t"]], -1) if "s" in arr else None))
        return v, np.asarray(faces, np.int32), n, uv


def load_serialized(path: str, shape_index: int = 0):
    """Mitsuba .serialized mesh import (src/shapes/serialized.cpp:198-405).

    Layout: uint16 magic 0x041C, uint16 version (V3=3 / V4=4), then one
    zlib stream per mesh.  A uint32 mesh count sits at the very end of
    the file, preceded by the per-mesh start offsets (uint64 in V4,
    uint32 in V3).  Inside the stream: uint32 flags, (V4) null-terminated
    name, uint64 vertex/face counts, positions, [normals], [texcoords],
    [colors, skipped], uint32 face indices.
    """
    import zlib

    HAS_NORMALS, HAS_TEXCOORDS, HAS_COLORS = 0x0001, 0x0002, 0x0008
    FACE_NORMALS, DOUBLE_PREC = 0x0010, 0x2000

    with open(path, "rb") as fh:
        raw = fh.read()
    magic, version = np.frombuffer(raw, "<u2", 2, 0)
    if magic != 0x041C:
        raise ValueError(f"{path}: not a Mitsuba serialized file")
    if version not in (3, 4):
        raise ValueError(f"{path}: unsupported version {version}")

    start = 4
    if shape_index != 0:
        count = int(np.frombuffer(raw, "<u4", 1, len(raw) - 4)[0])
        if shape_index >= count:
            raise ValueError(f"shape_index {shape_index} out of range "
                             f"(file holds {count} meshes)")
        if version == 4:
            off_pos = len(raw) - 4 - 8 * (count - shape_index)
            start = int(np.frombuffer(raw, "<u8", 1, off_pos)[0]) + 4
        else:
            off_pos = len(raw) - 4 * (count - shape_index + 1)
            start = int(np.frombuffer(raw, "<u4", 1, off_pos)[0]) + 4

    data = zlib.decompressobj().decompress(raw[start:])

    off = 0
    flags = int(np.frombuffer(data, "<u4", 1, off)[0]); off += 4
    if version == 4:                      # skip null-terminated name
        off = data.index(b"\x00", off) + 1
    n_vert, n_face = np.frombuffer(data, "<u8", 2, off).astype(np.int64)
    off += 16

    ftype = np.dtype("<f8") if flags & DOUBLE_PREC else np.dtype("<f4")

    def read(n):
        nonlocal off
        out = np.frombuffer(data, ftype, n, off).astype(np.float64)
        off += n * ftype.itemsize
        return out

    v = read(n_vert * 3).reshape(-1, 3)
    vn = None
    if flags & HAS_NORMALS:
        nrm = read(n_vert * 3).reshape(-1, 3)
        if not flags & FACE_NORMALS:
            vn = nrm
    uv = read(n_vert * 2).reshape(-1, 2) if flags & HAS_TEXCOORDS else None
    if flags & HAS_COLORS:
        read(n_vert * 3)
    f = np.frombuffer(data, "<u4", n_face * 3, off).astype(
        np.int32).reshape(-1, 3)
    return v, f, vn, uv


def write_serialized(path: str, meshes, version: int = 4):
    """Write a V3/V4 .serialized file (inverse of load_serialized; used
    by tests and export tooling).  ``meshes`` is a list of dicts with
    keys v, f and optional vn, uv, name."""
    import zlib

    header = np.asarray([0x041C, version], "<u2").tobytes()
    blobs, offsets, pos = [], [], 0
    for msh in meshes:
        v = np.asarray(msh["v"], np.float32)
        f = np.asarray(msh["f"], np.uint32)
        vn = msh.get("vn")
        uv = msh.get("uv")
        flags = 0x1000
        if vn is not None:
            flags |= 0x0001
        if uv is not None:
            flags |= 0x0002
        parts = [np.uint32(flags).tobytes()]
        if version == 4:
            parts.append(msh.get("name", "mesh").encode() + b"\x00")
        parts.append(np.asarray([len(v), len(f)], "<u8").tobytes())
        parts.append(v.astype("<f4").tobytes())
        if vn is not None:
            parts.append(np.asarray(vn, "<f4").tobytes())
        if uv is not None:
            parts.append(np.asarray(uv, "<f4").tobytes())
        parts.append(f.astype("<u4").tobytes())
        # every chunk carries its own magic+version header; the first
        # chunk's header doubles as the file header (serialized.cpp:305)
        blob = header + zlib.compress(b"".join(parts))
        offsets.append(pos)
        blobs.append(blob)
        pos += len(blob)

    with open(path, "wb") as fh:
        for blob in blobs:
            fh.write(blob)
        if version == 4:
            fh.write(np.asarray(offsets, "<u8").tobytes())
        else:
            fh.write(np.asarray(offsets, "<u4").tobytes())
        fh.write(np.uint32(len(blobs)).tobytes())
    return path
