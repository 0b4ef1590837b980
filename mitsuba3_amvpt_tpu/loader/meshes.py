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
