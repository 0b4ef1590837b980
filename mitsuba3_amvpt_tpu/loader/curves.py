"""Curve shapes: linearcurve / bsplinecurve
(src/shapes/{linearcurve,bsplinecurve}.cpp, 2.2k LoC).

The reference intersects analytic swept-sphere tubes via Embree/OptiX
curve primitives.  On TPU the tracer's primitive set is triangles +
spheres, so curves are tessellated into triangle tubes at load time
(documented approximation; refinement is controlled by ``subdiv`` —
samples per spline segment — and ``radial`` — ring resolution).  The
tessellation carries:

  * per-vertex radial normals (exact for a circular cross-section, so
    the hair BSDF's ``h = sin(gamma(wi))`` offset reconstruction is
    exact at hit points, hair.cpp:580-589),
  * per-vertex fiber tangents -> the SI frame aligns ``sh_t`` with the
    fiber axis (scene.py tangent-frame branch),
  * Mitsuba's curve UV parameterization: u = arclength along the curve
    in [0, 1], v = angle around the circumference in [0, 1).

File format (linearcurve.cpp docs): one control point per line as
``x y z radius``; blank lines separate curves.  B-spline curves need
>= 4 control points per curve (cubic uniform B-spline, knot vector
clamped the same way as bsplinecurve.cpp: first/last segments use
replicated end points).
"""

from __future__ import annotations

import numpy as np


def read_curve_file(path: str):
    """Parse a Mitsuba curve file -> list of (K, 4) float arrays."""
    curves, cur = [], []
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            t = line.split()
            if not t or t[0].startswith("#"):
                if cur:
                    curves.append(np.asarray(cur, np.float64))
                    cur = []
                continue
            cur.append([float(x) for x in t[:4]])
    if cur:
        curves.append(np.asarray(cur, np.float64))
    for i, c in enumerate(curves):
        if c.shape[0] < 2:
            raise ValueError(f"curve {i}: needs >= 2 control points")
    return curves


def _bspline_polyline(cp: np.ndarray, subdiv: int):
    """Cubic uniform B-spline with clamped ends -> dense polyline of
    (pos, radius) samples (bsplinecurve.cpp evaluation)."""
    if cp.shape[0] < 4:
        raise ValueError("bsplinecurve needs >= 4 control points per curve")
    # uniform (unclamped) cubic B-spline, K-3 segments — like the
    # reference, the curve does not interpolate the end control points
    P = cp
    n_seg = P.shape[0] - 3
    ts = np.linspace(0.0, 1.0, subdiv, endpoint=False)
    out = []
    b = np.stack([
        (1 - ts) ** 3 / 6.0,
        (3 * ts ** 3 - 6 * ts ** 2 + 4) / 6.0,
        (-3 * ts ** 3 + 3 * ts ** 2 + 3 * ts + 1) / 6.0,
        ts ** 3 / 6.0,
    ], axis=1)                       # (subdiv, 4)
    for s in range(n_seg):
        out.append(b @ P[s:s + 4])   # (subdiv, 4)
    # final point: t=1 of last segment
    b1 = np.array([0.0, 1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0])
    out.append((b1 @ P[n_seg - 1:n_seg + 3])[None])
    return np.concatenate(out, 0)


def _transport_frames(points: np.ndarray):
    """Parallel-transport an orthonormal cross-section frame along a
    polyline (rotation-minimizing, avoids tube twist)."""
    d = np.diff(points, axis=0)
    ln = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / np.maximum(ln, 1e-20)
    tang = np.concatenate([d[:1], 0.5 * (d[1:] + d[:-1]), d[-1:]], 0)
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-20)

    # initial frame
    t0 = tang[0]
    up = np.array([0.0, 1.0, 0.0]) if abs(t0[1]) < 0.9 else \
        np.array([1.0, 0.0, 0.0])
    b1 = np.cross(t0, up)
    b1 /= max(np.linalg.norm(b1), 1e-20)
    frames = [b1]
    for i in range(1, len(points)):
        # rotate previous b1 by the minimal rotation t_{i-1} -> t_i
        a, b = tang[i - 1], tang[i]
        v = np.cross(a, b)
        c = float(a @ b)
        if np.linalg.norm(v) < 1e-12 or c < -1.0 + 1e-9:
            frames.append(frames[-1])
            continue
        # Rodrigues via the double-reflection shortcut
        bv = frames[-1]
        bv = bv - (bv @ v) / (1.0 + c) * v if False else (
            bv * c + np.cross(v, bv) + v * (v @ bv) / (1.0 + c))
        bv = bv - (bv @ b) * b
        bv /= max(np.linalg.norm(bv), 1e-20)
        frames.append(bv)
    b1s = np.asarray(frames)
    b2s = np.cross(tang, b1s)
    return tang, b1s, b2s


def tessellate_tube(poly: np.ndarray, radial: int = 8, caps: bool = True):
    """Triangle tube around a polyline of (x, y, z, r) samples.

    Returns (verts, faces, normals, uvs, tangents)."""
    pts, rad = poly[:, :3], poly[:, 3]
    K = pts.shape[0]
    tang, b1, b2 = _transport_frames(pts)

    # arclength parameter
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    u = np.concatenate([[0.0], np.cumsum(seg)])
    u = u / max(u[-1], 1e-20)

    ang = 2.0 * np.pi * np.arange(radial) / radial
    ca, sa = np.cos(ang), np.sin(ang)
    # rings: (K, radial, 3)
    nrm = (ca[None, :, None] * b1[:, None, :]
           + sa[None, :, None] * b2[:, None, :])
    v = pts[:, None, :] + rad[:, None, None] * nrm
    vt = np.broadcast_to(tang[:, None, :], nrm.shape)
    uv = np.stack(np.broadcast_arrays(u[:, None], ang[None, :]
                                      / (2.0 * np.pi)), -1)

    verts = v.reshape(-1, 3)
    normals = nrm.reshape(-1, 3).copy()
    tangents = vt.reshape(-1, 3).copy()
    uvs = uv.reshape(-1, 2)

    faces = []
    for i in range(K - 1):
        for j in range(radial):
            j2 = (j + 1) % radial
            a, b = i * radial + j, i * radial + j2
            c, d = (i + 1) * radial + j, (i + 1) * radial + j2
            faces.append([a, b, c])
            faces.append([b, d, c])

    if caps:
        # spherical-ish endcaps: apex at p ∓/± r*tangent with the apex
        # normal along the fiber axis (linearcurve.cpp endcap behaviour)
        for end, i0 in ((0, 0), (1, K - 1)):
            sgn = -1.0 if end == 0 else 1.0
            apex = pts[i0] + sgn * rad[i0] * tang[i0]
            ai = len(verts)
            verts = np.concatenate([verts, apex[None]], 0)
            normals = np.concatenate([normals, (sgn * tang[i0])[None]], 0)
            tangents = np.concatenate([tangents, tang[i0][None]], 0)
            uvs = np.concatenate([uvs, [[u[i0], 0.0]]], 0)
            ring = i0 * radial
            for j in range(radial):
                j2 = (j + 1) % radial
                tri = ([ai, ring + j2, ring + j] if end == 0
                       else [ai, ring + j, ring + j2])
                faces.append(tri)

    return (verts, np.asarray(faces, np.int32), normals, uvs, tangents)


def load_curves(path: str, kind: str = "linear", subdiv: int = 4,
                radial: int = 8, to_world=None):
    """Load + tessellate all curves of a file into one merged mesh.
    ``to_world`` is applied to control-point *positions* only — radii
    are invariant to the transform (linearcurve.cpp docs).
    Returns (verts, faces, normals, uvs, tangents) in world space."""
    vs, fs, ns, uvs, ts = [], [], [], [], []
    off = 0
    for cp in read_curve_file(path):
        if to_world is not None:
            tw = np.asarray(to_world, np.float64)
            cp = np.concatenate(
                [(tw[:3, :3] @ cp[:, :3].T).T + tw[:3, 3], cp[:, 3:4]], 1)
        poly = cp if kind == "linear" else _bspline_polyline(cp, subdiv)
        v, f, n, uv, t = tessellate_tube(poly, radial=radial)
        vs.append(v)
        fs.append(f + off)
        ns.append(n)
        uvs.append(uv)
        ts.append(t)
        off += len(v)
    return (np.concatenate(vs, 0), np.concatenate(fs, 0),
            np.concatenate(ns, 0), np.concatenate(uvs, 0),
            np.concatenate(ts, 0))
