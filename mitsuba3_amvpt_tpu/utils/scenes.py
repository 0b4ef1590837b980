"""Canonical test scenes as scene dicts.

Mirrors mitsuba's bundled cornell-box dict (mi.cornell_box()) and the
Veach MIS arrangement used by BASELINE configs; used by tests and
benchmarks.
"""

from __future__ import annotations

import numpy as np


def cornell_box(res: int = 256):
    """Cornell box exactly matching mi.cornell_box()
    (reference src/python/python/util.py:551-686)."""
    def T(*ops):
        # reference chains T().translate(...).rotate(...).scale(...):
        # rightmost op applied first; our 'ops' list applies last-op last.
        return {"ops": list(reversed(ops))}

    ref = lambda i: {"type": "ref", "id": i}  # noqa: E731
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 8},
        "sensor": {
            "type": "perspective",
            "fov": 39.3077, "fov_axis": "smaller",
            "near_clip": 0.001, "far_clip": 100.0,
            "to_world": T({"lookat": {"origin": [0, 0, 3.90],
                                      "target": [0, 0, 0],
                                      "up": [0, 1, 0]}}),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "gaussian"}},
        },
        "white": {"type": "diffuse",
                  "reflectance": [0.885809, 0.698859, 0.666422]},
        "green": {"type": "diffuse",
                  "reflectance": [0.105421, 0.37798, 0.076425]},
        "red": {"type": "diffuse",
                "reflectance": [0.570068, 0.0430135, 0.0443706]},
        "light": {
            "type": "rectangle",
            "to_world": T({"translate": [0.0, 0.99, 0.01]},
                          {"rotate": {"axis": [1, 0, 0], "angle": 90}},
                          {"scale": [0.23, 0.19, 0.19]}),
            "bsdf": ref("white"),
            "emitter": {"type": "area",
                        "radiance": [18.387, 13.9873, 6.75357]}},
        "floor": {"type": "rectangle", "bsdf": ref("white"),
                  "to_world": T({"translate": [0.0, -1.0, 0.0]},
                                {"rotate": {"axis": [1, 0, 0], "angle": -90}})},
        "ceiling": {"type": "rectangle", "bsdf": ref("white"),
                    "to_world": T({"translate": [0.0, 1.0, 0.0]},
                                  {"rotate": {"axis": [1, 0, 0], "angle": 90}})},
        "back": {"type": "rectangle", "bsdf": ref("white"),
                 "to_world": T({"translate": [0.0, 0.0, -1.0]})},
        "green-wall": {"type": "rectangle", "bsdf": ref("green"),
                       "to_world": T({"translate": [1.0, 0.0, 0.0]},
                                     {"rotate": {"axis": [0, 1, 0], "angle": -90}})},
        "red-wall": {"type": "rectangle", "bsdf": ref("red"),
                     "to_world": T({"translate": [-1.0, 0.0, 0.0]},
                                   {"rotate": {"axis": [0, 1, 0], "angle": 90}})},
        "small-box": {"type": "cube", "bsdf": ref("white"),
                      "to_world": T({"translate": [0.335, -0.7, 0.38]},
                                    {"rotate": {"axis": [0, 1, 0], "angle": -17}},
                                    {"scale": [0.3, 0.3, 0.3]})},
        "large-box": {"type": "cube", "bsdf": ref("white"),
                      "to_world": T({"translate": [-0.33, -0.4, -0.28]},
                                    {"rotate": {"axis": [0, 1, 0], "angle": 18.25}},
                                    {"scale": [0.3, 0.61, 0.3]})},
    }


def furnace(albedo=0.8, radiance=1.0, res: int = 64):
    """White-furnace: diffuse sphere in a constant environment.

    Closed-form: every pixel converges to `radiance` as depth -> inf
    (for albedo < 1); background = radiance exactly.
    """
    return {
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": {"lookat": {"origin": [0, 0, 4], "target": [0, 0, 0],
                                    "up": [0, 1, 0]}},
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
        },
        "env": {"type": "constant", "radiance": radiance},
        "ball": {"type": "sphere", "radius": 1.0,
                 "bsdf": {"type": "twosided",
                          "bsdf": {"type": "diffuse", "reflectance": albedo}}},
    }


def veach_mis(res: int = 512):
    """Veach MIS test: 4 glossy plates of increasing roughness lit by
    sphere emitters of decreasing size (BASELINE config 2)."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {
            "type": "perspective", "fov": 38,
            "to_world": {"lookat": {"origin": [0, 6, 27.5], "target": [0, -1.5, 2.5],
                                    "up": [0, 1, 0]}},
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "gaussian"}},
        },
        "floor": {"type": "rectangle",
                  "to_world": {"ops": [{"rotate": {"axis": [1, 0, 0], "angle": -90}},
                                       {"scale": [30, 1, 30]},
                                       {"translate": [0, -4.146, 10]}]},
                  "bsdf": {"type": "diffuse", "reflectance": 0.3}},
        "env": {"type": "constant", "radiance": 0.05},
    }
    # plates: tilted strips with increasing roughness
    alphas = [0.005, 0.02, 0.05, 0.1]
    zs = [2.7, 1.25, -0.87, -3.32]
    ys = [-3.28, -2.7, -2.29, -2.08]
    angles = [-25.0, -14.5, -6.5, -0.5]
    for i, (a, z, y, ang) in enumerate(zip(alphas, zs, ys, angles)):
        d[f"plate{i}"] = {
            "type": "rectangle",
            "to_world": {"ops": [{"rotate": {"axis": [1, 0, 0], "angle": -90 + ang}},
                                 {"scale": [4.0, 1.0, 0.6]},
                                 {"translate": [0, y, z]}]},
            "bsdf": {"type": "roughconductor", "material": "Ag", "alpha": a}}
    # sphere lights: radius decreasing, power constant-ish
    radii = [1.0, 0.3, 0.1, 0.03]
    xs = [-3.75, -1.25, 1.25, 3.75]
    for i, (r, x) in enumerate(zip(radii, xs)):
        power = 3.0
        rad = power / (np.pi * 4 * np.pi * r * r)
        d[f"light{i}"] = {
            "type": "sphere", "radius": r, "center": [x, 0, 0],
            "bsdf": {"type": "diffuse", "reflectance": 0.0},
            "emitter": {"type": "area", "radiance": rad}}
    return d


def _uv_sphere(n_theta, n_phi):
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi + 1)[:-1]
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(T) * np.cos(P), np.cos(T),
                  np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    idx = np.arange((n_theta + 1) * n_phi).reshape(n_theta + 1, n_phi)
    f = []
    for i in range(n_theta):
        a, b = idx[i], idx[i + 1]
        a2, b2 = np.roll(a, -1), np.roll(b, -1)
        f.append(np.stack([a, b, b2], -1))
        f.append(np.stack([a, b2, a2], -1))
    return v, np.concatenate(f, 0).astype(np.int32)


def sphere_field(n_tris_target: int, res: int = 256, grid: int = 6,
                 max_depth: int = 4):
    """Large-scene benchmark: a grid^3 field of tessellated spheres under
    an area light (~n_tris_target triangles).  The BASELINE config-5
    scale proxy (spectral ~1M-tri scene) for single-chip tracing."""
    per = max(n_tris_target // (grid * grid * grid), 32)
    n_theta = max(int(np.sqrt(per / 2)), 4)
    v0, f0 = _uv_sphere(n_theta, n_theta)
    verts, faces = [], []
    off = 0
    rng = np.random.default_rng(0)
    for i in range(grid):
        for j in range(grid):
            for k in range(grid):
                c = (np.array([i, j, k]) - (grid - 1) / 2.0) * 2.5
                r = 0.7 + 0.4 * rng.random()
                verts.append(v0 * r + c)
                faces.append(f0 + off)
                off += v0.shape[0]
    v = np.concatenate(verts, 0)
    f = np.concatenate(faces, 0)
    ext = grid * 2.5
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "sensor": {
            "type": "perspective", "fov": 60.0,
            "to_world": {"type": "lookat",
                         "origin": [0, 0.0, -ext * 1.4],
                         "target": [0, 0, 0], "up": [0, 1, 0]},
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
        },
        "spheres": {
            "type": "trimesh", "vertices": v, "faces": f,
            "face_normals": True,
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb",
                                     "value": [0.6, 0.5, 0.4]}},
        },
        "light": {
            # local +z (the rectangle normal) -> world -y: the light
            # hangs above the sphere field FACING DOWN.  (The round-1..3
            # orientation faced +y, away from the scene — the one-sided
            # area emitter lit nothing and the bigscene bench was
            # timing a black image with NEE inactive.)
            "type": "rectangle",
            "to_world": {"matrix": [
                [ext, 0, 0, 0], [0, 0, -ext, ext * 1.2],
                [0, ext, 0, 0], [0, 0, 0, 1]]},
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [8, 8, 8]}},
        },
    }
