"""Feature showcase: hair fibers, an SDF-grid blob, and a measured
BRDF sphere in one scene.

    python examples/feature_showcase.py [--res 256] [--spp 64]

Writes showcase.png next to this script.  Uses baked fixtures for the
measured BRDF (utils/measured_bake.py) so no external data is needed.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_scene(res):
    import mitsuba3_amvpt_tpu as mt

    tmp = tempfile.mkdtemp(prefix="showcase_")

    # measured BRDF baked from an analytic rough gold-ish conductor
    from mitsuba3_amvpt_tpu.utils.measured_bake import bake_ggx_conductor
    bsdf_file = bake_ggx_conductor(
        os.path.join(tmp, "gold.bsdf"), alpha=0.2,
        eta=(0.14, 0.37, 1.44), k=(3.98, 2.39, 1.6))

    # a few hair fibers as a curve file
    rng = np.random.default_rng(7)
    lines = []
    for k in range(14):
        x = -1.3 + 0.2 * k + rng.uniform(-0.04, 0.04)
        bow = rng.uniform(-0.35, 0.35)
        for i in range(5):
            s = i / 4.0
            y = -1.0 + 2.0 * s
            lines.append(f"{x + bow * s * s:.4f} {y:.4f} "
                         f"{-0.4 + 0.1 * s:.4f} 0.035")
        lines.append("")
    curve_file = os.path.join(tmp, "hair.txt")
    with open(curve_file, "w") as fh:
        fh.write("\n".join(lines))

    # SDF blob: union of two spheres, smooth-min
    n = 48
    zz, yy, xx = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")

    def sph(cx, cy, cz, r):
        return np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2
                       + (zz - cz) ** 2) - r

    a, b = sph(0.38, 0.42, 0.5, 0.24), sph(0.63, 0.58, 0.5, 0.2)
    k_s = 0.08
    h = np.clip(0.5 + 0.5 * (b - a) / k_s, 0, 1)
    blob = b + (a - b) * h - k_s * h * (1 - h)

    return mt.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 42,
                   "to_world": {"lookat": {
                       "origin": [0.0, 0.6, 5.2], "target": [0, 0, 0],
                       "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": res,
                            "height": res,
                            "rfilter": {"type": "gaussian"}}},
        "env": {"type": "constant", "radiance": 0.7},
        "key": {"type": "point", "intensity": 60.0,
                "position": [3.0, 4.0, 4.0]},
        "floor": {"type": "rectangle",
                  "to_world": {"translate": [0, -1.05, 0],
                               "rotate": {"axis": [1, 0, 0],
                                          "angle": -90},
                               "scale": 6.0},
                  "bsdf": {"type": "diffuse", "reflectance": 0.5}},
        "hair": {"type": "linearcurve", "filename": curve_file,
                 "radial": 10,
                 "bsdf": {"type": "hair", "eumelanin": 0.9,
                          "pheomelanin": 0.4}},
        "blob": {"type": "sdfgrid", "grid": blob,
                 "to_world": {"ops": [{"scale": 2.0},
                                      {"translate": [-2.4, -1.05, -1.0]}]},
                 "bsdf": {"type": "roughplastic", "alpha": 0.08,
                          "diffuse_reflectance": [0.2, 0.45, 0.3]}},
        "ball": {"type": "sphere", "radius": 0.7,
                 "center": [1.6, -0.35, 0.6],
                 "bsdf": {"type": "measured", "filename": bsdf_file}},
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "showcase.png"))
    args = ap.parse_args()

    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.core.bitmap import write_image

    scene = build_scene(args.res)
    img = mt.render(scene, spp=args.spp, max_depth=6, seed=0)
    write_image(args.out, np.asarray(img))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
