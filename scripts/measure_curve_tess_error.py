"""Measure the silhouette error of tessellated curves vs a converged
tessellation (VERDICT r4 next #8: signed-off deviation note with the
error bound measured; reference exact primitive:
/root/reference/src/shapes/bsplinecurve.cpp Embree ROUND_LINEAR_CURVE).

An inscribed radial-n polygon under-covers a circle of radius r by at
most r*(1 - cos(pi/n)) radially (analytic bound); this script measures
the resulting IMAGE-level silhouette error: coverage-mask disagreement
and mean |dI| between radial=8 (default) / radial=16 and radial=64
(converged proxy) on a diagonally-viewed fiber.
"""
import os
import sys
import tempfile

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np                                  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import mitsuba3_amvpt_tpu as mt                     # noqa: E402


def render_radial(radial, res=96):
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "c.txt")
        with open(p, "w") as fh:
            fh.write("-1.5 -1.5 0 0.25\n1.5 1.5 0.6 0.25\n")
        sc = mt.load_dict({
            "type": "scene",
            "sensor": {"type": "perspective", "fov": 40,
                       "to_world": {"lookat": {
                           "origin": [0, 0, 5], "target": [0, 0, 0],
                           "up": [0, 1, 0]}},
                       "film": {"type": "hdrfilm", "width": res,
                                "height": res,
                                "rfilter": {"type": "box"}}},
            "light": {"type": "constant", "radiance": 1.0},
            "fiber": {"type": "linearcurve", "filename": p,
                      "radial": radial,
                      "bsdf": {"type": "diffuse", "reflectance": 0.0}}})
        return np.asarray(mt.render(sc, spp=64, max_depth=2, seed=0))


ref = render_radial(64)
mask_ref = ref.mean(-1) < 0.5
for radial in (8, 16, 32):
    img = render_radial(radial)
    mask = img.mean(-1) < 0.5
    dis = float(np.mean(mask != mask_ref))
    sil = float(np.sum(mask != mask_ref) / max(np.sum(mask_ref), 1))
    print(f"radial={radial:3d}: analytic radial sag "
          f"{(1-np.cos(np.pi/radial))*100:.2f}% of r; "
          f"coverage-pixel disagreement {dis*100:.3f}% of image, "
          f"{sil*100:.2f}% of fiber pixels; mean|dI| "
          f"{float(np.abs(img-ref).mean()):.5f}")
