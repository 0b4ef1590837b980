"""Grid / batch multi-view sensor construction.

Replaces the fork's GridSensor (src/sensors/grid.cpp, 479 LoC) and the
MultiSensor-ized batch sensor (src/sensors/batch.cpp): N sub-cameras are
stamped out of one base definition (the reference uses the Wrap deferred
property container, wrap.h:10-58 — here it's plain dict templating) and
stacked into a CameraBatch whose film is the quilt.

Layout generators (grid.cpp:182-226, SURVEY.md §A.7):
* cone mode — views fan across ``cone_deg`` around the focus point:
  per-view x-translation ``foc_dist * tan(off)`` and sample-space shear
  ``lens_shift.x = 0.5 * tan(off) / tan(fov/2)`` (off-axis Looking-Glass
  frusta),
* line mode — equal offsets along the camera x axis with the same shear
  (shift = 0.5 * offset / (foc * tan(fov/2))).
"""

from __future__ import annotations

import numpy as np

from ..render import sensor as sensor_mod
from ..core import math as m


def build_grid_sensor(spec, fov_x_fn, W, H):
    """spec: dict with grid layout; returns (CameraBatch, film_size)."""
    gx, gy = spec.get("grid", [spec.get("count", 8), 1])
    n = int(gx) * int(gy)
    base_tw = spec.get("to_world")
    from .dict_loader import _to_world
    tw0 = _to_world(base_tw)

    mode = spec.get("mode", "cone")
    foc = float(spec.get("focus_distance", spec.get("foc_dist", 1.0)))
    fov = fov_x_fn(spec, W, H)
    tan_half = np.tan(np.deg2rad(fov) / 2.0)

    tws, shifts = [], []
    if spec.get("type") == "batch" or "sensors" in spec:
        # batch sensor: explicit per-view cameras (batch.cpp:88)
        for sub in spec["sensors"]:
            tws.append(_to_world(sub.get("to_world")))
            shifts.append([0.0, 0.0])
    else:
        cone = np.deg2rad(float(spec.get("cone_deg", 40.0)))
        spacing = float(spec.get("spacing", 0.1))
        for i in range(n):
            frac = (i / (n - 1) - 0.5) if n > 1 else 0.0
            if mode == "cone":
                off = cone * frac
                dx = foc * np.tan(off)
                shift_x = 0.5 * np.tan(off) / tan_half
            else:  # line
                dx = spacing * frac * (n - 1)
                shift_x = 0.5 * dx / (foc * tan_half)
            t = tw0 @ m.translate([dx, 0.0, 0.0])
            tws.append(t)
            shifts.append([shift_x, 0.0])

    ctype = {"perspective": sensor_mod.S_PERSPECTIVE,
             "thinlens": sensor_mod.S_THINLENS}.get(
        spec.get("sub_type", "perspective"), sensor_mod.S_PERSPECTIVE)

    # per-view resolution = film / grid (grid.cpp:99-100 divisibility)
    assert W % gx == 0 and H % gy == 0, \
        "film resolution must be divisible by grid dims (grid.cpp:99)"
    vw, vh = W // gx, H // gy

    batch = sensor_mod.make_camera_batch(
        np.stack(tws), fov, (vw, vh), cam_type=ctype,
        lens_shift=np.asarray(shifts, np.float32),
        aperture_radius=float(spec.get("aperture_radius", 0.0)),
        focus_dist=foc, near_clip=float(spec.get("near_clip", 1e-2)),
        grid_dim=(int(gx), int(gy)),
        reverse_axis=bool(spec.get("reverse_axis", False)))
    return batch, (W, H)
