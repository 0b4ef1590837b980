"""Quilt / lenticular utilities for Looking-Glass-style displays.

Replaces the fork's GUI display path and helper scripts:
 * quilt slicing (reference /root/reference/to_gif.py: quilt -> per-view
   frames),
 * lenticular interleave (src/mitsuba/program.cpp:199-276
   ``display_image``: per-subpixel view selection
   ``z = pitch*(x + c*subp + (1-y)*tilt) - center``, quilt tile lookup,
   focus shift),
 * Looking Glass calibration presets (src/mitsuba/preset.h:12-108:
   center/focus/pitch/tilt/subp/view count/grid/flip records with CSV
   import/export).

The SDL/ImGui GUI itself is host-side presentation and out of scope; the
compute (interleave) is here as a jnp function so a notebook or the CLI
can produce display-ready images.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LKGPreset:
    """Looking Glass calibration record (preset.h:12-108)."""

    name: str = "portrait"
    center: float = 0.565845
    focus: float = 0.0
    pitch: float = 52.59
    tilt: float = -7.19
    subp: float = 1.0 / (1536 * 3)
    n_views: int = 48
    grid: tuple = (8, 6)
    flip_x: bool = False
    flip_y: bool = False

    def to_csv_row(self):
        return (f"{self.name},{self.center},{self.focus},{self.pitch},"
                f"{self.tilt},{self.subp},{self.n_views},"
                f"{self.grid[0]},{self.grid[1]},"
                f"{int(self.flip_x)},{int(self.flip_y)}")

    @staticmethod
    def from_csv_row(row: str) -> "LKGPreset":
        t = row.strip().split(",")
        return LKGPreset(name=t[0], center=float(t[1]), focus=float(t[2]),
                         pitch=float(t[3]), tilt=float(t[4]),
                         subp=float(t[5]), n_views=int(t[6]),
                         grid=(int(t[7]), int(t[8])),
                         flip_x=bool(int(t[9])), flip_y=bool(int(t[10])))


def save_presets(path: str, presets):
    with open(path, "w") as f:
        f.write("name,center,focus,pitch,tilt,subp,views,gx,gy,fx,fy\n")
        for p in presets:
            f.write(p.to_csv_row() + "\n")


def load_presets(path: str):
    with open(path) as f:
        lines = f.read().strip().splitlines()[1:]
    return [LKGPreset.from_csv_row(r) for r in lines if r.strip()]


def quilt_slice(quilt, grid, reverse_axis: bool = False):
    """Quilt image -> list of per-view images (to_gif.py behavior)."""
    quilt = np.asarray(quilt)
    gx, gy = grid
    H, W = quilt.shape[:2]
    vh, vw = H // gy, W // gx
    views = []
    rows = range(gy - 1, -1, -1) if reverse_axis else range(gy)
    for iy in rows:
        for ix in range(gx):
            views.append(quilt[iy * vh:(iy + 1) * vh, ix * vw:(ix + 1) * vw])
    return views


def quilt_assemble(views, grid, reverse_axis: bool = False):
    """Inverse of quilt_slice."""
    gx, gy = grid
    vh, vw = views[0].shape[:2]
    out = np.zeros((vh * gy, vw * gx) + views[0].shape[2:], views[0].dtype)
    rows = range(gy - 1, -1, -1) if reverse_axis else range(gy)
    k = 0
    for iy in rows:
        for ix in range(gx):
            out[iy * vh:(iy + 1) * vh, ix * vw:(ix + 1) * vw] = views[k]
            k += 1
    return out


def lenticular_interleave(quilt, preset: LKGPreset, out_res=(1536, 2048)):
    """Quilt -> lenticular-interleaved display image
    (program.cpp:199-276 display_image).

    For every output subpixel (x, y, c): the view index derives from the
    fractional lenticular phase ``z = pitch*(x' + c*subp + (1-y')*tilt)
    - center``; the quilt tile for ``floor(frac(z)*n_views)`` is sampled
    at (x', y') with the focus shift ``focus*(view/n - 0.5)``.
    """
    quilt = jnp.asarray(quilt)
    W_out, H_out = out_res
    gx, gy = preset.grid
    Hq, Wq = quilt.shape[:2]
    vh, vw = Hq // gy, Wq // gx
    n = preset.n_views

    xs = (jnp.arange(W_out) + 0.5) / W_out
    ys = (jnp.arange(H_out) + 0.5) / H_out
    X, Y = jnp.meshgrid(xs, ys)
    out = []
    for c in range(3):
        z = preset.pitch * (X + c * preset.subp
                            + (1.0 - Y) * preset.tilt) - preset.center
        frac = z - jnp.floor(z)
        view = jnp.clip((frac * n).astype(jnp.int32), 0, n - 1)
        if preset.flip_x:
            view = n - 1 - view
        # focus shift (program.cpp focus term)
        xq = X + preset.focus * (view.astype(jnp.float32) / n - 0.5)
        xq = jnp.clip(xq, 0.0, 1.0 - 1e-6)
        yq = Y
        ix = view % gx
        iy = view // gx
        px = (ix * vw + (xq * vw).astype(jnp.int32))
        py = (iy * vh + (yq * vh).astype(jnp.int32))
        py = jnp.clip(py, 0, Hq - 1)
        px = jnp.clip(px, 0, Wq - 1)
        out.append(quilt[py, px, c])
    return jnp.stack(out, -1)
