"""3D volume grids for heterogeneous media.

TPU-native replacement for the reference's Volume plugins
(src/volumes/{gridvolume,constvolume}.cpp + include/mitsuba/render/
volumegrid.h): every grid in the scene is flattened into one voxel
buffer; per-volume (offset, resolution, world->local transform)
metadata drives trilinear interpolation.  Like TextureTable, the voxel
buffer is a differentiable leaf — density/albedo grids can be recovered
by inverse rendering through PRB.

Layout matches the reference's VolumeGrid: data index
``((z*ny + y)*nx + x)`` (x fastest), trilinear samples located at grid
*points* ``p_local * (res-1)`` (gridvolume.cpp FilterType::Trilinear),
zero outside the unit cube in volume-local coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import math as m


@struct.dataclass
class VolumeGridTable:
    voxels: jnp.ndarray    # (T_total, 3) float32 — differentiable
    offset: jnp.ndarray    # (K,) int32 start row in voxels
    nx: jnp.ndarray        # (K,) int32
    ny: jnp.ndarray        # (K,) int32
    nz: jnp.ndarray        # (K,) int32
    to_local: jnp.ndarray  # (K, 4, 4) world -> unit-cube volume coords
    vmax: jnp.ndarray      # (K,) max voxel value over all channels

    @staticmethod
    def empty() -> "VolumeGridTable":
        return VolumeGridTable(
            voxels=jnp.ones((1, 3), jnp.float32),
            offset=jnp.zeros((1,), jnp.int32),
            nx=jnp.ones((1,), jnp.int32),
            ny=jnp.ones((1,), jnp.int32),
            nz=jnp.ones((1,), jnp.int32),
            to_local=jnp.eye(4)[None],
            vmax=jnp.ones((1,), jnp.float32))

    @staticmethod
    def build(grids) -> "VolumeGridTable":
        """grids: list of (data (D,H,W) or (D,H,W,C) ndarray, to_world 4x4)."""
        if len(grids) == 0:
            return VolumeGridTable.empty()
        offs, nxs, nys, nzs, tls, vms, flat = [], [], [], [], [], [], []
        cur = 0
        for data, to_world in grids:
            data = np.asarray(data, np.float32)
            if data.ndim == 3:
                data = np.repeat(data[..., None], 3, -1)
            if data.shape[-1] == 1:
                data = np.repeat(data, 3, -1)
            d, h, w = data.shape[:3]
            offs.append(cur)
            nxs.append(w)
            nys.append(h)
            nzs.append(d)
            tls.append(np.linalg.inv(np.asarray(to_world, np.float64)))
            vms.append(float(data.max()))
            flat.append(data.reshape(-1, 3))
            cur += d * h * w
        return VolumeGridTable(
            voxels=jnp.asarray(np.concatenate(flat, 0)),
            offset=jnp.asarray(offs, jnp.int32),
            nx=jnp.asarray(nxs, jnp.int32),
            ny=jnp.asarray(nys, jnp.int32),
            nz=jnp.asarray(nzs, jnp.int32),
            to_local=jnp.asarray(np.stack(tls), jnp.float32),
            vmax=jnp.asarray(vms, jnp.float32))

    def eval(self, vol_id, p_world):
        """Trilinear lookup; vol_id (N,) int32, p_world (N, 3) -> (N, 3).

        Zero outside the unit cube in volume-local coordinates
        (gridvolume.cpp eval with WrapMode::Clamp + bbox test).
        """
        vid = jnp.maximum(vol_id, 0)
        tl = self.to_local[vid]
        p = m.transform_point(tl, p_world)
        inside = jnp.all((p >= 0.0) & (p <= 1.0), axis=-1)

        nx = self.nx[vid]
        ny = self.ny[vid]
        nz = self.nz[vid]
        off = self.offset[vid]
        fx = p[..., 0] * (nx - 1).astype(p.dtype)
        fy = p[..., 1] * (ny - 1).astype(p.dtype)
        fz = p[..., 2] * (nz - 1).astype(p.dtype)
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0,
                      jnp.maximum(nx - 2, 0))
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0,
                      jnp.maximum(ny - 2, 0))
        z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0,
                      jnp.maximum(nz - 2, 0))
        tx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
        ty = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
        tz = jnp.clip(fz - z0, 0.0, 1.0)[..., None]
        x1 = jnp.minimum(x0 + 1, nx - 1)
        y1 = jnp.minimum(y0 + 1, ny - 1)
        z1 = jnp.minimum(z0 + 1, nz - 1)

        def fetch(xi, yi, zi):
            return self.voxels[off + (zi * ny + yi) * nx + xi]

        c000 = fetch(x0, y0, z0)
        c100 = fetch(x1, y0, z0)
        c010 = fetch(x0, y1, z0)
        c110 = fetch(x1, y1, z0)
        c001 = fetch(x0, y0, z1)
        c101 = fetch(x1, y0, z1)
        c011 = fetch(x0, y1, z1)
        c111 = fetch(x1, y1, z1)
        c00 = c000 * (1 - tx) + c100 * tx
        c10 = c010 * (1 - tx) + c110 * tx
        c01 = c001 * (1 - tx) + c101 * tx
        c11 = c011 * (1 - tx) + c111 * tx
        c0 = c00 * (1 - ty) + c10 * ty
        c1 = c01 * (1 - ty) + c11 * ty
        out = c0 * (1 - tz) + c1 * tz
        return jnp.where(inside[..., None], out, 0.0)


def read_vol(path):
    """Read a Mitsuba binary .vol grid (volumegrid.h VolumeGrid I/O).

    Format: 'VOL' magic, u8 version (3), i32 encoding (1 = float32),
    i32 xres/yres/zres, i32 channels, 6*f32 local bbox, then float32
    data with index ((z*yres + y)*xres + x)*channels + c.

    Returns (data (D, H, W, C), bbox_to_world (4, 4)) where the matrix
    maps the unit cube onto the file's bbox.
    """
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:3] != b"VOL":
        raise ValueError(f"{path}: not a Mitsuba .vol file")
    version = raw[3]
    if version != 3:
        raise ValueError(f"{path}: unsupported .vol version {version}")
    header = np.frombuffer(raw, np.int32, count=5, offset=4)
    encoding, xres, yres, zres, channels = [int(v) for v in header]
    if encoding != 1:
        raise ValueError(f"{path}: only float32 encoding supported")
    bbox = np.frombuffer(raw, np.float32, count=6, offset=24)
    data = np.frombuffer(raw, np.float32, count=xres * yres * zres * channels,
                         offset=48).reshape(zres, yres, xres, channels)
    lo, hi = bbox[:3], bbox[3:]
    tw = np.eye(4, dtype=np.float64)
    tw[:3, :3] = np.diag(hi - lo)
    tw[:3, 3] = lo
    return np.ascontiguousarray(data), tw
