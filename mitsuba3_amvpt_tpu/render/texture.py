"""Texture evaluation over a flat texel atlas.

Replaces the reference's Texture plugins (src/textures/bitmap.cpp
dr::Texture HW lookups, checkerboard.cpp) with gathers into one flat
texel buffer.  Every texture in the scene is appended to ``texels``
(T_total, 3); per-texture (offset, width, height) metadata drives
bilinear interpolation.  Differentiable w.r.t. ``texels`` — this is the
parameter tensor recovered in texture-optimization inverse rendering
(BASELINE config 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class TextureTable:
    texels: jnp.ndarray    # (T_total, 3) float32 — differentiable
    offset: jnp.ndarray    # (K,) int32 start row in texels
    width: jnp.ndarray     # (K,) int32
    height: jnp.ndarray    # (K,) int32
    # static: no images loaded — lets eval sites skip the (expensive on
    # TPU) per-lane gather chain entirely for untextured scenes
    empty: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def build(images) -> "TextureTable":
        """images: list of (H, W, 3) float arrays (may be empty)."""
        if len(images) == 0:
            return TextureTable(
                texels=jnp.zeros((1, 3), jnp.float32),
                offset=jnp.zeros((1,), jnp.int32),
                width=jnp.ones((1,), jnp.int32),
                height=jnp.ones((1,), jnp.int32), empty=True)
        offs, ws, hs, flat = [], [], [], []
        cur = 0
        for img in images:
            img = np.asarray(img, np.float32)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, -1)
            h, w = img.shape[:2]
            offs.append(cur)
            ws.append(w)
            hs.append(h)
            flat.append(img.reshape(-1, 3))
            cur += h * w
        return TextureTable(
            texels=jnp.asarray(np.concatenate(flat, 0)),
            offset=jnp.asarray(offs, jnp.int32),
            width=jnp.asarray(ws, jnp.int32),
            height=jnp.asarray(hs, jnp.int32))

    def eval_bilinear(self, tex_id, uv, wrap: str = "repeat"):
        """Bilinear lookup; tex_id (N,) int32, uv (N, 2) -> (N, 3).

        Matches dr::Texture filter_mode=Linear / wrap_mode=Repeat
        (src/textures/bitmap.cpp:368-406).  uv origin is top-left
        (v down), like the reference's bitmap textures.
        """
        off = self.offset[tex_id]
        w = self.width[tex_id]
        h = self.height[tex_id]
        wf = w.astype(uv.dtype)
        hf = h.astype(uv.dtype)
        x = uv[..., 0] * wf - 0.5
        y = uv[..., 1] * hf - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        def wrap_i(i, n):
            if wrap == "clamp":
                return jnp.clip(i, 0, n - 1)
            return jnp.mod(i.astype(jnp.int32), n)

        x0i = wrap_i(x0, w)
        x1i = wrap_i(x0 + 1, w)
        y0i = wrap_i(y0, h)
        y1i = wrap_i(y0 + 1, h)

        def fetch(xi, yi):
            return self.texels[off + yi * w + xi]

        c00 = fetch(x0i, y0i)
        c10 = fetch(x1i, y0i)
        c01 = fetch(x0i, y1i)
        c11 = fetch(x1i, y1i)
        return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                + (c01 * (1 - fx) + c11 * fx) * fy)

    def eval_nearest(self, tex_id, uv):
        off = self.offset[tex_id]
        w = self.width[tex_id]
        h = self.height[tex_id]
        xi = jnp.clip((uv[..., 0] * w.astype(uv.dtype)).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((uv[..., 1] * h.astype(uv.dtype)).astype(jnp.int32), 0, h - 1)
        return self.texels[off + yi * w + xi]


def eval_spectrum_or_texture(value, tex_id, textures: TextureTable, uv, si_checker=None):
    """Dispatch helper: per-lane texture lookup where tex_id >= 0, else
    the constant `value` (N, 3)."""
    if textures.empty:
        return jnp.broadcast_to(value, uv.shape[:-1] + (3,))
    tex = textures.eval_bilinear(jnp.maximum(tex_id, 0), uv)
    return jnp.where((tex_id >= 0)[..., None], tex, value)


def checkerboard(uv, color0, color1):
    """Procedural checkerboard (src/textures/checkerboard.cpp)."""
    mask = (jnp.floor(uv[..., 0] * 2) + jnp.floor(uv[..., 1] * 2)) % 2
    return jnp.where((mask == 0)[..., None], color0, color1)
