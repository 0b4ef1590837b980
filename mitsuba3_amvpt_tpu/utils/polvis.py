"""Polarization visualization + batch tonemapper.

Analogs of the reference's two small image tools:

* ``polvis`` (src/python/python/polvis.py:1, 223 LoC): false-color
  visualizations of a ``stokes``-integrator image — intensity, raw
  Stokes components (red = negative / green = positive), degree of
  polarization, type of polarization (cyan = linear, yellow =
  circular), oscillation plane of linear polarization, and virtual
  linear-polarizer sweeps — with the same direct / luminance overlay
  modes.
* ``tonemap`` (src/python/python/tonemap.py:1): EXR -> dithered sRGB
  PNG batch conversion with an optional linear pre-scale.

The input here is the in-memory (H, W, 3, 4) Stokes image produced by
``render_stokes`` (S0..S3 per RGB channel) — or a 16-channel stacked
EXR written by the CLI — rather than a Bitmap object; everything is
plain numpy (host-side tooling, not a compute path).
"""

from __future__ import annotations

import numpy as np


def _safe_div(a, b):
    return np.divide(a, b, out=np.zeros_like(a), where=b != 0)


def load_stokes(path: str) -> np.ndarray:
    """Load a Stokes EXR written by ``save_stokes`` -> (H, W, 3, 4)."""
    from ..core.bitmap import read_exr
    img = read_exr(path)
    if img.ndim == 3 and img.shape[2] == 12:
        return img.reshape(img.shape[0], img.shape[1], 4, 3) \
            .transpose(0, 1, 3, 2)
    raise ValueError(
        f"expected a 12-channel stacked Stokes EXR, got {img.shape}")


def save_stokes(path: str, stokes: np.ndarray):
    """Write (H, W, 3, 4) Stokes -> 12-channel stacked EXR
    (S0.rgb, S1.rgb, S2.rgb, S3.rgb scanline blocks)."""
    from ..core.bitmap import write_exr
    s = np.asarray(stokes, np.float32)
    write_exr(path, s.transpose(0, 1, 3, 2).reshape(
        s.shape[0], s.shape[1], 12))


def apply_polarizer(stokes: np.ndarray, angle_deg: float) -> np.ndarray:
    """Intensity after a virtual linear polarizer at ``angle_deg``
    (polvis.py --polarizer): rotate a Mueller linear polarizer and
    keep the S0 row."""
    from ..core.mueller import linear_polarizer, rotated_element
    import jax.numpy as jnp
    LP = np.asarray(rotated_element(
        jnp.asarray(np.radians(angle_deg)), linear_polarizer(1.0)))
    s = np.asarray(stokes, np.float32)               # (H, W, 3, 4)
    return np.einsum("hwcs,s->hwc", s, LP[0])


def polvis(stokes: np.ndarray, channel: int = None, scale: float = None,
           overlay: str = None):
    """False-color visualizations of a (H, W, 3, 4) Stokes image.

    Returns a dict of (H, W, 3) float images: ``intensity``, ``s1``,
    ``s2``, ``s3`` (red = negative, green = positive, normalized by
    S0), ``dop`` (degree of polarization, red), ``top`` (type: cyan =
    linear, yellow = circular), ``lin`` (oscillation plane: S1 red/
    green + S2 blue/yellow).  ``channel`` selects one RGB channel for
    the Stokes analysis (None = average, polvis.py --channel);
    ``overlay`` in (None, "direct", "luminance") alpha-blends the
    false color over the black-and-white intensity by the local degree
    of polarization."""
    img = np.asarray(stokes, np.float32)
    if scale is not None:
        img = img * scale
    intensity = img[..., 0]                          # (H, W, 3)
    if channel is not None:
        st = img[:, :, channel, :]                   # (H, W, 4)
    else:
        st = img.mean(axis=2)
    s0 = st[..., 0]
    s3 = st[..., 3]
    s12 = np.sqrt(np.maximum(0.0, st[..., 1] ** 2 + st[..., 2] ** 2))
    s123 = np.sqrt(np.maximum(
        0.0, st[..., 1] ** 2 + st[..., 2] ** 2 + st[..., 3] ** 2))
    dop = _safe_div(s123, s0)
    rdop_l = _safe_div(s12, s123)
    rdop_c = _safe_div(np.abs(s3), s123)
    bw = np.repeat(s0[..., None], 3, -1)
    z = np.zeros_like(s0)

    def over(out):
        if overlay is None:
            return out
        alpha = dop[..., None]
        if overlay == "luminance":
            out = out * s0[..., None]
        return out * alpha + bw * (1.0 - alpha)

    out = {"intensity": intensity}
    for i in (1, 2, 3):
        c = _safe_div(st[..., i], s0)
        out[f"s{i}"] = over(np.stack(
            [np.maximum(0, -c), np.maximum(0, c), z], -1))
    out["dop"] = over(np.stack([dop, z, z], -1))
    out["top"] = over(
        np.stack([rdop_c, rdop_l + rdop_c, rdop_l], -1) * dop[..., None])
    s1n = _safe_div(st[..., 1], s0)
    s2n = _safe_div(st[..., 2], s0)
    lin_a = np.stack([np.maximum(0, -s1n), np.maximum(0, s1n), z], -1)
    lin_b = np.stack([np.maximum(0, s2n), np.maximum(0, s2n),
                      np.maximum(0, -s2n)], -1)
    out["lin"] = over(lin_a + lin_b)
    return out


# ---------------------------------------------------------------------------
# tonemap (src/python/python/tonemap.py)
# ---------------------------------------------------------------------------

def tonemap(img: np.ndarray, scale: float = 1.0,
            dither: bool = True) -> np.ndarray:
    """Linear HDR -> dithered 8-bit sRGB (tonemap.py behavior: linear
    pre-scale, sRGB response curve, dithering against banding)."""
    x = np.clip(np.asarray(img, np.float32)[..., :3] * scale, 0.0, 1.0)
    x = np.where(x <= 0.0031308, 12.92 * x,
                 1.055 * x ** (1 / 2.4) - 0.055)
    x = x * 255.0
    if dither:
        rng = np.random.default_rng(0x7A11)
        x = x + rng.random(x.shape, np.float32) - 0.5
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def tonemap_file(path: str, scale: float = 1.0, out_path: str = None):
    """EXR (or any readable HDR image) -> PNG next to it."""
    from PIL import Image

    from ..core.bitmap import read_image
    img = read_image(path)
    if out_path is None:
        import os
        out_path = os.path.splitext(path)[0] + ".png"
    Image.fromarray(tonemap(img, scale)).save(out_path)
    return out_path
