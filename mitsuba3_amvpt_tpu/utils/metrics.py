"""Image comparison metrics (reference /root/reference/cmp.py: MSE/PSNR
between EXRs with sqrt tonemapping)."""

from __future__ import annotations

import numpy as np


def tonemap_sqrt(img):
    """cmp.py applies sqrt before comparing (perceptual-ish)."""
    return np.sqrt(np.clip(np.asarray(img, np.float64), 0.0, None))


def mse(a, b, tonemapped: bool = True):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if tonemapped:
        a, b = tonemap_sqrt(a), tonemap_sqrt(b)
    return float(np.mean((a - b) ** 2))


def psnr(a, b, tonemapped: bool = True, peak: float = None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if tonemapped:
        a, b = tonemap_sqrt(a), tonemap_sqrt(b)
    if peak is None:
        peak = max(float(a.max()), float(b.max()), 1e-12)
    m = float(np.mean((a - b) ** 2))
    return float(10.0 * np.log10(peak * peak / max(m, 1e-20)))


def relative_mse(a, ref, eps: float = 1e-2):
    """relMSE — standard MC denoising/bias metric."""
    a, ref = np.asarray(a, np.float64), np.asarray(ref, np.float64)
    return float(np.mean((a - ref) ** 2 / (ref * ref + eps)))


def compare(path_a: str, path_b: str):
    """cmp.py CLI behavior: load two images, print MSE + PSNR."""
    from ..core.bitmap import read_image
    a = read_image(path_a)
    b = read_image(path_b)
    m = mse(a, b)
    p = psnr(a, b)
    print(f"MSE: {m:.6g}  PSNR: {p:.2f} dB")
    return m, p
