"""polvis / tonemap tool analogs (reference src/python/python/polvis.py
and tonemap.py)."""

import subprocess
import sys

import numpy as np
import pytest

from mitsuba3_amvpt_tpu.utils.polvis import (apply_polarizer, load_stokes,
                                             polvis, save_stokes, tonemap,
                                             tonemap_file)


@pytest.fixture
def stokes_img(rng):
    st = rng.random((8, 10, 3, 4)).astype(np.float32)
    st[..., 0] += 1.0
    return st


def test_polvis_outputs(stokes_img):
    vis = polvis(stokes_img)
    assert set(vis) == {"intensity", "s1", "s2", "s3", "dop", "top", "lin"}
    for k, v in vis.items():
        assert v.shape == (8, 10, 3), k
        assert np.isfinite(v).all(), k
    # dop in [0, 1]-ish for physical inputs; red channel only
    assert (vis["dop"][..., 1:] == 0).all()


def test_polvis_normalization_and_overlay(stokes_img):
    # fully unpolarized input: every false-color mode collapses
    st = stokes_img.copy()
    st[..., 1:] = 0.0
    vis = polvis(st)
    assert np.allclose(vis["dop"], 0.0)
    assert np.allclose(vis["s1"], 0.0)
    # overlay with dop=0 shows the plain black-and-white image
    vis_o = polvis(st, overlay="direct")
    s0 = st.mean(axis=2)[..., 0]
    np.testing.assert_allclose(vis_o["dop"],
                               np.repeat(s0[..., None], 3, -1), rtol=1e-6)


def test_polarizer_malus(stokes_img):
    """Virtual polarizer parity with Mueller calculus: at angle 0,
    I' = (S0 + S1)/2; at 90, I' = (S0 - S1)/2 (polvis.py --polarizer)."""
    i0 = apply_polarizer(stokes_img, 0.0)
    i90 = apply_polarizer(stokes_img, 90.0)
    np.testing.assert_allclose(
        i0, 0.5 * (stokes_img[..., 0] + stokes_img[..., 1]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        i90, 0.5 * (stokes_img[..., 0] - stokes_img[..., 1]),
        rtol=1e-5, atol=1e-5)
    # unpolarized light: angle-independent (Malus with DoP=0)
    st = stokes_img.copy()
    st[..., 1:] = 0.0
    np.testing.assert_allclose(apply_polarizer(st, 17.0),
                               apply_polarizer(st, 63.0), rtol=1e-5)


def test_stokes_exr_roundtrip(tmp_path, stokes_img):
    p = str(tmp_path / "s.exr")
    save_stokes(p, stokes_img)
    back = load_stokes(p)
    np.testing.assert_allclose(back, stokes_img, rtol=1e-6)


def test_tonemap_srgb_and_file(tmp_path):
    u8 = tonemap(np.full((4, 4, 3), 0.5), dither=False)
    assert abs(int(u8[0, 0, 0]) - 188) <= 1           # sRGB(0.5)*255
    u8s = tonemap(np.full((4, 4, 3), 0.25), scale=2.0, dither=False)
    assert (u8s == u8).all()                          # pre-scale parity
    from mitsuba3_amvpt_tpu.core.bitmap import write_exr
    p = str(tmp_path / "img.exr")
    write_exr(p, np.full((6, 5, 3), 0.5, np.float32))
    out = tonemap_file(p)
    assert out.endswith(".png")
    from PIL import Image
    arr = np.asarray(Image.open(out))
    assert arr.shape[:2] == (6, 5)
    assert abs(int(arr[0, 0, 0]) - 188) <= 1


def test_cli_tonemap(tmp_path):
    from mitsuba3_amvpt_tpu.core.bitmap import write_exr
    p = str(tmp_path / "cli.exr")
    write_exr(p, np.full((4, 4, 3), 0.18, np.float32))
    r = subprocess.run([sys.executable, "-m", "mitsuba3_amvpt_tpu",
                        "--tonemap", p], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "cli.png").exists()
