"""CLI driver tests (src/mitsuba/mitsuba_render.cpp / cli.py parity):
XML render with -D substitution, integrator override, quilt gif tool."""

import numpy as np
import pytest

from mitsuba3_amvpt_tpu.cli import main
from mitsuba3_amvpt_tpu.core.bitmap import read_exr, write_exr

_XML = """<scene version="3.0.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="to_world">
            <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="$res"/>
            <integer name="height" value="$res"/>
            <rfilter type="box"/>
        </film>
    </sensor>
    <emitter type="constant"><rgb name="radiance" value="1.0"/></emitter>
    <shape type="sphere">
        <float name="radius" value="1.0"/>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.5"/></bsdf>
    </shape>
</scene>"""


@pytest.fixture()
def scene_xml(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(_XML)
    return str(p)


def test_render_with_defines(scene_xml, tmp_path):
    out = str(tmp_path / "img.exr")
    rc = main([scene_xml, "-o", out, "-s", "4", "-d", "2",
               "-D", "res=16"])
    assert rc == 0
    img = read_exr(out)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0.3


def test_integrator_override_depth(scene_xml, tmp_path):
    out = str(tmp_path / "depth.exr")
    rc = main([scene_xml, "-o", out, "-s", "1", "-I", "depth",
               "-D", "res=8"])
    assert rc == 0
    img = read_exr(out)
    assert img.shape == (8, 8, 3)


def test_missing_scene_usage():
    assert main([]) == 1


def test_quilt_gif(tmp_path):
    views, res = 4, 8
    quilt = np.zeros((res, res * views, 3), np.float32)
    for k in range(views):
        quilt[:, k * res:(k + 1) * res] = k / (views - 1)
    qp = str(tmp_path / "quilt.exr")
    write_exr(qp, quilt)
    out = str(tmp_path / "out.gif")
    rc = main([qp, "--quilt-gif", out, "--grid", f"{views}x1"])
    assert rc == 0
    from PIL import Image
    im = Image.open(out)
    assert im.size == (res, res)
    im.seek(0)
    n = 1
    try:
        while True:
            im.seek(im.tell() + 1)
            n += 1
    except EOFError:
        pass
    assert n == 2 * views - 2


def test_timeout_budget_writes_partial(tmp_path, scene_xml):
    """-t budget: rendering stops at a pass boundary, image written
    (integrator.cpp m_timeout analog)."""
    out = str(tmp_path / "partial.exr")
    rc = main([scene_xml, "-o", out, "-s", "64", "--spp-per-pass", "2",
               "-t", "0.0001", "-d", "2", "-D", "res=16"])
    assert rc == 0
    img = read_exr(out)
    assert img.shape[:2] == (16, 16)


def test_sigint_cancels_cooperatively(tmp_path, scene_xml):
    """SIGINT mid-render stops at the next pass boundary and still
    writes the partial image (m_stop / should_stop analog)."""
    import os
    import signal
    import subprocess
    import sys
    import time as _t
    out = tmp_path / "cancelled.exr"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    runner = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
              "import sys; from mitsuba3_amvpt_tpu.cli import main; "
              "sys.exit(main(sys.argv[1:]))")
    p = subprocess.Popen(
        [sys.executable, "-c", runner, scene_xml,
         "-o", str(out), "-s", "100000", "--spp-per-pass", "1",
         "--interruptible", "-d", "3", "-D", "res=16"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env)
    _t.sleep(40)     # scene load + first-pass compile
    p.send_signal(signal.SIGINT)
    try:
        _, err = p.communicate(timeout=240)
    except subprocess.TimeoutExpired:
        p.kill()
        raise
    assert p.returncode == 0, err[-2000:]
    assert "cancel requested" in err or "spp within budget" in err
    assert out.exists()
