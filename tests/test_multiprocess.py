"""Multi-process jax.distributed rehearsal (VERDICT round-2 item 8):
2 CPU processes x 4 virtual devices render over one global 8-device
mesh; the image must match the single-process 8-device render exactly
(global lane indexing => device/process layout cannot change results).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.parallel.sharding import make_mesh, render_sharded
from mitsuba3_amvpt_tpu.utils import scenes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_matches_single_process():
    import jax
    if jax.default_backend() != "cpu" or jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU test mesh")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own 4-dev count
    env["JAX_PLATFORMS"] = "cpu"
    port = "52123"
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "mp_rehearsal.py"),
         str(i), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"

    a = np.load("/tmp/mp_rehearsal_0.npy")
    b = np.load("/tmp/mp_rehearsal_1.npy")
    assert np.array_equal(a, b), "process images diverge"

    # single-process reference on the same global lane indexing
    scene = mt.load_dict(scenes.cornell_box(res=16))
    ref = np.asarray(render_sharded(scene, make_mesh(jax.devices()[:8]),
                                    spp=8, max_depth=3, seed=5))
    assert np.allclose(a, ref, atol=1e-6), np.abs(a - ref).max()
