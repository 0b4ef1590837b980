"""Aux-subsystem tests: checkpoint/resume, profiler, logging/progress
(SURVEY.md §5: tracing, failure recovery, checkpoint/resume,
observability)."""

import io
import os

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render.checkpoint import (load_render_checkpoint,
                                                  load_state,
                                                  render_resumable,
                                                  save_render_checkpoint,
                                                  save_state)
from mitsuba3_amvpt_tpu.utils import logging as mlog
from mitsuba3_amvpt_tpu.utils import profiler
from mitsuba3_amvpt_tpu.utils import scenes


@pytest.fixture(scope="module")
def cb():
    return mt.load_dict(scenes.cornell_box(res=24))


class TestCheckpointResume:
    def test_resumed_render_bit_identical(self, tmp_path, cb):
        """Interrupt after 2 of 4 passes; the resumed render must equal
        the uninterrupted one bit-for-bit (per-pass seed discipline,
        mvpath.cpp:227)."""
        ck = str(tmp_path / "r.ckpt")
        ref = np.asarray(mt.render(cb, spp=8, max_depth=3, seed=7,
                                   spp_per_pass=2))

        # run passes 1-2, checkpoint every pass, then "crash"
        class Stop(Exception):
            pass

        calls = {"n": 0}
        from mitsuba3_amvpt_tpu.render.integrators import api as api_mod
        orig = api_mod.render_pass

        def counting(*a, **k):
            if calls["n"] == 2:
                raise Stop()
            calls["n"] += 1
            return orig(*a, **k)

        api_mod.render_pass = counting
        try:
            with pytest.raises(Stop):
                render_resumable(cb, spp=8, checkpoint_path=ck, seed=7,
                                 max_depth=3, spp_per_pass=2,
                                 checkpoint_every=1)
        finally:
            api_mod.render_pass = orig

        st = load_render_checkpoint(ck)
        assert st is not None and st[1] == 4  # 2 passes * 2 spp done

        out = np.asarray(render_resumable(cb, spp=8, checkpoint_path=ck,
                                          seed=7, max_depth=3,
                                          spp_per_pass=2))
        np.testing.assert_array_equal(out, ref)
        assert not os.path.exists(ck)   # removed on completion

    def test_seed_mismatch_rejected(self, tmp_path, cb):
        ck = str(tmp_path / "r2.ckpt")
        from mitsuba3_amvpt_tpu.render.film import film_prepare
        save_render_checkpoint(ck, film_prepare(cb.film), 2, seed=1)
        with pytest.raises(ValueError, match="seed"):
            render_resumable(cb, spp=4, checkpoint_path=ck, seed=2,
                             spp_per_pass=2)

    def test_state_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        state = {"m": jnp.arange(6.0).reshape(2, 3),
                 "v": [jnp.ones((4,)), jnp.zeros((2, 2))],
                 "step": jnp.asarray(17)}
        p = str(tmp_path / "opt.npz")
        save_state(p, state)
        back = load_state(p, state)
        for a, b in zip(__import__("jax").tree_util.tree_leaves(state),
                        __import__("jax").tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestProfiler:
    def test_scoped_phase_accumulates(self):
        profiler.reset()
        with profiler.ScopedPhase("TestPhase"):
            sum(range(1000))
        with profiler.ScopedPhase("TestPhase"):
            sum(range(1000))
        rep = profiler.report()
        assert rep["TestPhase"][1] == 2
        assert rep["TestPhase"][0] > 0.0
        assert "TestPhase" in profiler.report_string()

    def test_named_scope_inside_jit(self):
        import jax
        import jax.numpy as jnp

        @jax.jit
        def f(x):
            with profiler.ScopedPhase("Inner"):
                return x * 2.0

        # must trace + run fine and the scope name must appear in HLO
        out = f(jnp.ones((4,)))
        np.testing.assert_allclose(np.asarray(out), 2.0)
        txt = jax.jit(f).lower(jnp.ones((4,))).as_text(debug_info=True)
        assert "Inner" in txt


class TestLoggingProgress:
    def test_log_levels(self, capsys):
        mlog.set_log_level(mlog.Warn)
        lg = mlog.logger()
        assert not lg.isEnabledFor(mlog.Info)
        mlog.set_log_level(mlog.Debug)
        assert lg.isEnabledFor(mlog.Info)
        mlog.log(mlog.Info, "hello %d", 42)

    def test_progress_reporter(self):
        buf = io.StringIO()
        p = mlog.ProgressReporter("Render", total=10, stream=buf,
                                  min_interval=0.0)
        for i in range(10):
            p.update(i + 1)
        p.finish()
        s = buf.getvalue()
        assert "100.0%" in s and "done." in s
