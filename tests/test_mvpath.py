"""AMVPT multi-view integrator tests.

The fork ships no tests for mvpath/grid (SURVEY.md §4) — parity here is
established against the stock `path` integrator on the same grid-sensor
scene: per-view means must agree (unbiasedness of reuse + view MIS),
and reuse must reduce variance at equal spp (the point of AMVPT).
"""

import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render.integrators.mvpath import (render_mvpath,
                                                          reuse_group_size)
from mitsuba3_amvpt_tpu.utils import scenes


def grid_scene(views, mode="cone", res=24, **kw):
    d = scenes.cornell_box(res=res)
    d["sensor"] = {
        "type": "grid", "grid": [views, 1], "mode": mode,
        "fov": 39.3077, "focus_distance": 3.9,
        "to_world": {"lookat": {"origin": [0, 0, 3.9], "target": [0, 0, 0],
                                "up": [0, 1, 0]}},
        "film": {"type": "hdrfilm", "width": res * views, "height": res,
                 "rfilter": {"type": "box"}},
        **kw}
    return mt.load_dict(d), res


class TestGroupHeuristic:
    def test_divisor_of_n_prefers_8(self):
        # mvpath.cpp:192-217
        assert reuse_group_size(8) == 8
        assert reuse_group_size(48) == 8
        assert reuse_group_size(12) == 12
        assert reuse_group_size(7) == 7
        assert reuse_group_size(6) == 6
        assert reuse_group_size(8, requested=4) == 4
        assert reuse_group_size(8, requested=3) == 8  # non-divisor ignored


class TestMVPath:
    def test_single_view_equals_path(self):
        """S=1 (no reuse) must match the stock path integrator."""
        sc, res = grid_scene(1)
        a = np.asarray(render_mvpath(sc, spp=48, max_depth=3, seed=0,
                                     sa_reuse=False))
        b = np.asarray(mt.render(sc, spp=48, max_depth=3, seed=1))
        assert abs(a.mean() - b.mean()) < 0.01

    def test_identical_views_unbiased(self):
        """Two near-identical views: reuse estimator must reproduce the
        per-pixel image (catches weight-channel accounting bugs)."""
        sc, res = grid_scene(2, mode="line", spacing=1e-3)
        img = np.asarray(render_mvpath(sc, spp=96, max_depth=3, seed=0))
        ref = np.asarray(mt.render(sc, spp=96, max_depth=3, seed=2))
        lit = ref.mean(-1) > 0.05
        ratio = img.mean(-1)[lit] / ref.mean(-1)[lit]
        assert abs(np.median(ratio) - 1.0) < 0.03
        assert abs(img.mean() / ref.mean() - 1.0) < 0.03

    def test_cone_views_unbiased(self):
        sc, res = grid_scene(4, cone_deg=30)
        img = np.asarray(render_mvpath(sc, spp=48, max_depth=3, seed=0))
        ref = np.asarray(mt.render(sc, spp=96, max_depth=3, seed=2))
        for v in range(4):
            a = img[:, v * res:(v + 1) * res].mean()
            b = ref[:, v * res:(v + 1) * res].mean()
            assert a == pytest.approx(b, rel=0.06, abs=2e-3), (v, a, b)

    @pytest.mark.slow
    def test_reuse_reduces_variance(self):
        """Effective-spp amplification (mvpath.h:70-73): at equal spp the
        reuse render must be closer to a converged reference than the
        non-reuse render on the central views."""
        sc, res = grid_scene(4, cone_deg=20)
        gt = np.asarray(mt.render(sc, spp=512, max_depth=2, seed=99))
        errs = {}
        for name, kw in [("reuse", dict(sa_reuse=True)),
                         ("noreuse", dict(sa_reuse=False))]:
            acc = []
            for seed in range(3):
                img = np.asarray(render_mvpath(sc, spp=8, max_depth=2,
                                               seed=seed, **kw))
                c = img[:, res:3 * res]  # central views
                acc.append(((c - gt[:, res:3 * res]) ** 2).mean())
            errs[name] = np.mean(acc)
        assert errs["reuse"] < errs["noreuse"], errs

    def test_adaptive_refill_runs(self):
        sc, res = grid_scene(2, cone_deg=20)
        img = np.asarray(render_mvpath(sc, spp=16, max_depth=3, seed=0,
                                       n_adapt=2))
        assert np.isfinite(img).all()
        ref = np.asarray(mt.render(sc, spp=64, max_depth=3, seed=2))
        assert abs(img.mean() / ref.mean() - 1.0) < 0.06


class TestExactTvPdf:
    """fast_mis=False routes camera selection through the evaluated
    TV-distance (tv_pdf_exact, mvpath.h:276-293 — the reference's
    default path)."""

    def _principled_scene(self, views=4, res=20):
        d = scenes.cornell_box(res=res)
        # non-GGX-proxy material everywhere: principled with moderate
        # roughness + specular, where the half-vector-cos^2 proxy and
        # the evaluated pdf ratio genuinely differ
        d["white"] = {"type": "principled", "base_color": [0.7, 0.6, 0.5],
                      "roughness": 0.35, "specular": 0.8, "metallic": 0.3}
        d["sensor"] = {
            "type": "grid", "grid": [views, 1], "mode": "cone",
            "fov": 39.3077, "focus_distance": 3.9, "cone_deg": 30.0,
            "to_world": {"lookat": {"origin": [0, 0, 3.9],
                                    "target": [0, 0, 0],
                                    "up": [0, 1, 0]}},
            "film": {"type": "hdrfilm", "width": res * views,
                     "height": res, "rfilter": {"type": "box"}}}
        return mt.load_dict(d)

    @pytest.mark.slow
    def test_exact_unbiased_vs_fast(self):
        """Selection probabilities shape variance, never the mean."""
        sc = self._principled_scene()
        seeds = range(4)
        fa = np.stack([np.asarray(render_mvpath(sc, spp=32, max_depth=3,
                                                seed=s, fast_mis=True))
                       for s in seeds])
        ex = np.stack([np.asarray(render_mvpath(sc, spp=32, max_depth=3,
                                                seed=s, fast_mis=False))
                       for s in seeds])
        assert np.isfinite(ex).all()
        assert abs(fa.mean() - ex.mean()) / fa.mean() < 0.04, \
            (fa.mean(), ex.mean())

    @pytest.mark.slow
    def test_exact_changes_selection_on_glossy(self):
        """Same seed: the exact TV pdf accepts/rejects different
        secondary views on a glossy material -> different sample paths
        (images differ), while on a pure-diffuse scene both modes force
        pdf_Mat = 1 and the renders are bit-identical."""
        sc = self._principled_scene()
        a = np.asarray(render_mvpath(sc, spp=8, max_depth=3, seed=5,
                                     fast_mis=True))
        b = np.asarray(render_mvpath(sc, spp=8, max_depth=3, seed=5,
                                     fast_mis=False))
        assert not np.array_equal(a, b)

        d = scenes.cornell_box(res=20)
        d["sensor"] = {
            "type": "grid", "grid": [4, 1], "mode": "cone",
            "fov": 39.3077, "focus_distance": 3.9,
            "to_world": {"lookat": {"origin": [0, 0, 3.9],
                                    "target": [0, 0, 0],
                                    "up": [0, 1, 0]}},
            "film": {"type": "hdrfilm", "width": 80, "height": 20,
                     "rfilter": {"type": "box"}}}
        scd = mt.load_dict(d)
        da = np.asarray(render_mvpath(scd, spp=8, max_depth=3, seed=5,
                                      fast_mis=True))
        db = np.asarray(render_mvpath(scd, spp=8, max_depth=3, seed=5,
                                      fast_mis=False))
        assert np.array_equal(da, db)


class TestReferenceConfiguration:
    """The tested DEFAULT path is the reference configuration:
    fast_mis=False (exact tv_pdf, mvpath.h:126 default) together with
    adaptive refill (mvpath.h:125 `adaptive`), on a principled-material
    scene (VERDICT r2 item 7)."""

    @pytest.mark.slow
    def test_exact_plus_refill_unbiased_principled(self):
        sc = TestExactTvPdf._principled_scene(TestExactTvPdf())
        img = np.asarray(render_mvpath(sc, spp=48, max_depth=3, seed=0,
                                       n_adapt=8))   # defaults: exact
        ref = np.asarray(mt.render(sc, spp=160, max_depth=3, seed=3))
        assert np.isfinite(img).all()
        assert abs(img.mean() / ref.mean() - 1.0) < 0.05, \
            (img.mean(), ref.mean())

    def test_defaults_match_reference(self):
        """Defaults mirror mvpath.h:125-126: exact MIS, no refill."""
        import inspect
        sig = inspect.signature(render_mvpath)
        assert sig.parameters["fast_mis"].default is False
        assert sig.parameters["n_adapt"].default == 0


class TestEqualTime:
    def test_reuse_vs_independent_mse_machinery(self):
        """The equal-wall-clock A/B machinery (bench.py
        amvpt_equal_time_mse_ratio): reuse and independent renders of
        the same quilt must both converge toward the same reference so
        their MSE ratio is a meaningful scalar.  (The wall-clock
        matched comparison itself runs on TPU in bench.py — CPU timing
        would measure the interpreter, not the algorithm.)"""
        sc, res = grid_scene(2, cone_deg=20)
        ref = np.asarray(mt.render(sc, spp=256, max_depth=3, seed=9))
        img_r = np.asarray(render_mvpath(sc, spp=24, max_depth=3,
                                         seed=1, fast_mis=False))
        img_i = np.asarray(mt.render(sc, spp=24, max_depth=3, seed=2))
        mse_r = float(np.mean((img_r - ref) ** 2))
        mse_i = float(np.mean((img_i - ref) ** 2))
        assert np.isfinite(mse_r) and np.isfinite(mse_i)
        assert mse_r > 0 and mse_i > 0
        # at EQUAL spp, reuse must not be dramatically worse than
        # independent sampling (it shares suffixes but adds weights)
        assert mse_r < 4.0 * mse_i, (mse_r, mse_i)

    def test_useful_query_accounting(self):
        """with_queries returns a positive count bounded by the billed
        wavefront (primary + NEE + camera shadows + suffix walk)."""
        sc, res = grid_scene(2, cone_deg=20)
        img, nq = render_mvpath(sc, spp=8, max_depth=3, seed=0,
                                with_queries=True)
        n_lanes = 2 * res * res * 8
        assert float(nq) > n_lanes          # at least the primaries
        S = 2
        bound = n_lanes * (1 + 1 + (S - 1) + 2 * 2)
        assert float(nq) <= bound, (float(nq), bound)
