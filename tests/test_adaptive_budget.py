"""Cross-view adaptive spp controller tests (the north-star
generalization of AMVPT's adaptive sampling: per-view variance
statistics drive the budget; collectives make the controller state
replicated under sharding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render.integrators.adaptive import \
    render_multiview_adaptive


def _scene(res=24):
    """View 0 stares at a glossy sphere under a small light (noisy);
    view 1 stares at a flat diffuse wall (smooth)."""
    return mt.load_dict({
        "type": "scene",
        "sensor": {
            "type": "batch", "grid": [2, 1], "fov": 35,
            "sensors": [
                {"to_world": {"lookat": {"origin": [0, 0, 4],
                                         "target": [0, 0, 0],
                                         "up": [0, 1, 0]}}},
                {"to_world": {"lookat": {"origin": [10, 0, 4],
                                         "target": [10, 0, 0],
                                         "up": [0, 1, 0]}}},
            ],
            "film": {"type": "hdrfilm", "width": res * 2, "height": res,
                     "rfilter": {"type": "box"}},
        },
        "key": {"type": "sphere", "radius": 0.35,
                "center": [2.5, 3.0, 2.0],
                "emitter": {"type": "area", "radiance": 60.0}},
        "noisy_ball": {"type": "sphere", "radius": 1.0,
                       "bsdf": {"type": "roughconductor", "alpha": 0.05}},
        "flat_wall": {"type": "rectangle",
                      "to_world": {"ops": [{"scale": 4.0},
                                           {"translate": [10, 0, 0]}]},
                      "bsdf": {"type": "diffuse", "reflectance": 0.4}},
    })


class TestAdaptiveBudget:
    @pytest.mark.isolated
    @pytest.mark.slow
    def test_allocation_tracks_variance(self):
        sc = _scene()
        img, allocs = render_multiview_adaptive(
            sc, spp=32, rounds=4, seed=0, max_depth=3, return_alloc=True)
        img = np.asarray(img)
        allocs = np.asarray(allocs)
        W2, H = sc.sensor.film_resolution
        assert img.shape == (H, W2, 3)
        assert np.isfinite(img).all()
        # round 0 uniform; later rounds shift budget to the noisy view
        np.testing.assert_allclose(allocs[0], 0.5)
        assert allocs[-1][0] > 0.6, allocs
        # the floor keeps the smooth view alive
        assert allocs[-1][1] >= 0.25 / 2 - 1e-6

    @pytest.mark.slow
    @pytest.mark.flaky_stat
    def test_unbiased_vs_uniform(self):
        """Non-uniform pixel sampling must not bias the image (weight
        channel normalization): compare view means vs a plain render."""
        sc = _scene()
        img = np.asarray(render_multiview_adaptive(
            sc, spp=48, rounds=3, seed=1, max_depth=3))
        ref = np.asarray(mt.render(sc, spp=48, max_depth=3, seed=2))
        res = img.shape[0]
        for v in range(2):
            a = img[:, v * res:(v + 1) * res].mean()
            b = ref[:, v * res:(v + 1) * res].mean()
            assert abs(a - b) / max(b, 1e-6) < 0.1, (v, a, b)

    def test_sharded_matches_single(self):
        """Device-count invariance: psum'd statistics + globally-indexed
        seeds give the identical allocation and image on 8 devices."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        sc = _scene(res=16)
        single, alloc_s = render_multiview_adaptive(
            sc, spp=16, rounds=2, seed=3, max_depth=2, return_alloc=True)

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("rays",))

        @jax.jit
        def sharded(scene):
            def body(scene):
                return render_multiview_adaptive(
                    scene, spp=16, rounds=2, seed=3, max_depth=2,
                    axis_name="rays", n_dev=8, return_alloc=True)
            return shard_map(body, mesh=mesh, in_specs=(P(),),
                             out_specs=(P(), P()), check_vma=False)(scene)

        img8, alloc8 = sharded(sc)
        np.testing.assert_allclose(np.asarray(alloc8), np.asarray(alloc_s),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(img8), np.asarray(single),
                                   rtol=2e-4, atol=2e-5)
