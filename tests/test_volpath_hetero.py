"""Heterogeneous-media tests: volume grids, delta/ratio tracking, and
null-boundary shadow rays (reference: src/media/heterogeneous.cpp,
src/volumes/gridvolume.cpp, volpath.cpp NEE loop)."""

import os
import struct
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.render import medium as med_mod
from mitsuba3_amvpt_tpu.render.medium import (MediumTable,
                                              sample_interaction_dt,
                                              transmittance_rt)
from mitsuba3_amvpt_tpu.render.volume import VolumeGridTable, read_vol


class TestVolumeGrid:
    def test_trilinear_matches_numpy(self, rng):
        data = rng.random((4, 5, 6, 3)).astype(np.float32)
        vols = VolumeGridTable.build([(data, np.eye(4))])
        p = rng.random((64, 3)).astype(np.float32)
        got = np.asarray(vols.eval(jnp.zeros((64,), jnp.int32), jnp.asarray(p)))

        # numpy reference: sample points at p * (res-1), x fastest
        d, h, w = data.shape[:3]
        f = p[:, ::-1] * (np.array([d, h, w]) - 1)   # (z, y, x) order
        i0 = np.clip(np.floor(f).astype(int), 0, np.array([d, h, w]) - 2)
        t = f - i0
        ref = np.zeros((64, 3))
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    wgt = ((t[:, 0] if dz else 1 - t[:, 0])
                           * (t[:, 1] if dy else 1 - t[:, 1])
                           * (t[:, 2] if dx else 1 - t[:, 2]))
                    ref += wgt[:, None] * data[i0[:, 0] + dz, i0[:, 1] + dy,
                                               i0[:, 2] + dx]
        assert np.allclose(got, ref, atol=1e-5)

    def test_outside_is_zero(self):
        vols = VolumeGridTable.build([(np.ones((2, 2, 2)), np.eye(4))])
        p = jnp.asarray([[0.5, 0.5, 1.5], [-0.1, 0.5, 0.5], [0.5, 0.5, 0.5]])
        out = np.asarray(vols.eval(jnp.zeros((3,), jnp.int32), p))
        assert np.allclose(out[0], 0) and np.allclose(out[1], 0)
        assert np.allclose(out[2], 1)

    def test_to_world_transform(self):
        # volume stretched to [0,2]^3: world point (1,1,1) = local center
        tw = np.diag([2.0, 2.0, 2.0, 1.0])
        grad = np.linspace(0, 1, 3)[None, None, :, None] \
            * np.ones((3, 3, 3, 1))
        vols = VolumeGridTable.build([(grad, tw)])
        v = np.asarray(vols.eval(jnp.zeros((1,), jnp.int32),
                                 jnp.asarray([[1.0, 1.0, 1.0]])))
        assert np.allclose(v, 0.5, atol=1e-6)

    def test_read_vol_roundtrip(self, rng):
        data = rng.random((3, 4, 5, 1)).astype(np.float32)
        lo, hi = np.array([-1, 0, 2], np.float32), np.array([1, 2, 5], np.float32)
        with tempfile.NamedTemporaryFile(suffix=".vol", delete=False) as f:
            f.write(b"VOL" + bytes([3]))
            f.write(struct.pack("<iiiii", 1, 5, 4, 3, 1))
            f.write(struct.pack("<6f", *lo, *hi))
            f.write(data.tobytes())
            path = f.name
        try:
            out, tw = read_vol(path)
            assert out.shape == (3, 4, 5, 1)
            assert np.allclose(out, data)
            assert np.allclose(tw[:3, 3], lo)
            assert np.allclose(np.diag(tw)[:3], hi - lo)
        finally:
            os.unlink(path)


def _hetero_table(sigma_t, scale=1.0, albedo=0.6, dens_max=1.0):
    return MediumTable(
        sigma_t=jnp.asarray([sigma_t], jnp.float32).reshape(1, 3)
        if np.ndim(sigma_t) else jnp.full((1, 3), sigma_t),
        albedo=jnp.full((1, 3), albedo),
        phase_type=jnp.zeros((1,), jnp.int32),
        g=jnp.zeros((1,)), scale=jnp.full((1,), scale),
        density_vol=jnp.zeros((1,), jnp.int32),
        albedo_vol=jnp.full((1,), -1, jnp.int32),
        majorant=jnp.asarray([float(np.max(sigma_t)) * scale * dens_max]))


class TestTracking:
    def test_delta_tracking_constant_density(self, rng):
        """Constant unit-density grid == homogeneous Beer-Lambert:
        E[surface-event weight] = exp(-sigma_t * maxt)."""
        sigma, dist = 0.8, 2.0
        # volume covering the segment
        tw = np.diag([10.0, 10.0, 10.0, 1.0])
        tw[:3, 3] = -5.0
        vols = VolumeGridTable.build([(np.ones((2, 2, 2)), tw)])
        media = _hetero_table(sigma)
        n = 200_000
        o = jnp.zeros((n, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        key = jnp.arange(n, dtype=jnp.uint32)
        med = jnp.zeros((n,), jnp.int32)
        u_ch = jnp.asarray(rng.random(n), jnp.float32)
        t, is_med, w, _ = sample_interaction_dt(
            media, vols, med, o, d, jnp.full((n,), dist), key, u_ch)
        t, is_med, w = np.asarray(t), np.asarray(is_med), np.asarray(w)
        # surface events: estimator of transmittance
        est_tr = np.where(~is_med[:, None], w, 0.0).mean(0)
        assert np.allclose(est_tr, np.exp(-sigma * dist), rtol=0.02)
        # medium events: t follows truncated exponential
        frac_med = is_med.mean()
        assert frac_med == pytest.approx(1 - np.exp(-sigma * dist), rel=0.02)
        # E[weight * 1{medium}] = albedo * sigma_s-normalized integral:
        # integral_0^dist sigma_s exp(-sigma t) dt = albedo*(1-exp(-s d))
        est_med = np.where(is_med[:, None], w, 0.0).mean(0)
        assert np.allclose(est_med, 0.6 * (1 - np.exp(-sigma * dist)),
                           rtol=0.03)

    def test_ratio_tracking_gradient_density(self, rng):
        """Linear density ramp: Tr = exp(-integral sigma(z) dz)."""
        # density = z over unit cube, sigma_t base 1.2
        nz = 64
        grid = np.linspace(0, 1, nz)[:, None, None] * np.ones((nz, 2, 2))
        vols = VolumeGridTable.build([(grid, np.eye(4))])
        media = _hetero_table(1.2)
        n = 400_000
        o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        key = jnp.arange(n, dtype=jnp.uint32)
        med = jnp.zeros((n,), jnp.int32)
        Tr = np.asarray(transmittance_rt(media, vols, med, o, d,
                                         jnp.ones((n,)), key)).mean(0)
        # integral_0^1 1.2*z dz = 0.6
        assert np.allclose(Tr, np.exp(-0.6), rtol=0.02)


def smoke_box_scene(medium, res=16, light_z=3.0):
    """Null cube [-1,1]^3 filled with `medium`, area light behind it."""
    return {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 25,
                   "to_world": {"lookat": {"origin": [0, 0, -4],
                                           "target": [0, 0, 0],
                                           "up": [0, 1, 0]}},
                   "film": {"type": "hdrfilm", "width": res, "height": res,
                            "rfilter": {"type": "box"}}},
        "vol": {"type": "cube", "bsdf": {"type": "null"},
                "interior": medium},
        "light": {"type": "rectangle",
                  "to_world": {"ops": [
                      {"scale": [2.5, 2.5, 1]},
                      {"rotate": {"axis": [0, 1, 0], "angle": 180}},
                      {"translate": [0, 0, light_z]}]},
                  "emitter": {"type": "area", "radiance": 5.0}},
    }


class TestHeteroRender:
    @pytest.mark.slow
    def test_constant_grid_matches_homogeneous(self):
        """A heterogeneous medium with density == 1 must statistically
        match the analytic homogeneous medium."""
        hom = {"type": "homogeneous", "sigma_t": 0.5, "albedo": 0.7,
               "scale": 1.0}
        het = {"type": "heterogeneous",
               "sigma_t": {"type": "gridvolume",
                           "grid": np.ones((2, 2, 2), np.float32),
                           "to_world": {"ops": [{"scale": [2, 2, 2]},
                                                {"translate": [-1, -1, -1]}]}},
               "albedo": 0.7, "scale": 0.5}
        a = np.asarray(mt.render(mt.load_dict(smoke_box_scene(hom)),
                                 spp=96, max_depth=8, integrator="volpath",
                                 seed=0))
        b = np.asarray(mt.render(mt.load_dict(smoke_box_scene(het)),
                                 spp=96, max_depth=8, integrator="volpath",
                                 seed=1))
        assert a.mean() > 0.05          # light reaches the camera
        assert b.mean() == pytest.approx(a.mean(), rel=0.06), \
            (a.mean(), b.mean())

    @pytest.mark.slow
    def test_null_boundary_shadow_attenuation(self):
        """Pure absorber in a null cube: the image is Beer-Lambert
        attenuated emission through the 2-unit slab (direct paths are
        straight lines; NEE must cross the null boundary)."""
        sigma = 0.6
        het = {"type": "heterogeneous",
               "sigma_t": {"type": "gridvolume",
                           "grid": np.ones((2, 2, 2), np.float32),
                           "to_world": {"ops": [{"scale": [2, 2, 2]},
                                                {"translate": [-1, -1, -1]}]}},
               "albedo": 0.0, "scale": sigma}
        sc = mt.load_dict(smoke_box_scene(het))
        assert sc.has_null_boundaries and sc.has_hetero
        img = np.asarray(mt.render(sc, spp=64, max_depth=8,
                                   integrator="volpath", seed=0))
        # center pixels: emission 5.0 through a 2-unit slab
        c = img[img.shape[0] // 2 - 2:img.shape[0] // 2 + 2,
                img.shape[1] // 2 - 2:img.shape[1] // 2 + 2].mean()
        assert c == pytest.approx(5.0 * np.exp(-sigma * 2.0), rel=0.05)

    @pytest.mark.slow
    def test_denser_grid_darker(self, rng):
        """A real density gradient changes the image accordingly:
        doubling the grid halves log-transmittance."""
        def scene_for(scale):
            het = {"type": "heterogeneous",
                   "sigma_t": {"type": "gridvolume",
                               "grid": rng.random((8, 8, 8)).astype(np.float32),
                               "to_world": {"ops": [{"scale": [2, 2, 2]},
                                                    {"translate": [-1, -1, -1]}]},
                               },
                   "albedo": 0.3, "scale": scale}
            return mt.load_dict(smoke_box_scene(het))
        lo = np.asarray(mt.render(scene_for(0.3), spp=32, max_depth=8,
                                  integrator="volpath", seed=2)).mean()
        hi = np.asarray(mt.render(scene_for(1.5), spp=32, max_depth=8,
                                  integrator="volpath", seed=2)).mean()
        assert lo > hi * 1.3

    @pytest.mark.slow
    def test_gridded_albedo(self):
        """Albedo supplied as a gridvolume loads and scatters."""
        het = {"type": "heterogeneous",
               "sigma_t": {"type": "gridvolume",
                           "grid": np.ones((2, 2, 2), np.float32),
                           "to_world": {"ops": [{"scale": [2, 2, 2]},
                                                {"translate": [-1, -1, -1]}]}},
               "albedo": {"type": "gridvolume",
                          "grid": np.full((2, 2, 2, 3), 0.9, np.float32),
                          "to_world": {"ops": [{"scale": [2, 2, 2]},
                                               {"translate": [-1, -1, -1]}]}},
               "scale": 0.8}
        sc = mt.load_dict(smoke_box_scene(het))
        img = np.asarray(mt.render(sc, spp=32, max_depth=8,
                                   integrator="volpath", seed=0))
        assert np.isfinite(img).all() and img.mean() > 0.0
