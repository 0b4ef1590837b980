"""TPU-only Pallas kernel regression tests.

The CI/test mesh is CPU (conftest forces jax_platforms=cpu), where the
Pallas tracers cannot run — these tests execute only when a real TPU
backend is importable AND selected (run manually on hardware:
``JAX_PLATFORMS=<tpu-backend> pytest tests/test_pallas_tpu.py``).

They mirror the manual validations performed on the v5e:
 * flat VMEM sweep vs XLA brute: bit-exact,
 * tiled-cull sweep vs flat sweep: bit-exact,
 * HBM-streaming hierarchical sweep vs VMEM tiled sweep: bit-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernels need TPU hardware")


def _random_tris(F, seed=0):
    rng = np.random.default_rng(seed)
    tris = rng.random((F, 3, 3), np.float32) * 2 - 1
    tris[:, 1:] = tris[:, :1] + (tris[:, 1:] - tris[:, :1]) * 0.05
    return [jnp.asarray(tris[:, i]) for i in range(3)]


def _random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.random((n, 3), np.float32) * 4 - 2)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return o, d, jnp.full((n,), jnp.inf)


class TestPallasKernels:
    def test_tiled_matches_flat(self):
        from mitsuba3_amvpt_tpu.ops.isect import (pack_tiles,
                                                  ray_triangles_pallas,
                                                  ray_triangles_tiled)
        p0, p1, p2 = _random_tris(4096)
        soa, tb = pack_tiles(p0, p1, p2)
        o, d, maxt = _random_rays(2048)
        t1, _, _, id1 = ray_triangles_pallas(o, d, maxt, soa)
        t2, _, _, id2 = ray_triangles_tiled(o, d, maxt, soa, tb)
        assert (np.asarray(id1) == np.asarray(id2)).all()

    def test_hbm_matches_vmem(self):
        from mitsuba3_amvpt_tpu.ops.isect import (pack_tiles,
                                                  ray_triangles_tiled,
                                                  ray_triangles_tiled_hbm)
        p0, p1, p2 = _random_tris(8192, seed=3)
        soa, tb = pack_tiles(p0, p1, p2)
        o, d, maxt = _random_rays(2048, seed=4)
        t1, _, _, id1 = ray_triangles_tiled(o, d, maxt, soa, tb)
        t2, _, _, id2 = ray_triangles_tiled_hbm(o, d, maxt, soa, tb)
        assert (np.asarray(id1) == np.asarray(id2)).all()


def test_rows_kernel_matches_lane_kernel():
    """Small-scene row-layout sweep == lane-layout sweep (bit-exact)."""
    from mitsuba3_amvpt_tpu.ops.isect import (
        pack_tri_rows, pack_tri_soa, ray_triangles_pallas,
        ray_triangles_pallas_rows)
    p0, p1, p2 = _random_tris(36, seed=3)
    rng = np.random.default_rng(1)
    n = 4096
    o = jnp.asarray(rng.random((n, 3), np.float32) * 4 - 2)
    d = jnp.asarray(rng.random((n, 3), np.float32) - 0.5)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.full((n,), np.inf, jnp.float32)
    t0, u0, v0, i0 = ray_triangles_pallas(o, d, maxt,
                                          pack_tri_soa(p0, p1, p2))
    t1, u1, v1, i1 = ray_triangles_pallas_rows(o, d, maxt,
                                               pack_tri_rows(p0, p1, p2))
    hit0 = np.asarray(i0) >= 0
    assert (hit0 == (np.asarray(i1) >= 0)).all()
    assert np.array_equal(np.asarray(i0)[hit0], np.asarray(i1)[hit0])
    np.testing.assert_allclose(np.asarray(t0)[hit0], np.asarray(t1)[hit0],
                               rtol=1e-5)


def test_binned_matches_brute_on_device():
    """Binned tracer vs dense MT brute ON THE TPU (Mosaic-compiled,
    not interpret mode): guards the class of bug where compiled
    kernels diverge from the interpreted CPU tests — e.g. the round-3
    MXU-default-precision tile fetch that shifted tile AABBs and
    dropped ~1e-4 of hits (scripts/validate_binned_tpu.py is the
    scaled-up version of this check)."""
    from mitsuba3_amvpt_tpu.accel.build import build_bvh, treelet_tiles
    from mitsuba3_amvpt_tpu.accel.traverse import ray_triangle
    from mitsuba3_amvpt_tpu.ops import binned_trace as bt

    rng = np.random.default_rng(3)
    F = 20_000
    c = rng.random((F, 3)).astype(np.float32) * 10.0
    p0 = (c + rng.normal(0, 0.3, (F, 3))).astype(np.float32)
    p1 = (c + rng.normal(0, 0.3, (F, 3))).astype(np.float32)
    p2 = (c + rng.normal(0, 0.3, (F, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, meta, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    starts = treelet_tiles(meta, F)
    soa, sup_ab, tile_c, ns, nt, pmap = bt.pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        tile_starts=starts)

    n = 4096
    o = jnp.asarray(rng.random((n, 3)).astype(np.float32) * 12 - 1)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    maxt = jnp.full((n,), jnp.inf)
    t_b, _, _, id_b = bt.ray_triangles_binned(
        o, d, maxt, soa, sup_ab, tile_c, ns, nt, prim_map=pmap)

    t, u, v, hit = ray_triangle(o[:, None, :], d[:, None, :],
                                jnp.asarray(p0)[None],
                                jnp.asarray(p1)[None],
                                jnp.asarray(p2)[None])
    t = jnp.where(hit, t, jnp.inf)
    t_r = np.asarray(jnp.min(t, axis=1))
    t_b = np.asarray(t_b)
    assert (np.isfinite(t_b) == np.isfinite(t_r)).all()
    both = np.isfinite(t_b)
    assert np.allclose(t_b[both], t_r[both], rtol=1e-4, atol=1e-5)
