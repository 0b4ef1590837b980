"""Binned front-to-back tracer (ops/binned_trace.py) correctness tests
(CPU interpret mode): exact match against the brute-force reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from mitsuba3_amvpt_tpu.ops.binned_trace import (pack_binned,
                                                 ray_triangles_binned)
from mitsuba3_amvpt_tpu.accel.traverse import ray_triangle

pytestmark = pytest.mark.smoke


def brute(o, d, maxt, p0, p1, p2):
    t, u, v, hit = ray_triangle(o[:, None, :], d[:, None, :],
                                p0[None], p1[None], p2[None])
    t = jnp.where(hit & (t < maxt[:, None]), t, jnp.inf)
    k = jnp.argmin(t, axis=1)
    tk = jnp.min(t, axis=1)
    return np.asarray(tk), np.asarray(k)


def random_soup(n_tri, rng, extent=10.0, size=0.6):
    c = rng.random((n_tri, 3)).astype(np.float32) * extent
    p0 = (c + rng.normal(0, size, (n_tri, 3))).astype(np.float32)
    p1 = (c + rng.normal(0, size, (n_tri, 3))).astype(np.float32)
    p2 = (c + rng.normal(0, size, (n_tri, 3))).astype(np.float32)
    return p0, p1, p2


@pytest.mark.parametrize("n_tri,n_ray", [(700, 256), (5000, 256)])
def test_matches_brute(rng, n_tri, n_ray):
    p0, p1, p2 = random_soup(n_tri, rng)
    # spatially coherent order (morton by centroid) as production does
    cen = (p0 + p1 + p2) / 3
    q = np.clip(((cen - cen.min(0)) / np.ptp(cen, 0) * 255), 0,
                255).astype(np.uint64)
    key = sum(((q[:, a] >> b) & 1) << (3 * b + a)
              for a in range(3) for b in range(8))
    order = np.argsort(key)
    p0, p1, p2 = p0[order], p1[order], p2[order]

    soa, sup_ab, tile_c, ns, nt, pmap = pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    o = rng.random((n_ray, 3)).astype(np.float32) * 12.0 - 1.0
    d = rng.normal(size=(n_ray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.full((n_ray,), jnp.inf)

    t, u, v, cid = ray_triangles_binned(jnp.asarray(o), jnp.asarray(d),
                                        maxt, soa, sup_ab, tile_c, ns, nt, prim_map=pmap)
    tb, kb = brute(jnp.asarray(o), jnp.asarray(d), maxt,
                   jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))

    t = np.asarray(t)
    hit_match = np.isfinite(t) == np.isfinite(tb)
    assert hit_match.all(), f"{(~hit_match).sum()} hit mismatches"
    both = np.isfinite(t)
    assert np.allclose(t[both], tb[both], rtol=1e-4, atol=1e-5)
    # ids: clustered id -> original; ties at equal t can differ
    # (atol matches the allclose above: near-zero t from origins that
    # sit on a triangle has no meaningful relative precision)
    same_t = np.isclose(t[both], tb[both], rtol=1e-4, atol=1e-5)
    assert same_t.mean() > 0.999


def test_any_hit_consistent(rng):
    p0, p1, p2 = random_soup(1500, rng)
    soa, sup_ab, tile_c, ns, nt, pmap = pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    o = rng.random((128, 3)).astype(np.float32) * 12.0 - 1.0
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.full((128,), jnp.inf)
    t, _, _, cid = ray_triangles_binned(jnp.asarray(o), jnp.asarray(d),
                                        maxt, soa, sup_ab, tile_c, ns, nt, prim_map=pmap)
    ta_, _, _, cida = ray_triangles_binned(jnp.asarray(o),
                                           jnp.asarray(d), maxt,
                                           soa, sup_ab, tile_c, ns, nt,
                                           any_hit=True, prim_map=pmap)
    occ = np.asarray(cida) >= 0
    assert (occ == np.isfinite(np.asarray(t))).all()


def test_finite_maxt(rng):
    p0, p1, p2 = random_soup(1200, rng)
    soa, sup_ab, tile_c, ns, nt, pmap = pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    o = rng.random((128, 3)).astype(np.float32) * 12.0 - 1.0
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.full((128,), 3.0)
    t, _, _, _ = ray_triangles_binned(jnp.asarray(o), jnp.asarray(d),
                                      maxt, soa, sup_ab, tile_c, ns, nt, prim_map=pmap)
    tb, _ = brute(jnp.asarray(o), jnp.asarray(d), maxt,
                  jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    t = np.asarray(t)
    assert (np.isfinite(t) == np.isfinite(tb)).all()
    both = np.isfinite(t)
    assert np.allclose(t[both], tb[both], rtol=1e-4, atol=1e-5)


def test_treelet_tiles_match_brute(rng):
    """Treelet tile boundaries (accel/build.treelet_tiles) through the
    full tracer: exact agreement with brute, and the prim_map resolves
    padded slots back to ordered prim indices."""
    from mitsuba3_amvpt_tpu.accel.build import build_bvh, treelet_tiles
    p0, p1, p2 = random_soup(4000, rng)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, meta, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    starts = treelet_tiles(meta, 4000)
    assert starts[0] == 0 and starts[-1] == 4000
    assert (np.diff(starts) > 0).all()
    assert (np.diff(starts) <= 128).all()

    soa, sup_ab, tile_c, ns, nt, pmap = pack_binned(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        tile_starts=starts)
    o = rng.random((256, 3)).astype(np.float32) * 12.0 - 1.0
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.full((256,), jnp.inf)
    t, u, v, cid = ray_triangles_binned(
        jnp.asarray(o), jnp.asarray(d), maxt, soa, sup_ab, tile_c,
        ns, nt, prim_map=pmap)
    tb, kb = brute(jnp.asarray(o), jnp.asarray(d), maxt,
                   jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    t = np.asarray(t)
    assert (np.isfinite(t) == np.isfinite(tb)).all()
    both = np.isfinite(t)
    assert np.allclose(t[both], tb[both], rtol=1e-4, atol=1e-5)
    cid = np.asarray(cid)
    assert (cid[both] >= 0).all() and (cid[both] < 4000).all()
    # where t matches exactly, the ordered prim index must match brute
    same = np.isclose(t[both], tb[both], rtol=1e-6, atol=1e-7)
    assert (cid[both][same] == np.asarray(kb)[both][same]).mean() > 0.99
