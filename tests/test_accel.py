"""Acceleration-structure tests (mirrors reference
src/render/tests/test_kdtrees.py / test_mesh.py intersection coverage):
BVH traversal must agree exactly with the brute-force sweep."""

import jax.numpy as jnp
import numpy as np

from mitsuba3_amvpt_tpu.accel import build, traverse
from mitsuba3_amvpt_tpu.render.scene import GeometryArrays


def _random_geom(rng, n_tris=300, n_sph=20, accel="bvh"):
    v = rng.random((n_tris, 3, 3), np.float32) * 2 - 1
    verts = v.reshape(-1, 3)
    faces = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    sphc = (rng.random((n_sph, 3), np.float32) * 2 - 1).astype(np.float32)
    sphr = (rng.random(n_sph, np.float32) * 0.2 + 0.02).astype(np.float32)

    lo_t, hi_t = build.triangle_bounds(verts, faces)
    lo = np.concatenate([lo_t, sphc - sphr[:, None]], 0)
    hi = np.concatenate([hi_t, sphc + sphr[:, None]], 0)
    bbox, meta, order = build.build_bvh(lo, hi)
    return GeometryArrays(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        vnormals=jnp.zeros_like(jnp.asarray(verts)),
        vuvs=jnp.zeros((len(verts), 2)),
        has_vn=jnp.zeros(n_tris, bool), has_uv=jnp.zeros(n_tris, bool),
        tri_shape=jnp.zeros(n_tris, jnp.int32),
        sph_center=jnp.asarray(sphc), sph_radius=jnp.asarray(sphr),
        sph_shape=jnp.ones(n_sph, jnp.int32),
        bvh_bbox=jnp.asarray(bbox), bvh_meta=jnp.asarray(meta),
        bvh_prim_ids=jnp.asarray(order), accel_mode=accel)


def _random_rays(rng, n=500):
    o = jnp.asarray(rng.random((n, 3), np.float32) * 4 - 2)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return o, d


class TestBuilder:
    def test_cpp_builder_compiles(self):
        lib = build._get_lib()
        assert lib, "C++ BVH builder failed to compile"

    def test_topology(self, rng):
        lo = rng.random((100, 3), np.float32)
        hi = lo + rng.random((100, 3), np.float32) * 0.1
        bbox, meta, order = build.build_bvh(lo, hi)
        assert sorted(order.tolist()) == list(range(100))
        # every prim appears in exactly one leaf
        covered = np.zeros(100, bool)
        for i in range(len(meta)):
            first, count = meta[i]
            if count > 0:
                covered[order[first:first + count]] = True
                assert count <= 4
        assert covered.all()
        # children bbox contained in parent
        for i in range(len(meta)):
            first, count = meta[i]
            if count == 0:
                for c in (i + 1, first):
                    assert (bbox[c][0] >= bbox[i][0] - 1e-5).all()
                    assert (bbox[c][1] <= bbox[i][1] + 1e-5).all()


class TestTraversal:
    def test_bvh_matches_brute(self, rng):
        g = _random_geom(rng)
        o, d = _random_rays(rng)
        maxt = jnp.full(o.shape[0], jnp.inf)
        t_b, uv_b, p_b = traverse.intersect_brute(g, o, d, maxt)
        t_v, uv_v, p_v = traverse.intersect_bvh(g, o, d, maxt)
        t_b, t_v = np.asarray(t_b), np.asarray(t_v)
        p_b, p_v = np.asarray(p_b), np.asarray(p_v)
        hit_b = p_b >= 0
        assert (hit_b == (p_v >= 0)).all()
        assert np.allclose(t_b[hit_b], t_v[hit_b], rtol=1e-4)
        # allow tie-breaking differences only at equal t
        neq = hit_b & (p_b != p_v)
        assert (np.abs(t_b[neq] - t_v[neq]) < 1e-5).all()

    def test_any_hit_consistent(self, rng):
        g = _random_geom(rng)
        o, d = _random_rays(rng)
        maxt = jnp.full(o.shape[0], 1.5)
        _, _, p_b = traverse.intersect_brute(g, o, d, maxt)
        _, _, p_v = traverse.intersect_bvh(g, o, d, maxt, any_hit=True)
        assert ((np.asarray(p_b) >= 0) == (np.asarray(p_v) >= 0)).all()

    def test_sphere_exact(self):
        t, hit = traverse.ray_sphere(jnp.asarray([[0.0, 0, -5]]),
                                     jnp.asarray([[0.0, 0, 1]]),
                                     jnp.asarray([[0.0, 0, 0]]),
                                     jnp.asarray([1.0]))
        assert bool(hit[0]) and float(t[0]) == 4.0

    def test_triangle_exact(self):
        t, u, v, hit = traverse.ray_triangle(
            jnp.asarray([[0.25, 0.25, 1.0]]), jnp.asarray([[0.0, 0, -1]]),
            jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[1.0, 0, 0]]),
            jnp.asarray([[0.0, 1, 0]]))
        assert bool(hit[0])
        assert float(t[0]) == 1.0
        assert float(u[0]) == 0.25 and float(v[0]) == 0.25
