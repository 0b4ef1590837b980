"""CPU (interpret-mode) validation of the cull-then-pop streamed tracer
(ops/stream_trace.py) against the XLA reference sweep.

The real-hardware path is exercised by tests/test_pallas_tpu.py under
MT_TPU_TESTS=1; here Pallas interpret mode checks kernel *logic*
(cull conservativeness, pop-loop termination, double-buffer DMA
sequencing) on the virtual CPU backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from mitsuba3_amvpt_tpu.ops.stream_trace import (
    TILE, pack_tri_soa16, ray_triangles_streamed, tile_bounds16)
from mitsuba3_amvpt_tpu.accel.build import build_bvh
from mitsuba3_amvpt_tpu.accel.traverse import ray_triangle


def _random_tris(n, extent=10.0, size=0.8, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.random((n, 3)).astype(np.float32) * extent
    p0 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    p1 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    p2 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    return p0, p1, p2


def _reference(o, d, maxt, p0, p1, p2):
    t, u, v, hit = ray_triangle(o[:, None, :], d[:, None, :],
                                p0[None], p1[None], p2[None])
    t = jnp.where(t < maxt[:, None], t, jnp.inf)
    k = jnp.argmin(t, axis=1)
    tk = jnp.take_along_axis(t, k[:, None], 1)[:, 0]
    ok = jnp.isfinite(tk)
    return tk, jnp.where(ok, k, -1)


@pytest.mark.parametrize("n_tri", [700, 2000])
def test_stream_trace_matches_reference(n_tri, rng):
    p0, p1, p2 = _random_tris(n_tri)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, _, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    soa16 = pack_tri_soa16(p0, p1, p2)
    tb = tile_bounds16(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))

    n = 1024   # one ray block
    o = jnp.asarray(rng.random((n, 3), dtype=np.float32) * 10.0)
    dn = rng.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
    d = jnp.asarray(dn)
    maxt = jnp.full((n,), jnp.inf)

    with pltpu.force_tpu_interpret_mode():
        t, u, v, cid = ray_triangles_streamed(o, d, maxt, soa16, tb)
    t_ref, id_ref = _reference(o, d, maxt, jnp.asarray(p0),
                               jnp.asarray(p1), jnp.asarray(p2))

    t = np.asarray(t)
    t_ref = np.asarray(t_ref)
    assert (np.isfinite(t) == np.isfinite(t_ref)).all()
    both = np.isfinite(t) & np.isfinite(t_ref)
    assert np.allclose(t[both], t_ref[both], rtol=1e-5, atol=1e-5)
    # ids may differ only when two tris intersect at identical t
    same = np.asarray(cid)[both] == np.asarray(id_ref)[both]
    assert same.mean() > 0.999


def test_stream_trace_anyhit_and_maxt(rng):
    p0, p1, p2 = _random_tris(900, seed=3)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    _, _, order = build_bvh(lo, hi)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    soa16 = pack_tri_soa16(p0, p1, p2)
    tb = tile_bounds16(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))

    n = 1024
    o = jnp.asarray(rng.random((n, 3), dtype=np.float32) * 10.0)
    dn = rng.normal(size=(n, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
    d = jnp.asarray(dn)
    # finite maxt: occlusion must agree with closest-hit-within-range
    maxt = jnp.full((n,), 6.0)

    with pltpu.force_tpu_interpret_mode():
        t, _, _, cid = ray_triangles_streamed(o, d, maxt, soa16, tb)
        ta, _, _, cida = ray_triangles_streamed(o, d, maxt, soa16, tb,
                                                any_hit=True)
    t_ref, _ = _reference(o, d, maxt, jnp.asarray(p0), jnp.asarray(p1),
                          jnp.asarray(p2))
    hit_ref = np.isfinite(np.asarray(t_ref))
    assert (np.isfinite(np.asarray(t)) == hit_ref).all()
    assert ((np.asarray(cida) >= 0) == hit_ref).all()


def test_stream_trace_empty_and_padding(rng):
    # fewer tris than one TILE and rays that all miss
    p0, p1, p2 = _random_tris(50, seed=5)
    soa16 = pack_tri_soa16(p0, p1, p2)
    assert soa16.shape == (16, TILE)
    tb = tile_bounds16(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2))
    n = 1024
    o = jnp.full((n, 3), 100.0)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    maxt = jnp.full((n,), jnp.inf)
    with pltpu.force_tpu_interpret_mode():
        t, _, _, cid = ray_triangles_streamed(o, d, maxt, soa16, tb)
    assert not np.isfinite(np.asarray(t)).any()
    assert (np.asarray(cid) == -1).all()
