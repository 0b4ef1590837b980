"""Adaptive multi-view spp budgeting from shared variance statistics.

The north-star generalization of AMVPT's adaptive sampling
(BASELINE.json: "adaptive spp controller -> cross-host collective
variance reduction"; the reference's in-tree mechanism only refills
pixels where reuse failed, mvpath_multi.h:79-115 — it has no cross-view
budget).  Here the sample budget is re-allocated across the quilt's
views between rounds:

1. every round renders a fixed-size wavefront whose lanes choose a
   VIEW by inverse-CDF on the current allocation and a pixel uniformly
   inside that view's tile (the film's weight channel makes any pixel
   sampling distribution unbiased),
2. the film tracks luminance second moments alongside the values, so
   each round yields a per-pixel variance-of-the-mean estimate,
3. per-view scores sigma_v = sqrt(mean pixel variance) drive a Neyman
   allocation a_v ~ sigma_v (floored so no view starves),
4. under ``shard_map`` the per-view statistics are implicit collectives:
   each device renders its lane slice (globally-indexed seeds), films
   are ``psum``'d, and every device computes the SAME allocation — the
   controller state is replicated for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...core import math as m
from ...core.rng import Sampler
from ...core.spectrum import luminance
from ..film import film_develop, film_prepare, film_put
from . import api as render_api


def _view_map(scene):
    """(H*W,) int32 view id of every quilt pixel."""
    W, H = scene.sensor.film_resolution
    xs = (jnp.arange(W) + 0.5) / W
    ys = (jnp.arange(H) + 0.5) / H
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    view, _ = scene.sensor.quilt_decode(uv)
    return view.astype(jnp.int32)


def _per_view_sigma(scene, acc, acc2, vmap_px):
    """Per-view sqrt(mean variance-of-the-pixel-mean) from the film
    accumulators; one tiny one-hot contraction (V views)."""
    V = scene.sensor.n_sensors
    w = jnp.maximum(acc[..., -1].reshape(-1), 1e-8)
    mean_lum = luminance(acc[..., :3].reshape(-1, 3)) / w
    ex2 = acc2[..., 0].reshape(-1) / w
    var_pix = jnp.maximum(ex2 - mean_lum ** 2, 0.0) / w   # var of the mean
    onehot = jax.nn.one_hot(vmap_px, V, dtype=acc.dtype)
    cnt = jnp.maximum(onehot.sum(0), 1.0)
    return jnp.sqrt(onehot.T @ var_pix / cnt)             # (V,)


def _allocation(sigma, floor_frac=0.25):
    """Neyman allocation mixed with a uniform floor: every view keeps
    at least floor_frac/V of the budget (no view starves)."""
    V = sigma.shape[0]
    neyman = sigma / jnp.maximum(jnp.sum(sigma), 1e-12)
    return (1.0 - floor_frac) * neyman + floor_frac / V


def _round(scene, acc, acc2, alloc, seed, n_lanes, lane0, integrator,
           max_depth, rr_depth):
    """One adaptive round: lanes pick (view ~ alloc, pixel ~ uniform)."""
    sensor = scene.sensor
    V = sensor.n_sensors
    tw, th = sensor.resolution

    gl = lane0 + jnp.arange(n_lanes, dtype=jnp.uint32)
    smp = Sampler.seed(seed, lane=gl)
    u_v, smp = smp.next_1d()
    cdf = jnp.cumsum(alloc)
    view = jnp.clip(jnp.searchsorted(cdf, u_v), 0, V - 1).astype(jnp.int32)
    u_pix, smp = smp.next_2d()
    origin = sensor.quilt_tile_origin(view)
    pos = origin.astype(jnp.float32) + u_pix * jnp.asarray(
        [tw, th], jnp.float32)
    u_lens, smp = smp.next_2d()
    ray, weight = sensor.sample_ray(view, u_pix, u_lens)

    sample_fn = render_api._INTEGRATORS[integrator]
    L, valid, aovs, smp = sample_fn(scene, ray, smp, max_depth=max_depth,
                                    rr_depth=rr_depth)
    val = L * weight
    acc = film_put(scene.film, acc, pos, val)
    lum2 = luminance(val) ** 2
    acc2 = film_put(scene.film, acc2, pos, lum2[..., None])
    return acc, acc2


@functools.partial(jax.jit, static_argnames=(
    "spp", "rounds", "integrator", "max_depth", "rr_depth", "axis_name",
    "n_dev", "return_alloc"))
def render_multiview_adaptive(scene, spp: int = 32, rounds: int = 4,
                              seed=0, integrator: str = "path",
                              max_depth: int = 6, rr_depth: int = 5,
                              axis_name: str = None, n_dev: int = 1,
                              return_alloc: bool = False):
    """Adaptive cross-view budget render -> developed quilt image.

    Total budget = W*H*spp lanes split into ``rounds`` equal wavefronts;
    round 0 is uniform, later rounds follow the variance allocation.
    With ``axis_name``/``n_dev`` set (inside shard_map) each device
    renders 1/n_dev of every round (globally-indexed seeds, so results
    are device-count invariant) and the films/statistics are psum'd."""
    W, H = scene.sensor.film_resolution
    V = scene.sensor.n_sensors
    n_total = W * H * spp
    n_round = n_total // rounds
    lane_stride = n_round
    n_local = n_round // n_dev
    dev = jax.lax.axis_index(axis_name) if axis_name is not None else 0

    acc = film_prepare(scene.film)
    acc2 = film_prepare(scene.film, channels=1)
    vmap_px = _view_map(scene)
    alloc = jnp.full((V,), 1.0 / V)
    allocs = [alloc]
    for r in range(rounds):
        lane0 = jnp.uint32(r * lane_stride + dev * n_local)
        acc_r = film_prepare(scene.film)
        acc2_r = film_prepare(scene.film, channels=1)
        acc_r, acc2_r = _round(scene, acc_r, acc2_r, alloc,
                               jnp.asarray(seed, jnp.uint32), n_local,
                               lane0, integrator, max_depth, rr_depth)
        if axis_name is not None:
            acc_r = jax.lax.psum(acc_r, axis_name)
            acc2_r = jax.lax.psum(acc2_r, axis_name)
        acc = acc + acc_r
        acc2 = acc2 + acc2_r
        if r + 1 < rounds:
            sigma = _per_view_sigma(scene, acc, acc2, vmap_px)
            alloc = _allocation(sigma)
            allocs.append(alloc)

    img = film_develop(acc)
    if return_alloc:
        return img, jnp.stack(allocs)
    return img
