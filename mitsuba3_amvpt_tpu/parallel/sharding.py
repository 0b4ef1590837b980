"""Multi-chip / multi-host distribution of rendering.

The reference is single-device (SURVEY.md §2.8: no MPI/NCCL anywhere);
its parallelism axes (wavefront SIMD, CPU tiles, pass splitting, AMVPT
view groups) map to TPU as:

  * wavefront lanes (pixels x spp [x views]) -> sharded over a 1D
    ``rays`` mesh axis via shard_map; the scene pytree is replicated,
  * film accumulation -> per-device partial films + ``psum`` over the
    mesh (rides ICI; one small all-reduce per pass),
  * parameter gradients (PRB) -> ``psum`` in the same shard_map body,
  * spp pass-splitting stays a host loop (reference mvpath.cpp:222-246).

Multi-host: the same code runs under ``jax.distributed`` with a global
mesh; lanes are globally indexed so results are independent of the
device count (deterministic seeding by global lane id).
"""

from __future__ import annotations

import functools
import logging
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.rng import Sampler
from ..render.film import film_prepare, film_put, film_develop
from ..render.integrators import api as render_api
from ..render.integrators import path as path_mod


def make_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    """1D mesh over all (or given) devices; rays are the sharded axis."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _pass_body(scene, seed, spp_pass, n_dev, integrator, max_depth,
               rr_depth, axis):
    """Per-device body: render this device's lane slice into a full-size
    local film, then psum films across the mesh."""
    W, H = scene.sensor.film_resolution
    lanes_per_dev = (W * H * spp_pass) // n_dev
    dev = jax.lax.axis_index(axis)
    lane0 = dev * lanes_per_dev

    # deterministic: sampler keyed by *global* lane id
    gl = lane0 + jnp.arange(lanes_per_dev, dtype=jnp.uint32)
    sampler = Sampler.seed(seed, lane=gl)

    spp = spp_pass
    pixel = (gl // jnp.maximum(spp, 1)).astype(jnp.int32)
    px = (pixel % W).astype(jnp.float32)
    py = (pixel // W).astype(jnp.float32)
    u_pos, sampler = sampler.next_2d()
    pos = jnp.stack([px, py], -1) + u_pos
    pos_uv = pos / jnp.array([W, H], jnp.float32)
    view, uv = scene.sensor.quilt_decode(pos_uv)
    u_lens, sampler = sampler.next_2d()
    ray, weight, = scene.sensor.sample_ray(view, uv, u_lens)[:2]

    sample_fn = render_api._INTEGRATORS[integrator]
    L, valid, aovs, sampler = sample_fn(scene, ray, sampler,
                                        max_depth=max_depth,
                                        rr_depth=rr_depth)
    acc = film_prepare(scene.film)
    acc = film_put(scene.film, acc, pos, L * weight)
    return jax.lax.psum(acc, axis)


def render_sharded(scene, mesh: Mesh, spp: int = 16, seed: int = 0,
                   integrator: str = "path", max_depth: int = 6,
                   rr_depth: int = 5, spp_per_pass: int = None,
                   raw: bool = False):
    """Distributed render over `mesh` -> replicated (H, W, 3) image."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (n_dev << 22) // max(W * H, 1)))

    @functools.partial(jax.jit, static_argnames=("spp_pass",))
    def one_pass(scene_in, seed_in, spp_pass):
        body = functools.partial(_pass_body, spp_pass=spp_pass, n_dev=n_dev,
                                 integrator=integrator, max_depth=max_depth,
                                 rr_depth=rr_depth, axis=axis)
        return shard_map(body, mesh=mesh,
                         in_specs=(P(), P()), out_specs=P(),
                         check_vma=False)(scene_in, seed_in)

    # lanes must divide evenly across devices: per-pass spp granularity
    q = n_dev // math.gcd(W * H, n_dev)
    spp_per_pass = max(q, spp_per_pass // q * q)
    acc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        if sp % q:
            sp = -(-sp // q) * q      # final-pass round-up, reported
            logging.getLogger(__name__).info(
                "render_sharded: final pass rounded %d -> %d spp",
                spp - done, sp)
        acc = acc + one_pass(scene, jnp.uint32(seed + sp * i + done), sp)
        done += sp
        i += 1
    return acc if raw else film_develop(acc)


# ---------------------------------------------------------------------------
# AMVPT view-axis sharding: 2D (views, rays) mesh
# ---------------------------------------------------------------------------

def make_mesh2d(n_views_axis: int, devices=None,
                axis_names=("views", "rays")) -> Mesh:
    """2D mesh: leading axis shards AMVPT view blocks, trailing axis
    shards rays within a view block (SURVEY §2.8 TPU-native plan:
    "views = leading shard axis; reuse group = local per-shard")."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    assert devices.size % n_views_axis == 0
    return Mesh(devices.reshape(n_views_axis, -1), axis_names)


def _mvpath_shard_body(scene, seed, spp_pass, S, n_vdev, n_rdev,
                       max_depth, rr_depth, sa_mis, fast_mis,
                       vaxis, raxis):
    """Per-device body: render this device's (view block, ray slice) of
    the quilt wavefront with the batched AMVPT estimator, splat into a
    full-quilt local film, psum over both axes."""
    from ..render.integrators.mvpath import _sample_multi
    sensor = scene.sensor
    N = sensor.n_sensors
    vw, vh = sensor.resolution
    vb = N // n_vdev                      # views per view-shard
    lanes_view = vw * vh * spp_pass       # lanes per view
    lanes_dev = vb * lanes_view // n_rdev

    vi = jax.lax.axis_index(vaxis)
    ri = jax.lax.axis_index(raxis)
    # global lane ids are VIEW-MAJOR so reuse groups (S consecutive
    # views) stay inside one view-shard; sampler keyed on the global
    # lane id => image independent of the mesh shape
    l0 = (vi * vb * lanes_view + ri * lanes_dev).astype(jnp.uint32)
    gl = l0 + jnp.arange(lanes_dev, dtype=jnp.uint32)
    sampler = Sampler.seed(seed, lane=gl)

    view = (gl // lanes_view).astype(jnp.int32)
    rem = gl % lanes_view
    pixel = (rem // jnp.maximum(spp_pass, 1)).astype(jnp.int32)
    px = (pixel % vw).astype(jnp.float32)
    py = (pixel // vw).astype(jnp.float32)
    u_pos, sampler = sampler.next_2d()
    origin = sensor.quilt_tile_origin(view).astype(jnp.float32)
    pos = origin + jnp.stack([px, py], -1) + u_pos
    uv = (jnp.stack([px, py], -1) + u_pos) \
        / jnp.array([vw, vh], jnp.float32)
    u_lens, sampler = sampler.next_2d()
    ray, rweight = sensor.sample_ray(view, uv, u_lens)

    splats, _, sampler, _, _ = _sample_multi(
        scene, ray, pos, view, sampler, S, max_depth, rr_depth, sa_mis,
        u_lens, fast_mis=fast_mis)

    acc = film_prepare(scene.film)
    for spos, val, fw, sactive in splats:
        acc = film_put(scene.film, acc, spos, val, weight=fw,
                       active=sactive)
    return jax.lax.psum(jax.lax.psum(acc, raxis), vaxis)


def render_mvpath_sharded(scene, mesh: Mesh, spp: int = 16, seed: int = 0,
                          max_depth: int = 6, rr_depth: int = 5,
                          reuse_count: int = 0, sa_mis: bool = True,
                          fast_mis: bool = False, raw: bool = False):
    """AMVPT multi-view render over a 2D (views, rays) mesh.

    The quilt's views shard over the leading mesh axis, rays/pixels
    over the trailing axis.  Lane ids are global, so the image is
    bit-identical for any mesh shape including (1, 1) — tested on the
    virtual CPU mesh.

    Requires n_views % n_vdev == 0.  Reuse groups (S consecutive
    views, the unit of AMVPT sample sharing) MAY span view-shards: the
    batched estimator is lane-local (each lane reprojects its own
    sample into all S group cameras and splats into its local
    full-quilt film; the psum merges) — sharding affects splat
    locality, not correctness.

    Per-pass lane counts must divide n_rdev; spp_pass is therefore
    chosen as a multiple of n_rdev / gcd(vw*vh, n_rdev) up front.  If
    the requested spp leaves a remainder that cannot satisfy this, the
    final pass is rounded UP to the next multiple (reported, not
    silent); the film weight channel keeps the estimate unbiased.
    """
    from ..render.integrators.mvpath import reuse_group_size
    vaxis, raxis = mesh.axis_names
    n_vdev, n_rdev = mesh.devices.shape
    sensor = scene.sensor
    N = sensor.n_sensors
    S = reuse_group_size(N, reuse_count) if N > 1 else 1
    assert N % n_vdev == 0, \
        f"views ({N}) must divide across view-shards ({n_vdev})"
    vw, vh = sensor.resolution
    q = n_rdev // math.gcd(vw * vh, n_rdev)   # spp granularity per pass
    spp_pass = max(1, min(spp, (n_rdev * n_vdev << 21)
                          // max(vw * vh * N * S, 1)))
    spp_pass = max(q, spp_pass // q * q)

    @functools.partial(jax.jit, static_argnames=("spp_pass",))
    def one_pass(scene_in, seed_in, spp_pass):
        body = functools.partial(
            _mvpath_shard_body, spp_pass=spp_pass, S=S, n_vdev=n_vdev,
            n_rdev=n_rdev, max_depth=max_depth, rr_depth=rr_depth,
            sa_mis=sa_mis, fast_mis=fast_mis, vaxis=vaxis, raxis=raxis)
        return shard_map(body, mesh=mesh, in_specs=(P(), P()),
                         out_specs=P(), check_vma=False)(scene_in,
                                                         seed_in)

    acc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_pass, spp - done)
        if sp % q:
            sp = -(-sp // q) * q      # final-pass round-up, reported
            logging.getLogger(__name__).info(
                "render_mvpath_sharded: final pass rounded %d -> %d spp "
                "(lane count must divide %d ray-shards)",
                spp - done, sp, n_rdev)
        acc = acc + one_pass(scene, jnp.uint32(seed + sp * i + done), sp)
        done += sp
        i += 1
    return acc if raw else film_develop(acc)
