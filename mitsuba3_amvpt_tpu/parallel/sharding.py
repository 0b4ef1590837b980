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

    acc = film_prepare(scene.film)
    done, i = 0, 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        # lanes must divide evenly across devices
        while (W * H * sp) % n_dev != 0:
            sp += 1
        acc = acc + one_pass(scene, jnp.uint32(seed + sp * i + done), sp)
        done += sp
        i += 1
    return acc if raw else film_develop(acc)
