"""Pass-boundary checkpoint / resume.

The reference has only embryonic recovery (SIGHUP writes a partial image
mid-render, mitsuba_render.cpp:135-144; explicit seeds make passes
resumable in principle — SURVEY.md §5 "Checkpoint / resume").  This
module makes it first-class for long multi-pass renders and inverse-
rendering runs:

* a render checkpoint = (film accumulator, spp done, seed, per-pass
  metadata) — resuming re-enters the pass loop at the exact boundary;
  because per-pass seeds are ``seed + spp_per_pass*i + done``
  (mvpath.cpp:227 discipline), a resumed render is BIT-IDENTICAL to an
  uninterrupted one,
* a train checkpoint = any pytree (optimizer state, scene params)
  flattened to an .npz — the multi-host failure story is "restart from
  the last pass/step boundary" (SURVEY.md §5 failure detection).

Plain .npz on purpose: the state is small (one film-sized array + a few
scalars), so orbax-style async sharded checkpointing is not needed; on
multi-host only process 0 writes (all hosts hold replicated films after
the psum).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = "mi3-amvpt-tpu-ckpt-v1"


def save_render_checkpoint(path: str, acc, done_spp: int, seed: int,
                           meta: dict | None = None):
    """Write a film accumulator + progress to ``path`` (.npz)."""
    arrs = dict(acc=np.asarray(acc),
                done_spp=np.int64(done_spp),
                seed=np.int64(seed),
                magic=np.array(_MAGIC))
    for k, v in (meta or {}).items():
        arrs[f"meta_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_render_checkpoint(path: str):
    """Returns (acc, done_spp, seed, meta) or None if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != _MAGIC:
            raise ValueError(f"{path}: not a render checkpoint")
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
        return (jnp.asarray(z["acc"]), int(z["done_spp"]),
                int(z["seed"]), meta)


def render_resumable(scene, spp: int, checkpoint_path: str, seed: int = 0,
                     integrator: str = "path", max_depth: int = 6,
                     rr_depth: int = 5, spp_per_pass: int = None,
                     checkpoint_every: int = 1, raw: bool = False,
                     progress=None):
    """``render()`` with pass-boundary checkpointing.

    Resumes from ``checkpoint_path`` if it exists (validating the seed),
    writes a checkpoint every ``checkpoint_every`` passes, and removes
    it on completion.  The result is bit-identical to a plain
    ``render(scene, spp, seed, ...)`` call.
    """
    from ..render.film import film_develop, film_prepare
    from ..render.integrators.api import render_pass

    W, H = scene.sensor.film_resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 22) // max(W * H, 1)))

    ck = load_render_checkpoint(checkpoint_path)
    if ck is not None:
        acc, done, ck_seed, _ = ck
        if ck_seed != seed:
            raise ValueError(
                f"checkpoint seed {ck_seed} != requested seed {seed}")
    else:
        acc, done = film_prepare(scene.film), 0

    i = done // spp_per_pass
    passes_since = 0
    while done < spp:
        sp = min(spp_per_pass, spp - done)
        pass_seed = jnp.uint32(seed + sp * i + done)
        acc = render_pass(scene, acc, pass_seed, sp, integrator,
                          max_depth, rr_depth)
        done += sp
        i += 1
        passes_since += 1
        if progress is not None:
            progress.update(done)
        if passes_since >= checkpoint_every and done < spp:
            acc.block_until_ready()
            save_render_checkpoint(checkpoint_path, acc, done, seed)
            passes_since = 0
    if os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    if progress is not None:
        progress.finish()
    return acc if raw else film_develop(acc)


# ---------------------------------------------------------------------------
# generic pytree (optimizer / scene-param) checkpoints
# ---------------------------------------------------------------------------


def save_state(path: str, state):
    """Flatten any pytree of arrays to an .npz (optimizer moments, scene
    parameters, latents...)."""
    leaves = jax.tree_util.tree_leaves(state)
    arrs = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrs["n_leaves"] = np.int64(len(leaves))
    arrs["magic"] = np.array(_MAGIC + "-state")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_state(path: str, like):
    """Restore a pytree saved with ``save_state``; ``like`` supplies the
    tree structure (leaf order must match)."""
    treedef = jax.tree_util.tree_structure(like)
    with np.load(path, allow_pickle=False) as z:
        n = int(z["n_leaves"])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    if n != treedef.num_leaves:
        raise ValueError(f"{path}: {n} leaves != structure "
                         f"{treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
