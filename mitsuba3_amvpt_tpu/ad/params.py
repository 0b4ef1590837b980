"""Scene parameter traversal (mi.traverse / SceneParameters equivalent,
reference src/python/python/util.py:13-332).

The scene is already a pytree, so "traversal" is path-based leaf
selection: ``traverse(scene)`` returns a flat {name: array} dict of the
differentiable parameters, and ``update_scene(scene, params)`` writes
modified values back (functionally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# differentiable parameter paths (name -> accessor chain)
_PARAM_PATHS = {
    "materials.albedo": ("materials", "albedo"),
    "materials.alpha": ("materials", "alpha"),
    "materials.eta": ("materials", "eta"),
    "materials.spec_refl": ("materials", "spec_refl"),
    "materials.spec_trans": ("materials", "spec_trans"),
    "emitters.radiance": ("emitters", "radiance"),
    "textures.texels": ("textures", "texels"),
    "geom.verts": ("geom", "verts"),
    # instance transforms (true instancing): rows are differentiable —
    # the SI reconstruction transforms the hit triangle through
    # inst_to_world per lane, so d(image)/d(instance pose) flows.
    # Callers updating it should keep inst_to_object/inst_nrm_mat
    # consistent for the detached traversal (update only perturbs the
    # attached SI; the primal hit uses the stored inverse).
    "geom.inst_to_world": ("geom", "inst_to_world"),
}


def traverse(scene, keys=None) -> dict:
    """Flat view of the differentiable scene parameters."""
    out = {}
    for name, path in _PARAM_PATHS.items():
        if keys is not None and name not in keys:
            continue
        obj = scene
        for p in path:
            obj = getattr(obj, p)
        if obj is None:       # optional leaves (e.g. inst_to_world)
            continue
        out[name] = obj
    return out


def update_scene(scene, params: dict):
    """Return a new Scene with the given parameter values written back."""
    for name, val in params.items():
        path = _PARAM_PATHS[name]
        parent_path, leaf = path[:-1], path[-1]
        obj = scene
        chain = []
        for p in parent_path:
            chain.append((obj, p))
            obj = getattr(obj, p)
        new_obj = obj.replace(**{leaf: val})
        for holder, attr in reversed(chain):
            new_obj = holder.replace(**{attr: new_obj})
        scene = new_obj
    if "geom.verts" in params and scene.geom.bt_soa is not None:
        # vertex updates invalidate the cached binned-tracer tables
        # (accel/traverse.build_binned_cache); repack once per update
        # instead of once per bounce
        from ..accel.traverse import build_binned_cache
        scene = scene.replace(geom=build_binned_cache(scene.geom))
    return scene
