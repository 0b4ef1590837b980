"""Interaction / sampling record pytrees.

jnp-dataclass equivalents of include/mitsuba/render/interaction.h (833
LoC) and records.h (236 LoC).  Every field is a wavefront array (leading
axis = lanes); records flow through ``lax.scan``/``lax.while_loop``
bodies, so they are registered pytrees (flax.struct).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import math as m


@struct.dataclass
class Ray:
    """Ray with origin, unit direction and max extent (core/ray.h)."""

    o: jnp.ndarray        # (N, 3)
    d: jnp.ndarray        # (N, 3)
    maxt: jnp.ndarray     # (N,)

    @staticmethod
    def make(o, d, maxt=None):
        if maxt is None:
            maxt = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        return Ray(o=o, d=d, maxt=maxt)

    def at(self, t):
        return self.o + self.d * t[..., None]


@struct.dataclass
class PreliminaryIntersection:
    """Detached output of the accel-structure hit kernel
    (interaction.h PreliminaryIntersection): enough to reconstruct the
    full differentiable SurfaceInteraction (SURVEY.md §A.1)."""

    t: jnp.ndarray           # (N,) hit distance, inf = miss
    prim_uv: jnp.ndarray     # (N, 2) barycentrics
    prim_index: jnp.ndarray  # (N,) triangle / primitive id
    shape_index: jnp.ndarray  # (N,) shape id (indexes scene shape tables)

    @property
    def is_valid(self):
        return jnp.isfinite(self.t)


@struct.dataclass
class SurfaceInteraction:
    """Full shading-point record (interaction.h SurfaceInteraction3f)."""

    t: jnp.ndarray           # (N,)
    p: jnp.ndarray           # (N, 3) position
    n: jnp.ndarray           # (N, 3) geometric normal
    sh_n: jnp.ndarray        # (N, 3) shading normal (frame n)
    sh_s: jnp.ndarray        # (N, 3) shading tangent
    sh_t: jnp.ndarray        # (N, 3) shading bitangent
    uv: jnp.ndarray          # (N, 2) surface parameterization
    wi: jnp.ndarray          # (N, 3) incident dir in *local* shading frame
    prim_index: jnp.ndarray  # (N,)
    shape_index: jnp.ndarray  # (N,) index into scene.shapes tables, -1 = env
    material_index: jnp.ndarray  # (N,) index into material table
    emitter_index: jnp.ndarray   # (N,) index into emitter table, -1 = none
    # barycentric-interpolated per-vertex attribute (mesh_attribute
    # textures, src/textures/mesh_attribute.cpp); None when no mesh in
    # the scene carries vertex colors
    vattr: jnp.ndarray = None    # (N, 3) or None

    @property
    def is_valid(self):
        return jnp.isfinite(self.t)

    def to_world(self, v_local):
        return m.frame_to_world(self.sh_n, self.sh_s, self.sh_t, v_local)

    def to_local(self, v_world):
        return m.frame_to_local(self.sh_n, self.sh_s, self.sh_t, v_world)

    @property
    def wi_world(self):
        return self.to_world(self.wi)

    def spawn_ray(self, d):
        """Offset along the geometric normal to dodge self-intersection
        (interaction.h ``spawn_ray`` / offset_p)."""
        scale = jnp.maximum(1.0, jnp.max(jnp.abs(self.p), axis=-1))
        o = self.p + m.mulsign(self.n * (m.RAY_EPS * scale)[..., None],
                               m.dot(self.n, d)[..., None])
        return Ray.make(o, d)

    def spawn_ray_to(self, target):
        """Shadow ray toward a point; maxt shortened on both ends."""
        delta = target - self.p
        dist = m.norm(delta)
        d = delta / jnp.maximum(dist[..., None], 1e-20)
        scale = jnp.maximum(1.0, jnp.max(jnp.abs(self.p), axis=-1))
        o = self.p + m.mulsign(self.n * (m.RAY_EPS * scale)[..., None],
                               m.dot(self.n, d)[..., None])
        tscale = jnp.maximum(1.0, jnp.max(jnp.abs(target), axis=-1))
        maxt = dist * (1.0 - 1e-4) - m.RAY_EPS * (scale + tscale)
        return Ray(o=o, d=d, maxt=maxt)


@struct.dataclass
class PositionSample:
    """records.h PositionSample3f."""

    p: jnp.ndarray
    n: jnp.ndarray
    uv: jnp.ndarray
    pdf: jnp.ndarray        # area-measure pdf
    delta: jnp.ndarray      # bool


@struct.dataclass
class DirectionSample:
    """records.h DirectionSample3f — emitter/sensor direction samples."""

    p: jnp.ndarray          # (N, 3) sampled point
    n: jnp.ndarray          # (N, 3) normal at sampled point
    uv: jnp.ndarray         # (N, 2)
    d: jnp.ndarray          # (N, 3) unit direction ref -> p
    dist: jnp.ndarray       # (N,)
    pdf: jnp.ndarray        # (N,) solid-angle pdf (0 = invalid)
    delta: jnp.ndarray      # (N,) bool: Dirac (point/directional/specular)
    emitter_index: jnp.ndarray  # (N,) which emitter was sampled


@struct.dataclass
class BSDFSample:
    """render/bsdf.h BSDFSample3f."""

    wo: jnp.ndarray          # (N, 3) sampled outgoing dir, local frame
    pdf: jnp.ndarray         # (N,)
    eta: jnp.ndarray         # (N,) relative IOR of the sampled event
    sampled_delta: jnp.ndarray      # (N,) bool — delta lobe sampled
    sampled_transmission: jnp.ndarray  # (N,) bool
    weight: jnp.ndarray      # (N, C) throughput weight f*cos/pdf
