"""mitsuba3-amvpt_tpu — a TPU-native differentiable Monte Carlo renderer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
Mitsuba 3 + the AMVPT multi-view extension (reference:
xacond00/mitsuba3-amvpt).  NOT a port: the Dr.Jit JIT/autodiff substrate
is replaced by jax.jit/XLA tracing, Embree/OptiX by a C++ SAH BVH
builder + JAX/Pallas traversal, and the plugin/Object/XML machinery by a
Python registry over pytree-of-SoA-arrays scenes.

Architecture stance (SURVEY.md §7):
  * one codebase, no compiled "variants": dtype + spectral mode are
    runtime config flags (reference: resources/configure.py variants),
  * the scene is a pytree of flat SoA arrays compiled into wavefront
    kernels under ``jax.jit``,
  * polymorphic dispatch (Dr.Jit vcalls) becomes masked per-type
    evaluation over the set of types present in the scene,
  * gradients via Path Replay Backpropagation as ``jax.custom_vjp``,
  * scale-out via ``jax.sharding`` meshes, rays/views sharded.
"""

__version__ = "0.1.0"

from .core import math as cmath  # noqa: F401
from .core import warp, rng, fresnel, microfacet, spectrum  # noqa: F401
from .render.records import Ray, SurfaceInteraction, DirectionSample  # noqa: F401
from .loader.dict_loader import load_dict  # noqa: F401
from .loader.xml_loader import load_file, load_string  # noqa: F401
from .render.integrators.api import render  # noqa: F401
