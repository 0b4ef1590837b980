"""XLA compile-stability regression tests.

TPU analog of the reference's kernel-history assertions
(src/render/tests/test_megakernel.py:52-56,175-186 uses
dr.kernel_history to assert cache hits across repeated renders).  Here
we assert that repeated renders with new seeds/parameter *values* hit
the jit cache — no silent recompilation explosions.
"""

import jax
import jax.numpy as jnp
import pytest
from jax._src import test_util as jtu

import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.utils.scenes import cornell_box

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def scene():
    return mt.load_dict(cornell_box(res=32))


def test_render_seed_change_no_recompile(scene):
    img = mt.render(scene, spp=2, max_depth=3, seed=0)
    jax.block_until_ready(img)
    with jtu.count_jit_compilation_cache_miss() as compiles, \
            jtu.count_jit_tracing_cache_miss() as traces:
        for seed in (1, 2, 3):
            jax.block_until_ready(
                mt.render(scene, spp=2, max_depth=3, seed=seed))
    assert compiles() == 0, \
        f"{compiles()} recompiles on seed-only change"
    assert traces() == 0, \
        f"{traces()} retraces on seed-only change"


def test_render_param_value_change_no_recompile(scene):
    from mitsuba3_amvpt_tpu.ad import traverse, update_scene
    params = traverse(scene)
    key = "materials.albedo"
    base = params[key]

    def go(scale, seed):
        sc = update_scene(scene, {key: base * scale})
        return mt.render(sc, spp=2, max_depth=3, seed=seed)

    jax.block_until_ready(go(1.0, 0))
    with jtu.count_jit_compilation_cache_miss() as compiles:
        jax.block_until_ready(go(0.5, 1))
        jax.block_until_ready(go(0.25, 2))
    assert compiles() == 0, \
        f"{compiles()} recompiles on param-value change"


def test_prb_grad_no_recompile(scene):
    from mitsuba3_amvpt_tpu.ad import render_ad, traverse, update_scene
    base = traverse(scene)["materials.albedo"]

    @jax.jit
    def loss(theta, seed):
        sc = update_scene(scene, {"materials.albedo": base * theta})
        return jnp.mean(render_ad(sc, spp=2, max_depth=3, seed=seed))

    g = jax.jit(jax.grad(loss))
    jax.block_until_ready(g(1.0, 0))
    with jtu.count_jit_compilation_cache_miss() as compiles:
        jax.block_until_ready(g(0.9, 1))
        jax.block_until_ready(g(0.8, 2))
    assert compiles() == 0, \
        f"{compiles()} recompiles in PRB grad steps"


def test_multi_pass_single_program(scene):
    """All equal-spp passes fuse into one program: pass count changes
    the static n_passes (one compile each) but per-pass bodies never
    compile separately — 4-pass render costs ONE program, and repeating
    it costs zero."""
    jax.block_until_ready(mt.render(scene, spp=4, spp_per_pass=1, seed=0))
    with jtu.count_jit_compilation_cache_miss() as compiles:
        jax.block_until_ready(
            mt.render(scene, spp=4, spp_per_pass=1, seed=5))
    assert compiles() == 0
