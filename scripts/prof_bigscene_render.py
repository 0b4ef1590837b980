"""Attributed device profile of the FULL bigscene render (the bench
metric), to find what dominates outside the raw trace."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.utils import scenes
    from prof_attr import profile_attr

    W = H = 256
    SPP, DEPTH = 4, 4
    scene = mt.load_dict(scenes.sphere_field(1_000_000, res=W))

    def frame(seed):
        return mt.render(scene, spp=SPP, max_depth=DEPTH, seed=seed)

    import time
    img = frame(0)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    jax.block_until_ready(frame(1))
    dt = time.perf_counter() - t0
    print(f"frame: {dt*1e3:.1f} ms  "
          f"{W*H*SPP*DEPTH*2/dt/1e6:.2f} Mrays/s", flush=True)

    profile_attr(lambda s: frame(1), (0,), lowered_args=(0,),
                 top=44, label="bigrender")


if __name__ == "__main__":
    main()
