"""Benchmark harness (driver-run on real TPU at end of round).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): Mrays/s/chip on the Cornell-box config
(256x256 @ 64 spp, max depth 6).  Ray count is the number of ray-trace
queries the wavefront actually executes: every lane runs `max_depth`
closest-hit + `max_depth` shadow queries in lockstep, so
rays = W*H*spp * max_depth * 2 per pass.

The reference publishes no numbers (BASELINE.md); vs_baseline is
reported against a 100 Mrays/s nominal single-device target so the
driver can track round-over-round progress on identical hardware.
"""

from __future__ import annotations

import json
import time

NOMINAL_MRAYS = 100.0


def main():
    import jax
    import jax.numpy as jnp
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.render.film import film_prepare
    from mitsuba3_amvpt_tpu.render.integrators.api import render_passes
    from mitsuba3_amvpt_tpu.utils import scenes

    W = H = 256
    SPP = 64
    DEPTH = 6
    scene = mt.load_dict(scenes.cornell_box(res=W))

    spp_pass = 16
    n_passes = SPP // spp_pass

    def frame(seed):
        # all passes + develop fused into one XLA dispatch
        acc = film_prepare(scene.film)
        return render_passes(scene, acc, jnp.uint32(seed), n_passes,
                             spp_pass, "path", DEPTH, 5)

    # warmup / compile
    jax.block_until_ready(frame(0))

    t0 = time.perf_counter()
    img = frame(1)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    rays = W * H * SPP * DEPTH * 2
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "cornell_256_64spp_d6_mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NOMINAL_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
