"""Scaling-efficiency harness (BASELINE north star: >=80% rays/s
efficiency at 1 chip / 1 host / N hosts).

Measures rays/s of the sharded renderer at increasing device counts on
whatever mesh is available (real chips, or the virtual CPU mesh under
``--xla_force_host_platform_device_count``) and reports efficiency
relative to linear scaling from 1 device.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def measure_scaling(scene, spp: int = 8, max_depth: int = 4,
                    device_counts=None, repeats: int = 3):
    """Returns list of dicts: {devices, rays_per_s, efficiency}."""
    from .sharding import make_mesh, render_sharded

    all_dev = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32)
                         if d <= len(all_dev)]
    W, H = scene.sensor.film_resolution
    rays = W * H * spp * max_depth * 2

    results = []
    base = None
    for nd in device_counts:
        mesh = make_mesh(all_dev[:nd])
        img = render_sharded(scene, mesh, spp=spp, max_depth=max_depth,
                             seed=0)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        for r in range(repeats):
            img = render_sharded(scene, mesh, spp=spp, max_depth=max_depth,
                                 seed=r + 1)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / repeats
        rps = rays / dt
        if base is None:
            base = rps
        results.append(dict(devices=nd, rays_per_s=rps,
                            efficiency=rps / (base * nd)))
    return results


def main():  # pragma: no cover - manual harness
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.utils import scenes
    sc = mt.load_dict(scenes.cornell_box(res=64))
    for row in measure_scaling(sc):
        print(f"devices={row['devices']:3d}  "
              f"{row['rays_per_s'] / 1e6:8.2f} Mrays/s  "
              f"eff={row['efficiency'] * 100:5.1f}%")


if __name__ == "__main__":
    main()
