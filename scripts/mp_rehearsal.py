"""Multi-process jax.distributed rehearsal (CPU, 2 processes x 4 dev).

Run as a worker:  python scripts/mp_rehearsal.py <proc_id> <n_procs> <port>
Each process initializes the distributed runtime, renders the same
scene over the GLOBAL 8-device mesh, and writes its (replicated) image
to /tmp/mp_rehearsal_<proc_id>.npy — the launcher asserts both match
the single-process reference bit-for-bit (global lane indexing makes
the image independent of the process/device layout).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    proc_id = int(sys.argv[1])
    n_procs = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_procs,
                               process_id=proc_id)
    assert jax.device_count() == 4 * n_procs, jax.device_count()

    import numpy as np
    import mitsuba3_amvpt_tpu as mt
    from mitsuba3_amvpt_tpu.parallel.sharding import (make_mesh,
                                                      render_sharded)
    from mitsuba3_amvpt_tpu.utils import scenes

    scene = mt.load_dict(scenes.cornell_box(res=16))
    mesh = make_mesh(jax.devices())      # global 8-device mesh
    img = render_sharded(scene, mesh, spp=8, max_depth=3, seed=5)
    local = np.asarray(jax.device_get(img))
    np.save(f"/tmp/mp_rehearsal_{proc_id}.npy", local)
    print(f"proc {proc_id}: image mean {local.mean():.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
