"""Worker process for the 2-process jax.distributed CPU smoke test.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npy>

Each process owns 2 virtual CPU devices; the global mesh spans 4.  The
render must be bit-identical to a single-process render because wavefront
RNG keys on the global (sample, pixel) pair.
"""

import os
import sys

coordinator, num_procs, proc_id, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rt_tpu import parallel  # noqa: E402

parallel.initialize_multihost(coordinator, num_procs, proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from rt_tpu import scenes  # noqa: E402
from rt_tpu.config import RenderConfig  # noqa: E402

W, H = 16, 12
camera = scenes.cam1(W, H)
scene = scenes.cover_scene(2, 2, camera, z=-0.2, seed=0)
cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=6)

mesh = parallel.make_mesh()
img = parallel.render_sharded_wavefront(scene, camera, cfg, mesh)
# tiled=True reassembles the sharded global image into host-local numpy.
img_np = np.asarray(multihost_utils.process_allgather(img, tiled=True))

if proc_id == 0:
    np.save(out_path, img_np.reshape(H, W, 3))
jax.distributed.shutdown()
