#!/usr/bin/env python
"""One-off A/B probe for the clustered claims-section spill experiment.

Renders the 40k-sphere cover scene (100x100 grid) at 800x450 @ 64 spp as
one deep frame through the clustered megakernel, prints wall time, Mray/s
and an image checksum so the with/without-diff runs can be compared for
both speed and bit-identical output.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.megakernel import render_megakernel

W, H, SPP = 800, 450, 64
camera = scenes.cam1(W, H)
scene = scenes.cover_scene(100, 100, camera, z=-0.2, seed=0)
cfg = RenderConfig(width=W, height=H, max_depth=50)
key = jax.random.PRNGKey(0)

img, iters = render_megakernel(
    scene, camera, cfg, SPP, 0, key, return_iters=True
)
jax.block_until_ready(img)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    img = render_megakernel(scene, camera, cfg, SPP, 0, key)
    jax.block_until_ready(img)
    best = min(best, time.perf_counter() - t0)

arr = np.asarray(img)
rays = float(np.asarray(iters).sum()) if iters is not None else W * H * SPP
mray = W * H * SPP / best / 1e6
print(
    f"time={best:.3f}s  frame-Mray/s={mray:.2f}  "
    f"checksum={np.float64(arr).sum():.6f}  mean={arr.mean():.6f}"
)
