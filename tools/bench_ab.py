#!/usr/bin/env python
"""A/B the bench burst with and without the prepare() split, one process."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rt_tpu import scenes
from rt_tpu import megakernel as mk
from rt_tpu.render import render_pixel_colors


def run_burst(scene, camera, cfg, prep, sweeps=32, trials=3):
    h, w = camera.image_height, camera.image_width
    offsets = jnp.arange(sweeps, dtype=jnp.int32) * cfg.samples_per_pixel

    @jax.jit
    def burst():
        def body(acc, off):
            img = render_pixel_colors(
                scene, camera, cfg, sample_offset=off, prepared=prep
            )
            return acc + img, None

        acc, _ = jax.lax.scan(body, jnp.zeros((h, w, 3), jnp.float32), offsets)
        return acc / sweeps

    jax.block_until_ready(burst())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(burst())
        best = min(best, time.perf_counter() - t0)
    rays = sweeps * cfg.samples_per_pixel * w * h
    return rays / best / 1e6


def main():
    scene, camera, cfg = scenes.bench_cover_config()
    order = sys.argv[1] if len(sys.argv) > 1 else "both"
    if order in ("both", "prep"):
        prep = mk.prepare(scene, camera, cfg)
        print(f"prep:   {run_burst(scene, camera, cfg, prep):.2f} Mray/s")
    if order in ("both", "noprep"):
        print(f"noprep: {run_burst(scene, camera, cfg, None):.2f} Mray/s")
    if order == "rev":
        print(f"noprep: {run_burst(scene, camera, cfg, None):.2f} Mray/s")
        prep = mk.prepare(scene, camera, cfg)
        print(f"prep:   {run_burst(scene, camera, cfg, prep):.2f} Mray/s")


if __name__ == "__main__":
    main()
