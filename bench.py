#!/usr/bin/env python
"""Benchmark: Mray/s on the RTIOW cover scene (BASELINE.json config 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition matches the reference's own throughput counter
(window.rs:315-324): rays = spp * W * H camera samples (bounce rays not
counted) / wall seconds.  The reference never recorded a number
(TODO.md:175-179), so vs_baseline is reported against the BASELINE.json
north-star target of 100 Mray/s/chip.
"""

import json
import sys
import time

NORTH_STAR_MRAY_S = 100.0


def main() -> None:
    import jax

    from rt_tpu import scenes
    from rt_tpu.render import render_pixel_colors

    scene, camera, cfg = scenes.bench_cover_config()

    # Warm-up (compile) pass.
    img = render_pixel_colors(scene, camera, cfg)
    jax.block_until_ready(img)

    # Throughput over a pipeline of progressive sweeps (distinct sample
    # offsets), one device sync at the end — the reference's cumulative
    # Mray/s counter semantics (window.rs:315-324: total rays so far /
    # elapsed).  Per-sweep blocking would charge each frame a full host
    # round-trip (~28 ms through this harness's TPU tunnel), which is
    # harness latency, not renderer throughput; a progressive render
    # (progressive.py) keeps sweeps in flight exactly like this.
    sweeps = 8
    trials = 3
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        imgs = [
            render_pixel_colors(
                scene, camera, cfg, sample_offset=i * cfg.samples_per_pixel
            )
            for i in range(sweeps)
        ]
        jax.block_until_ready(imgs)
        best = min(best, time.perf_counter() - t0)

    rays = sweeps * cfg.samples_per_pixel * camera.image_width * camera.image_height
    mray_s = rays / 1.0e6 / best
    print(
        json.dumps(
            {
                "metric": "mray_per_s_cover_400x225_10spp",
                "value": round(mray_s, 3),
                "unit": "Mray/s",
                "vs_baseline": round(mray_s / NORTH_STAR_MRAY_S, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
