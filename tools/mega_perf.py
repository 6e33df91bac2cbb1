#!/usr/bin/env python
"""Megakernel per-iteration cost probe (real TPU).

Times render_megakernel on the bench cover scene with fixiters-pinned
trip counts N1 < N2; marginal cost/iter = (T2 - T1) / ((N2 - N1) * tiles).
This cancels dispatch overhead and per-tile fixed cost.  Use --ablate to
measure a section's share (cost drop when the section is stubbed out).

Usage:
  python tools/mega_perf.py                      # sweep lanes x sub
  python tools/mega_perf.py --ablate             # section ablations
  python tools/mega_perf.py --lanes 1024 --sub 8 # one config
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from rt_tpu import scenes
from rt_tpu.megakernel import render_megakernel


def time_frame(scene, camera, cfg, spp, key, *, lanes, sub, tile_pixels, ablate,
               trials=5):
    def run():
        img = render_megakernel(
            scene, camera, cfg, spp, 0, key,
            lanes=lanes, sub=sub, tile_pixels=tile_pixels, ablate=ablate,
        )
        jax.block_until_ready(img)
        return img

    run()  # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(scene, camera, cfg, spp, key, *, lanes, sub, tile_pixels, extra=""):
    n_pixels = camera.image_width * camera.image_height
    n_tiles = -(-n_pixels // tile_pixels)
    n1, n2 = 64, 320
    t1 = time_frame(scene, camera, cfg, spp, key, lanes=lanes, sub=sub,
                    tile_pixels=tile_pixels, ablate=f"fixiters:{n1} {extra}")
    t2 = time_frame(scene, camera, cfg, spp, key, lanes=lanes, sub=sub,
                    tile_pixels=tile_pixels, ablate=f"fixiters:{n2} {extra}")
    us = (t2 - t1) / ((n2 - n1) * n_tiles) * 1e6
    return us, t1, t2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=0)
    ap.add_argument("--sub", type=int, default=8)
    ap.add_argument("--tile", type=int, default=8192)
    ap.add_argument("--ablate", action="store_true")
    args = ap.parse_args()

    scene, camera, cfg = scenes.bench_cover_config()
    key = jax.random.key(cfg.seed)
    spp = cfg.samples_per_pixel

    if args.ablate:
        lanes, sub = args.lanes or 1024, args.sub
        base, _, _ = per_iter(scene, camera, cfg, spp, key, lanes=lanes,
                              sub=sub, tile_pixels=args.tile)
        print(f"lanes={lanes} sub={sub}: base {base:.2f} us/iter "
              f"({base / lanes * 1e3:.2f} ns/lane)")
        for section in ("nointersect", "noshade", "nofetch", "nodeposit",
                        "noclaims", "nocamera", "norng", "nosky", "noimg"):
            us, _, _ = per_iter(scene, camera, cfg, spp, key, lanes=lanes,
                                sub=sub, tile_pixels=args.tile, extra=section)
            print(f"  {section:12s}: {us:.2f} us/iter (section ~{base - us:.2f})")
        return

    configs = []
    if args.lanes:
        configs = [(args.lanes, args.sub)]
    else:
        for lanes in (512, 1024, 2048):
            for sub in (1, 8):
                if lanes % sub == 0 and lanes // sub >= 64:
                    configs.append((lanes, sub))
    for lanes, sub in configs:
        try:
            us, t1, t2 = per_iter(scene, camera, cfg, spp, key, lanes=lanes,
                                  sub=sub, tile_pixels=args.tile)
            print(f"lanes={lanes:5d} sub={sub}: {us:6.2f} us/iter  "
                  f"{us / lanes * 1e3:5.2f} ns/lane-bounce  "
                  f"(t64={t1 * 1e3:.1f} ms t320={t2 * 1e3:.1f} ms)")
        except Exception as e:  # noqa: BLE001
            print(f"lanes={lanes:5d} sub={sub}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
