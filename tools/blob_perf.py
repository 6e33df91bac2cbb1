#!/usr/bin/env python
"""Closed-mesh (blob-class) clustered-kernel probe on the real TPU.

Measures, with lane binning on/off:
  - the per-ROW vs pool entered-cluster union ratio (countrow ablation —
    the coherence the binning is supposed to create), and
  - marginal us/iter for base / nofetch / nointersect (where the time goes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/blob_perf.py
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.megakernel import render_megakernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--scene", default="blob", choices=["blob", "360k", "40k"])
    ap.add_argument("--spp", type=int, default=2)
    args = ap.parse_args()

    w, h = 800, 450
    camera = scenes.cam1(w, h)
    if args.scene == "blob":
        from tools.gen_fixtures import ensure_fixtures

        fx = ensure_fixtures("/tmp/rt_fixtures")
        scene = scenes.mesh_with_area_light(fx["obj"])
        camera = scenes.cam1(w, h)
    elif args.scene == "360k":
        scene = scenes.cover_scene(300, 300, camera, z=-0.2, seed=0)
    else:
        scene = scenes.cover_scene(100, 100, camera, z=-0.2, seed=0)
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=1, max_depth=50)
    key = jax.random.key(0)
    spp = args.spp

    def frame(ablate, bin_mode):
        c = cfg.replace(bin_lanes=bin_mode)
        img = render_megakernel(
            scene, camera, c, spp, 0, key,
            lanes=args.lanes, tile_pixels=8192, ablate=ablate,
        )
        return np.asarray(jax.block_until_ready(img))

    def timeit(ablate, bin_mode, trials=3):
        frame(ablate, bin_mode)
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            frame(ablate, bin_mode)
            best = min(best, time.perf_counter() - t0)
        return best

    n_tiles = -(-w * h // 8192)
    n1, n2 = 48, 192
    for bin_mode in ("off", "on"):
        img = frame(f"countrow fixiters:{n1}", bin_mode)
        upool = img[4, 0] * spp * n_tiles
        urow = img[5, 0] * spp * n_tiles
        sub = 8
        print(
            f"bin={bin_mode}: U_pool={upool:.0f} sum_row={urow:.0f} "
            f"grouping headroom {upool * sub / max(urow, 1):.2f}x",
            flush=True,
        )
        for ab in ("", "fetchnodot", "fetchconstoh", "fetchnoloop"):
            t1 = timeit(f"{ab} fixiters:{n1}".strip(), bin_mode)
            t2 = timeit(f"{ab} fixiters:{n2}".strip(), bin_mode)
            us = (t2 - t1) / ((n2 - n1) * n_tiles) * 1e6
            print(
                f"  bin={bin_mode} [{ab or 'base':22s}]: {us:8.2f} us/iter"
                f"  (t{n1}={t1 * 1e3:7.1f} ms t{n2}={t2 * 1e3:7.1f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
