#!/usr/bin/env python
"""Clustered-megakernel deep-frame benchmark (README perf table rows).

Times 800x450 @ 64 spp single-dispatch frames on the standard API for the
scenes the round-2 table tracks; prints one line per scene.

Usage: python tools/cluster_bench.py [40k|360k|1m|mesh|all] [--spp N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.render import render_pixel_colors


def bench(name, scene, w=800, h=450, spp=64, trials=2, bin_lanes="auto", camera=None):
    camera = camera or scenes.cam1(w, h)
    cfg = RenderConfig(
        width=w, height=h, samples_per_pixel=1, max_depth=50,
        bin_lanes=bin_lanes,
    )
    burst = jax.jit(lambda: render_pixel_colors(scene, camera, cfg, spp=spp))
    jax.block_until_ready(burst())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(burst())
        best = min(best, time.perf_counter() - t0)
    mray = spp * w * h / 1e6 / best
    print(f"{name}: {mray:.2f} Mray/s ({best:.2f} s, prims={scene.num_spheres + scene.num_triangles})", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spp = 64
    if "--spp" in sys.argv:
        spp = int(sys.argv[sys.argv.index("--spp") + 1])
    bin_lanes = "auto"
    if "--bin" in sys.argv:
        bin_lanes = sys.argv[sys.argv.index("--bin") + 1]
    cam = scenes.cam1(800, 450)
    if which in ("40k", "all"):
        bench("40k spheres", scenes.cover_scene(100, 100, cam, z=-0.2, seed=0), spp=spp, bin_lanes=bin_lanes)
    if which in ("360k", "all"):
        bench("360k spheres", scenes.cover_scene(300, 300, cam, z=-0.2, seed=0), spp=spp, bin_lanes=bin_lanes)
    if which in ("1m", "all"):
        bench("1M spheres", scenes.cover_scene(500, 500, cam, z=-0.2, seed=0), spp=spp, bin_lanes=bin_lanes)
    if which in ("heightfield", "all"):
        from tools.gen_fixtures import ensure_fixtures

        fx = ensure_fixtures("/tmp/rt_fixtures")
        b = scenes.mesh_scene({"plaster": fx["heightfield"]})
        bench("100k-tri heightfield", b, spp=spp, bin_lanes=bin_lanes)
    if which in ("mesh", "all"):
        from tools.gen_fixtures import ensure_fixtures

        fx = ensure_fixtures("/tmp/rt_fixtures")
        bench("100k-tri blob+light", scenes.mesh_with_area_light(fx["obj"]), spp=spp, bin_lanes=bin_lanes)


if __name__ == "__main__":
    main()
