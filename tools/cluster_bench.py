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


def bench(
    name, scene, w=800, h=450, spp=64, trials=2, bin_lanes="auto",
    camera=None, chunked=False,
):
    camera = camera or scenes.cam1(w, h)
    cfg = RenderConfig(
        width=w, height=h, samples_per_pixel=spp if chunked else 1,
        max_depth=50, bin_lanes=bin_lanes,
    )
    if chunked:
        # Slow scene classes (closed meshes) exceed the ~30 s device
        # watchdog in one dispatch; time them through the production
        # chunked path instead (render_image sizes ray budgets per path).
        from rt_tpu.render import render_image

        render_image(scene, camera, cfg)  # compile
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            render_image(scene, camera, cfg)
            best = min(best, time.perf_counter() - t0)
    else:
        # Scene rides as a jit ARGUMENT (a closure would inline the
        # geometry tables as HLO constants — >50 MB scenes overflow the
        # remote compiler's request limit).
        burst = jax.jit(
            lambda s: render_pixel_colors(s, camera, cfg, spp=spp)
        )
        jax.block_until_ready(burst(scene))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(burst(scene))
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
    if which in ("1.7m",):
        bench("1.7M spheres (streamed)", scenes.cover_scene(650, 650, cam, z=-0.2, seed=0), spp=spp, bin_lanes=bin_lanes)
    if which in ("819k",):
        import os
        from tools.gen_fixtures import make_obj_heightfield

        hf = "/tmp/rt_fixtures/heightfield640.obj"
        os.makedirs("/tmp/rt_fixtures", exist_ok=True)
        if not os.path.exists(hf):
            make_obj_heightfield(hf, 640, 640)
        bench("819k-tri heightfield (streamed)", scenes.mesh_scene({"plaster": hf}), spp=spp, bin_lanes=bin_lanes, chunked=True)
    if which in ("heightfield", "all"):
        from tools.gen_fixtures import ensure_fixtures

        fx = ensure_fixtures("/tmp/rt_fixtures")
        b = scenes.mesh_scene({"plaster": fx["heightfield"]})
        bench("100k-tri heightfield", b, spp=spp, bin_lanes=bin_lanes, chunked=True)
    if which in ("mesh", "all"):
        from tools.gen_fixtures import ensure_fixtures

        fx = ensure_fixtures("/tmp/rt_fixtures")
        bench("100k-tri blob+light", scenes.mesh_with_area_light(fx["obj"]), spp=spp, bin_lanes=bin_lanes, chunked=True)


if __name__ == "__main__":
    main()
