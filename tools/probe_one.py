#!/usr/bin/env python
"""One-config blob/cover probe: compile + time a single (ablate, bin) pair.

Prints marginal us/iter between two fixiters trip counts, plus any debug
counters the ablation writes into the acc image rows (countsweep /
countfetch / countent).  One config per process so compiles can run in
parallel across processes.

Usage: python tools/probe_one.py --scene blob --bin on --ablate countsweep
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
    ap.add_argument("--scene", default="blob", choices=["blob", "360k", "40k", "armor", "car"])
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bin", default="off", choices=["on", "off"])
    ap.add_argument("--ablate", default="")
    ap.add_argument("--n1", type=int, default=48)
    ap.add_argument("--n2", type=int, default=192)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--unroll", type=int, default=0)
    ap.add_argument("--expk", type=int, default=0)
    ap.add_argument("--expunroll", type=int, default=0)
    ap.add_argument("--expred", type=int, default=0)
    ap.add_argument("--expch", type=int, default=0)
    ap.add_argument("--tile", type=int, default=8192)
    ap.add_argument("--sub", type=int, default=0)
    args = ap.parse_args()

    if args.unroll:
        from rt_tpu import megakernel as _mk

        _mk._SWEEP_UNROLL = args.unroll
    if args.expk:
        from rt_tpu import megakernel as _mk

        _mk._EXP_K = args.expk
    if args.expunroll:
        from rt_tpu import megakernel as _mk

        _mk._EXP_UNROLL = args.expunroll
    if args.expred:
        from rt_tpu import megakernel as _mk

        _mk._EXP_RED_UNROLL = args.expred
    if args.expch:
        from rt_tpu import megakernel as _mk

        _mk._EXP_CH = args.expch

    w, h = 800, 450
    camera = scenes.cam1(w, h)
    if args.scene == "blob":
        from tools.gen_fixtures import ensure_fixtures

        fx = ensure_fixtures("/tmp/rt_fixtures")
        scene = scenes.mesh_with_area_light(fx["obj"])
    elif args.scene in ("armor", "car"):
        from tools.gen_fixtures import ensure_fixtures
        from rt_tpu import sky as sky_mod
        from rt_tpu.io.gltf_loader import add_gltf_to_scene
        from rt_tpu.scene import SceneBuilder

        fx = ensure_fixtures("/tmp/rt_fixtures")
        b = SceneBuilder()
        even = b.solid_color((0.1, 0.1, 0.1))
        odd = b.solid_color((0.95, 0.95, 0.95))
        scenes.add_ground_plane(
            b, 10000.0, 10000.0, -0.2, b.lambertian(b.checker(0.75, even, odd)), True
        )
        add_gltf_to_scene(
            b, fx["glb" if args.scene == "armor" else "car"],
            compat_all_metal=False,
        )
        scene = b.build().replace(
            sky=sky_mod.SkyParams.hosek(turbidity=3.0, albedo=0.3, elevation=0.8)
        )
    elif args.scene == "360k":
        scene = scenes.cover_scene(300, 300, camera, z=-0.2, seed=0)
    else:
        scene = scenes.cover_scene(100, 100, camera, z=-0.2, seed=0)
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=1, max_depth=50)
    key = jax.random.key(0)
    n_tiles = -(-w * h // args.tile)

    def frame(n_iters):
        c = cfg.replace(bin_lanes=args.bin)
        ab = f"{args.ablate} fixiters:{n_iters}".strip()
        kw = dict(lanes=args.lanes, tile_pixels=args.tile, ablate=ab)
        if args.sub:
            kw["sub"] = args.sub
        img = render_megakernel(scene, camera, c, args.spp, 0, key, **kw)
        return np.asarray(jax.block_until_ready(img))

    t0 = time.perf_counter()
    img1 = frame(args.n1)
    print(f"compile+run1: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    img2 = frame(args.n2)
    print(f"compile+run2: {time.perf_counter() - t0:.1f} s", flush=True)

    def timeit(n, trials):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            frame(n)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timeit(args.n1, args.trials)
    t2 = timeit(args.n2, args.trials)
    us = (t2 - t1) / ((args.n2 - args.n1) * n_tiles) * 1e6
    print(
        f"scene={args.scene} bin={args.bin} [{args.ablate or 'base'}]: "
        f"{us:8.2f} us/iter  (t{args.n1}={t1*1e3:.1f} ms t{args.n2}={t2*1e3:.1f} ms)",
        flush=True,
    )
    # Debug counters ride acc row 0 of the first tile: cols 2-9 are
    # countent(supers,clusters), U_pool, sum_row, countfetch, tri_total,
    # bincheck violations, countsweep visits (per-tile means after the
    # 1/spp scale; undo it and scale by tiles for totals).
    spp = args.spp
    for name, col in (
        ("entered_supers", 2), ("entered_clusters", 3), ("U_pool", 4),
        ("sum_row", 5), ("fetch_visits", 6), ("tri_cl_total", 7),
        ("bin_violations", 8), ("sweep_visits", 9),
        ("exp_items", 10), ("exp_visits", 11), ("exp_ovf_lanes", 12),
        ("expcheck_bt_mism", 13), ("expcheck_bi_mism", 14),
        ("expcheck_lanes", 15),
    ):
        v1 = img1[col, 0] * spp
        v2 = img2[col, 0] * spp
        if v1 or v2:
            per_iter = (v2 - v1) / (args.n2 - args.n1)
            print(f"  {name}: n1={v1:.0f} n2={v2:.0f} per_iter={per_iter:.1f}")


if __name__ == "__main__":
    main()
