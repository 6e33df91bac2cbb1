#!/usr/bin/env python
"""On-chip expansion-sweep A/B: render a closed shell with
expand_sweep on vs off on the REAL TPU and bound their divergence.

The CPU interpret tests (tests/test_megakernel_expansion.py) pin the
logic; this drives the compiled kernel on hardware — including the
SPHERE visit flavor, which tri-dominated scenes never exercise with
real item traffic.  Expected: a sub-1% epsilon-class pixel diff (the
row sweep's row-group-UNION candidate sets recover AABB-boundary ties
the per-ray slab test culls; see megakernel.py's expansion notes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/expansion_ab.py [tri|sphere]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def shell_scene(kind):
    from rt_tpu.scene import SceneBuilder
    from rt_tpu.sky import SkyParams

    b = SceneBuilder()
    b.add_sphere((0, 0, -1000), 1000, b.lambertian(b.solid_color((0.5, 0.5, 0.5))))
    mats = [
        b.lambertian(b.solid_color((0.7, 0.4, 0.3))),
        b.metal(b.solid_color((0.8, 0.8, 0.9)), fuzz=0.05),
        b.dielectric(1.5),
    ]
    n_seg, r0 = 48, 1.4
    for i in range(n_seg):
        th0 = np.pi * i / n_seg
        th1 = np.pi * (i + 1) / n_seg
        for j in range(2 * n_seg):
            ph0 = np.pi * j / n_seg
            ph1 = np.pi * (j + 1) / n_seg
            m = mats[(i + j) % 3]
            if kind == "sphere":
                th = (th0 + th1) / 2
                ph = (ph0 + ph1) / 2
                p = (
                    r0 * np.sin(th) * np.cos(ph),
                    r0 * np.sin(th) * np.sin(ph),
                    1.0 + r0 * np.cos(th),
                )
                if j % 2 == 0:
                    b.add_sphere(p, 0.055, m)
            else:
                def pt(th, ph):
                    return (
                        r0 * np.sin(th) * np.cos(ph),
                        r0 * np.sin(th) * np.sin(ph),
                        1.0 + r0 * np.cos(th),
                    )

                b.add_triangle(pt(th0, ph0), pt(th1, ph0), pt(th1, ph1), m)
                b.add_triangle(pt(th0, ph0), pt(th1, ph1), pt(th0, ph1), m)
    return b.build(sky=SkyParams.default())


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "tri"
    import jax

    from rt_tpu.camera import make_camera
    from rt_tpu.config import RenderConfig
    from rt_tpu.megakernel import eligible_clustered, render_megakernel

    scene = shell_scene(kind)
    print(
        f"{kind} shell: prims={scene.num_spheres + scene.num_triangles} "
        f"chord={scene.clusters.chord_clusters:.2f}"
    )
    cam = make_camera(
        (6, 0, 2), (0, 0, 1), (0, 0, 1), focus_distance=6.0,
        defocus_angle=0.0, image_width=400, image_height=225,
        vertical_fov=30.0,
    )
    cfg = RenderConfig(width=400, height=225, samples_per_pixel=8, max_depth=8)
    assert eligible_clustered(scene, cfg)
    key = jax.random.key(0)
    imgs = {}
    for mode in ("off", "on"):
        c = cfg.replace(expand_sweep=mode)
        render_megakernel(scene, cam, c, 8, 0, key)  # compile
        t0 = time.time()
        imgs[mode] = np.asarray(
            jax.block_until_ready(render_megakernel(scene, cam, c, 8, 0, key))
        )
        print(f"expand={mode}: warm {time.time() - t0:.2f} s", flush=True)
    d = np.abs(imgs["on"] - imgs["off"]).max(axis=1)
    frac = float((d > 1e-6).mean())
    print(f"pixels differing: {int((d > 1e-6).sum())}/{d.size} max {d.max():.4f}")
    assert frac < 0.02, "divergence beyond the epsilon class"
    assert np.isfinite(imgs["on"]).all()
    print(f"{kind}-flavor on-chip A/B OK")


if __name__ == "__main__":
    main()
