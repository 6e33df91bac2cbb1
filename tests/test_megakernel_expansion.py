"""Expansion-sweep correctness (interpret mode on CPU).

The round-5 expansion sweep (megakernel.py's (8,128) flipped-vreg item
pipeline) must produce the SAME nearest-hit results as the row-granular
sweep: both intersect identical (ray, cluster, slot) candidate sets with
identical FP expressions, and the overflow fallback only ever adds
candidates a ray legitimately entered (the min is unchanged).  Reference
anchor: the per-ray BVH walk the design matches is hittable.rs:135-149.
"""

import numpy as np
import jax
import pytest

from rt_tpu.camera import make_camera
from rt_tpu.config import RenderConfig
from rt_tpu.megakernel import eligible_clustered, render_megakernel
from rt_tpu.scene import SceneBuilder
from rt_tpu.sky import SkyParams

W, H = 32, 24


def _camera():
    return make_camera(
        (6, 0, 2), (0, 0, 1), (0, 0, 1), focus_distance=6.0,
        defocus_angle=0.0, image_width=W, image_height=H, vertical_fov=30.0,
    )


def _shell_scene(n_seg=24, radius=1.4, seed=3):
    """A closed triangulated sphere shell around the camera target plus a
    ground: bounce rays inside the shell enter MANY clusters (the
    blob-class overflow regime the fallback row sweep must cover)."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    g = b.lambertian(b.solid_color((0.6, 0.6, 0.5)))
    b.add_sphere((0, 0, -1000), 1000, g)
    mat = b.lambertian(b.solid_color((0.7, 0.4, 0.3)))
    met = b.metal(b.solid_color((0.8, 0.8, 0.9)), fuzz=0.05)
    # UV sphere triangulation, center (0, 0, 1)
    cz = 1.0
    for i in range(n_seg):
        th0 = np.pi * i / n_seg
        th1 = np.pi * (i + 1) / n_seg
        for j in range(2 * n_seg):
            ph0 = np.pi * j / n_seg
            ph1 = np.pi * (j + 1) / n_seg

            def pt(th, ph):
                return (
                    radius * np.sin(th) * np.cos(ph),
                    radius * np.sin(th) * np.sin(ph),
                    cz + radius * np.cos(th),
                )

            m = mat if (i + j) % 2 else met
            b.add_triangle(pt(th0, ph0), pt(th1, ph0), pt(th1, ph1), m)
            b.add_triangle(pt(th0, ph0), pt(th1, ph1), pt(th0, ph1), m)
    return b.build(sky=SkyParams.default())


def _render(scene, cfg, spp=2, lanes=256):
    key = jax.random.key(cfg.seed)
    return np.asarray(
        render_megakernel(
            scene, _camera(), cfg, spp, 0, key,
            lanes=lanes, tile_pixels=256, interpret=True,
        )
    )


def test_expansion_matches_row_sweep_bitexact():
    """Expansion on vs off: identical candidate sets, identical FP ops,
    deposit order unchanged -> images should agree bit-for-bit."""
    scene = _shell_scene(n_seg=10)
    assert eligible_clustered(scene, RenderConfig())
    base = RenderConfig(width=W, height=H, max_depth=6)
    img_off = _render(scene, base.replace(expand_sweep="off"))
    img_on = _render(scene, base.replace(expand_sweep="on"))
    assert np.isfinite(img_on).all()
    # Same-key cross-cluster ties could in principle pick a different
    # winner; they have not materialized on these scenes — keep exact.
    np.testing.assert_array_equal(img_on, img_off)


def test_expansion_overflow_fallback():
    """Grazing rays inside a closed shell enter > _EXP_K clusters; the
    overflow fallback row sweep must cover them.

    Exact image equality is NOT the contract here: at shared triangle
    edges two prims tie on the truncated t, and the row sweep can pick a
    tie candidate from a cluster the ray's own slab test culled (its
    candidate set is the row-group UNION, the expansion's is per-ray).
    Even the nearest DISTANCE can diverge at ~1e-4 rates: the slab
    test's grazing-interval rounding can cull a boundary cluster for
    the ray itself while a neighbor ray admits it into the row-group's
    union (robust-pad epsilon class, Ize 2013 — the reference's f64 BVH
    sidesteps it wholesale).  The in-kernel expcheck ablation runs both
    paths and bounds bt disagreements on non-overflow lanes to a tiny
    fraction; tie-class bi divergences are bounded separately."""
    scene = _shell_scene(n_seg=24)
    ncl = scene.clusters.tri_cluster.shape[0]
    assert ncl > 8, "shell should build multiple clusters"
    base = RenderConfig(width=W, height=H, max_depth=8)
    img_off = _render(scene, base.replace(expand_sweep="off"))
    img_on = _render(scene, base.replace(expand_sweep="on"))
    d = np.abs(img_on - img_off).max(axis=1)
    assert (d > 1e-6).mean() < 0.02, "tie-class divergence should be rare"
    # hard invariant: identical nearest distances on non-overflow lanes
    key = jax.random.key(0)
    from rt_tpu.megakernel import render_megakernel as rm

    img = np.asarray(
        rm(
            scene, _camera(), base.replace(expand_sweep="on"), 1, 0, key,
            lanes=256, tile_pixels=256, interpret=True,
            ablate="expcheck nodeposit fixiters:6",
        )
    )
    checked = max(img[15, 0], 1.0)
    assert img[13, 0] / checked < 0.005, (
        f"bt mismatches: {img[13, 0]} of {checked}"
    )


def test_expansion_mixed_sets():
    """Spheres AND triangles: both sets run the expansion pipeline with
    their own overflow masks and shade bases."""
    rng = np.random.default_rng(0)
    b = SceneBuilder()
    g = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -1000), 1000, g)
    mats = [
        b.metal(b.solid_color((0.8, 0.7, 0.6)), fuzz=0.1),
        b.lambertian(b.solid_color((0.2, 0.5, 0.7))),
        b.dielectric(1.5),
        b.emissive((1.5, 1.2, 1.0)),
    ]
    for i in range(140):
        c = rng.uniform(-3, 3, 3)
        c[2] = rng.uniform(0.2, 2.0)
        d1 = rng.uniform(-0.4, 0.4, 3)
        d2 = rng.uniform(-0.4, 0.4, 3)
        b.add_triangle(tuple(c), tuple(c + d1), tuple(c + d2), mats[i % 4])
    for i in range(60):
        c = rng.uniform(-3, 3, 3)
        c[2] = rng.uniform(0.2, 1.5)
        b.add_sphere(tuple(c), rng.uniform(0.05, 0.25), mats[i % 3])
    scene = b.build(sky=SkyParams.default())
    assert scene.clusters is not None
    base = RenderConfig(width=W, height=H, max_depth=6)
    img_off = _render(scene, base.replace(expand_sweep="off"))
    img_on = _render(scene, base.replace(expand_sweep="on"))
    d = np.abs(img_on - img_off).max(axis=1)
    assert (d > 1e-6).mean() < 0.02, "tie-class divergence should be rare"
