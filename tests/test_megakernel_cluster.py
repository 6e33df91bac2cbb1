"""Clustered-megakernel parity (interpret mode on CPU).

The clustered mode routes scenes with cluster tables (scene.py builds them
for >2048 prims or >128 triangles) through the same persistent-pool
megakernel, replacing the flat brute-force sweep with the hierarchical
super -> cluster worklist intersect and the one-hot shade fetch with
winner-cluster DMA slices from the HBM-resident slot-ordered shade table.
It must match the generic wavefront (the readable correctness reference)
the same way the flat megakernel does: shared RNG streams, differences
bounded by f32 summation order + polynomial transcendentals.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.camera import make_camera
from rt_tpu.config import RenderConfig
from rt_tpu.megakernel import eligible, eligible_clustered, render_megakernel
from rt_tpu.scene import SceneBuilder
from rt_tpu.sky import SkyParams
from rt_tpu.wavefront import _render_generic

W, H = 32, 24


def _camera():
    return make_camera(
        (6, 0, 2), (0, 0, 1), (0, 0, 1), focus_distance=6.0,
        defocus_angle=0.0, image_width=W, image_height=H, vertical_fov=30.0,
    )


def _tri_cloud_scene(n_tris=150, with_materials=True, seed=0):
    """>128 triangles triggers cluster-table construction (scene.py)."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    g = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -1000), 1000, g)
    mats = [b.metal(b.solid_color((0.8, 0.7, 0.6)), fuzz=0.1)]
    if with_materials:
        mats += [
            b.lambertian(
                b.checker(
                    0.5,
                    b.solid_color((0.1, 0.2, 0.3)),
                    b.solid_color((0.9, 0.9, 0.8)),
                )
            ),
            b.dielectric(1.5),
            b.emissive((2.0, 1.5, 1.0)),
        ]
    for i in range(n_tris):
        c = rng.uniform(-3, 3, 3)
        c[2] = rng.uniform(0.2, 2.0)
        d1 = rng.uniform(-0.3, 0.3, 3)
        d2 = rng.uniform(-0.3, 0.3, 3)
        b.add_triangle(tuple(c), tuple(c + d1), tuple(c + d2), mats[i % len(mats)])
    b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.8, 0.2, 0.1))))
    return b.build(sky=SkyParams.default())


def _compare(scene, camera, cfg, spp=2, atol=2e-3, outlier_frac=0.005):
    """Pixel parity vs the generic wavefront, allowing a tiny OUTLIER
    fraction: the expansion sweep's candidate sets are per-ray (faithful
    to the reference's per-ray BVH walk, hittable.rs:135-149), while the
    row sweep tests the row-group UNION of entered clusters — at AABB-
    boundary/horizon grazing hits and equal-truncated-t shared-edge
    ties the winners legitimately differ on ~0.1% of pixels (see
    test_megakernel_expansion.py for the invariant-level checks)."""
    key = jax.random.key(cfg.seed)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    ref = np.asarray(
        _render_generic(scene, camera, pix, cfg, spp, jnp.int32(0), key)
    )
    got = np.asarray(
        render_megakernel(
            scene, camera, cfg, spp, 0, key,
            lanes=256, tile_pixels=256, interpret=True,
        )
    )
    err = np.abs(got - ref) - (atol + 1e-3 * np.abs(ref))
    bad = (err > 0).any(axis=-1)
    assert bad.mean() <= outlier_frac, (
        f"{int(bad.sum())}/{bad.size} pixels beyond tolerance "
        f"(max abs diff {np.abs(got - ref).max():.4g})"
    )


def test_clustered_routing_and_parity():
    scene = _tri_cloud_scene()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=6)
    assert scene.clusters is not None
    assert not eligible(scene, cfg)  # flat path refuses clustered scenes
    assert eligible_clustered(scene, cfg)
    _compare(scene, _camera(), cfg)


def test_clustered_all_materials_and_emissive():
    """Checker, dielectric and emissive winners exercise every feature row
    of the DMA'd shade slices."""
    scene = _tri_cloud_scene(n_tris=140, with_materials=True, seed=3)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=6)
    _compare(scene, _camera(), cfg)


def test_clustered_sphere_heavy_scene():
    """>2048 spheres (a multi-cluster sphere set) + the triangle set empty.

    Thousands of tiny spheres put ~1% of rays on silhouette edges where a
    one-ulp intersection difference (the generic path's XLA fusion vs the
    kernel's packed-key t) flips a hit/RR decision and decorrelates that
    sample's whole path.  That is unbiased chaos, not bias — so assert the
    image mean tightly and bound the count of decorrelated pixels instead
    of demanding per-pixel equality (verified: got==nocull exactly, and
    the pixel error shrinks as spp grows)."""
    rng = np.random.default_rng(1)
    b = SceneBuilder()
    g = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -1000), 1000, g)
    for _ in range(2100):
        c = rng.uniform(-8, 8, 3)
        c[2] = rng.uniform(0.1, 1.5)
        b.add_sphere(tuple(c), 0.08, g)
    scene = b.build(sky=SkyParams.default())
    assert scene.clusters is not None and eligible_clustered(scene, RenderConfig())
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=1, max_depth=4)
    key = jax.random.key(cfg.seed)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    ref = np.asarray(_render_generic(scene, _camera(), pix, cfg, 1, jnp.int32(0), key))
    got = np.asarray(
        render_megakernel(
            scene, _camera(), cfg, 1, 0, key,
            lanes=256, tile_pixels=256, interpret=True,
        )
    )
    assert abs(got.mean() - ref.mean()) < 2e-3
    decorrelated = (np.abs(got - ref).max(axis=1) > 2e-3).sum()
    assert decorrelated <= 0.02 * W * H, decorrelated


def test_clustered_image_textured_triangles():
    """>128 image-textured triangles take the inline fetch with the
    24-row tri table (full-precision per-vertex UVs at rows 16-21) and
    the rect side-table entry — the glTF mesh-scene shape."""
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    b.add_sphere((0, 0, -1000), 1000, b.lambertian(b.solid_color((0.5, 0.5, 0.5))))
    img = rng.uniform(0.1, 1.0, (16, 16, 3)).astype(np.float32)
    mat = b.metal(b.image_texture(img), fuzz=0.05)
    for i in range(140):
        c = rng.uniform(-3, 3, 3)
        c[2] = rng.uniform(0.2, 2.0)
        d1 = rng.uniform(-0.4, 0.4, 3)
        d2 = rng.uniform(-0.4, 0.4, 3)
        uv = rng.uniform(0, 1, (3, 2))
        b.add_triangle(
            tuple(c), tuple(c + d1), tuple(c + d2), mat,
            uv_a=tuple(uv[0]), uv_b=tuple(uv[1]), uv_c=tuple(uv[2]),
        )
    scene = b.build(sky=SkyParams.default())
    assert scene.clusters is not None and scene.clusters.inline_ok
    assert scene.clusters.tri_slots.shape[0] == 24
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=6)
    assert eligible_clustered(scene, cfg)
    _compare(scene, _camera(), cfg)


def test_clustered_sample_offset_chunks_match_monolithic():
    """Progressive accumulation semantics survive the clustered route."""
    scene = _tri_cloud_scene(n_tris=135, with_materials=False)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=6)
    key = jax.random.key(cfg.seed)
    mono = np.asarray(
        render_megakernel(
            scene, _camera(), cfg, 4, 0, key,
            lanes=256, tile_pixels=256, interpret=True,
        )
    )
    parts = [
        np.asarray(
            render_megakernel(
                scene, _camera(), cfg, 2, off, key,
                lanes=256, tile_pixels=256, interpret=True,
            )
        )
        for off in (0, 2)
    ]
    np.testing.assert_allclose((parts[0] + parts[1]) / 2, mono, atol=1e-5)


def test_clustered_streamed_slots_parity(monkeypatch):
    """Slot-table STREAMING (geometry past the VMEM residency budget):
    force the streamed sweep by shrinking the budget and assert parity
    with the generic wavefront — the winner fetch takes the HBM
    shade-table DMA path in this mode."""
    from rt_tpu import megakernel as mk

    monkeypatch.setattr(mk, "_STREAM_VMEM_BUDGET", 1)  # stream everything
    scene = _tri_cloud_scene()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=5)
    _compare(scene, _camera(), cfg)


def test_bin_lanes_on_off_image_parity():
    """The per-bounce lane-binning sort is a BIT-exact state permutation
    (16-bit integer halves through HIGHEST one-hot matmuls) and work ids
    key the RNG streams, so bin on/off must produce the same image up to
    f32 deposit-summation order."""
    scene = _tri_cloud_scene()
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=5)
    key = jax.random.key(cfg.seed)
    imgs = {}
    for mode in ("on", "off"):
        imgs[mode] = np.asarray(
            render_megakernel(
                scene, _camera(), cfg.replace(bin_lanes=mode), 2, 0, key,
                lanes=256, tile_pixels=256, interpret=True,
            )
        )
    np.testing.assert_allclose(imgs["on"], imgs["off"], atol=2e-5)
