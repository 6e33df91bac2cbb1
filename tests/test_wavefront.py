"""Persistent-wavefront integrator: correctness vs the megabatch path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import scenes, sky as sky_mod
from rt_tpu.config import RenderConfig
from rt_tpu.render import render_pixel_colors
from rt_tpu.scene import SceneBuilder
from rt_tpu.wavefront import render_wavefront


def test_wavefront_pool_size_invariance():
    """The image must not depend on pool size (keys follow work ids)."""
    camera = scenes.cam1(24, 16)
    scene = scenes.cover_scene(2, 2, camera, seed=0)
    cfg = RenderConfig(width=24, height=16, max_depth=8)
    pix = jnp.arange(24 * 16, dtype=jnp.int32)
    key = jax.random.key(0)
    a = np.asarray(render_wavefront(scene, camera, pix, cfg, 2, jnp.int32(0), key, pool_size=64))
    b = np.asarray(render_wavefront(scene, camera, pix, cfg, 2, jnp.int32(0), key, pool_size=4096))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_wavefront_deterministic_sky_paths():
    """On an empty scene, every sample is a pure sky lookup — wavefront and
    sky module must agree exactly."""
    b = SceneBuilder()
    b.lambertian_rgb(0.5, 0.5, 0.5)
    scene = b.build(use_bvh=False)
    camera = scenes.cam1(16, 8)
    cfg = RenderConfig(width=16, height=8, max_depth=4)
    pix = jnp.arange(16 * 8, dtype=jnp.int32)
    got = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 1, jnp.int32(0), jax.random.key(0))
    )
    # Compare against a direct sky evaluation of the same camera rays.
    px = pix % 16
    py = pix // 16
    from rt_tpu import sampling

    off_u, off_v = sampling.halton_pair(jnp.zeros_like(pix))
    fx = px.astype(jnp.float32) + off_u
    fy = py.astype(jnp.float32) + off_v
    d = (
        camera.pixel00_loc[None, :]
        + fx[:, None] * camera.pixel_du[None, :]
        + fy[:, None] * camera.pixel_dv[None, :]
        - camera.center[None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    want = np.asarray(sky_mod.sky_color_toward(scene.sky, d))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wavefront_statistical_agreement_with_megabatch():
    """Same physics, different RNG streams: high-spp means must agree."""
    camera = scenes.cam1(16, 12)
    scene = scenes.cover_scene(2, 2, camera, seed=0)
    cfg = RenderConfig(width=16, height=12, max_depth=8)
    wf = np.asarray(render_pixel_colors(scene, camera, cfg, spp=96, wavefront=True))
    mb = np.asarray(render_pixel_colors(scene, camera, cfg, spp=96, wavefront=False))
    # Per-pixel Monte Carlo noise at 96 spp is a few percent; compare tight
    # on the mean and loose per pixel.
    assert abs(wf.mean() - mb.mean()) < 0.01
    np.testing.assert_allclose(wf.mean(axis=(0, 1)), mb.mean(axis=(0, 1)), atol=0.02)


def test_wavefront_handles_more_work_than_pool():
    camera = scenes.cam1(8, 8)
    scene = scenes.cover_scene(1, 1, camera, seed=0)
    cfg = RenderConfig(width=8, height=8, max_depth=6)
    pix = jnp.arange(64, dtype=jnp.int32)
    img = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 16, jnp.int32(0), jax.random.key(1), pool_size=32)
    )
    assert np.all(np.isfinite(img))
    assert img.max() > 0.0
