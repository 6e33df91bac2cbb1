"""Fast scalarized wavefront path vs the generic reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.wavefront import _render_fast, _render_generic, render_wavefront


def _setup(w=24, h=16):
    camera = scenes.cam1(w, h)
    scene = scenes.cover_scene(2, 2, camera, z=-0.2, seed=0)
    cfg = RenderConfig(width=w, height=h, max_depth=10)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    return scene, camera, cfg, pix


def test_fast_path_selected_for_cover_scene():
    scene, camera, cfg, pix = _setup()
    assert scene.shade_table is not None
    assert scene.bvh is None


def test_fast_matches_generic_same_rng():
    """Both implementations consume identical hash-RNG streams, so the
    images must agree everywhere except tiny intersection-precision
    differences (kernel vs expanded-form quadratic)."""
    scene, camera, cfg, pix = _setup()
    key = jax.random.key(0)
    fast = np.asarray(_render_fast(scene, camera, pix, cfg, 4, jnp.int32(0), key))
    gen = np.asarray(_render_generic(scene, camera, pix, cfg, 4, jnp.int32(0), key))
    # Nearly all pixels identical; precision-induced differences may flip
    # an occasional RR/paths on tie-breaks.
    close = np.isclose(fast, gen, rtol=1e-3, atol=1e-3).mean()
    assert close > 0.98, close
    assert abs(fast.mean() - gen.mean()) < 0.01


def test_fast_path_deterministic_and_pool_invariant():
    scene, camera, cfg, pix = _setup()
    key = jax.random.key(3)
    a = np.asarray(_render_fast(scene, camera, pix, cfg, 2, jnp.int32(0), key, 512))
    b = np.asarray(_render_fast(scene, camera, pix, cfg, 2, jnp.int32(0), key, 4096))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fast_path_with_defocus_camera():
    camera = scenes.cam2(16, 12)
    scene = scenes.cover_scene(2, 2, camera, z=-0.2, seed=1)
    cfg = RenderConfig(width=16, height=12, max_depth=6)
    pix = jnp.arange(16 * 12, dtype=jnp.int32)
    img = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 2, jnp.int32(0), jax.random.key(0))
    )
    assert np.all(np.isfinite(img))
    assert img.max() > 0.0


def test_generic_fallback_for_bvh_scene():
    """Scenes with a BVH must route to the generic path and still render."""
    from rt_tpu.scene import SceneBuilder

    b = SceneBuilder()
    m = b.lambertian_rgb(0.6, 0.6, 0.6)
    rng_ = np.random.default_rng(0)
    for _ in range(40):
        c = rng_.uniform(-3, 3, 3)
        b.add_sphere(c, 0.3, m)
    scene = b.build(use_bvh=True)
    assert scene.bvh is not None
    camera = scenes.cam1(12, 8)
    cfg = RenderConfig(width=12, height=8, max_depth=4)
    pix = jnp.arange(12 * 8, dtype=jnp.int32)
    img = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 2, jnp.int32(0), jax.random.key(0))
    )
    assert np.all(np.isfinite(img))
