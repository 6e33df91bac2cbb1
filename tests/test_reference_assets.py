"""Optional tests against the reference's real texture assets.

The reference repo (read-only at /root/reference) embeds its textures via
include_bytes! (scenes.rs:150-153).  rt_tpu loads the same files through
``texture_dir`` at runtime — these tests run only where that checkout
exists and prove the real-asset path (PNG/JPEG/WebP decode -> atlas ->
sphere UV mapping) works end to end.
"""

import os

import numpy as np
import pytest

REF_TEXTURES = "/root/reference/src/assets/textures"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TEXTURES), reason="reference assets not available"
)


def test_load_reference_textures():
    from rt_tpu.io.png_io import load_image

    for name in ("earth.png", "mars.jpg", "moon_hires.jpg", "saul.webp"):
        img = load_image(os.path.join(REF_TEXTURES, name))
        assert img.ndim == 3 and img.shape[2] == 3
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert img.shape[0] > 16 and img.shape[1] > 16


def test_earth_scene_with_reference_texture():
    import jax
    from rt_tpu import scenes
    from rt_tpu.config import RenderConfig
    from rt_tpu.render import render_pixel_colors

    scene = scenes.earth_scene(texture_dir=REF_TEXTURES)
    assert scene.has_image_textures
    camera = scenes.widecam(48, 27)
    cfg = RenderConfig(width=48, height=27, samples_per_pixel=2, max_depth=4)
    img = np.asarray(render_pixel_colors(scene, camera, cfg))
    assert np.isfinite(img).all()
    # The earth ball must be visible and not monochrome (texture varies).
    assert img.std() > 0.02


def test_cover_scene_with_reference_saul():
    from rt_tpu import scenes

    camera = scenes.cam1(32, 18)
    scene = scenes.cover_scene(2, 2, camera, seed=0, texture_dir=REF_TEXTURES)
    assert scene.has_image_textures
    assert scene.atlas.shape[0] > 64  # real decoded webp in the atlas
