"""Hosek-Wilkie sky mode: tint parity against the reference's own golden
render (VERDICT round-1 missing item 1).

The reference evaluates hw-skymodel with gamma = dot(dir, sun) (the
cos-as-angle quirk) and sun = +z, so its sky is a 1-D function of theta;
HW_REFERENCE_FIT reproduces that curve (fitted by tools/fit_hw_sky.py over
the pure-sky band of /root/reference/images/final_render.png).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import scenes
from rt_tpu import sky as sky_mod
from rt_tpu.color import to_u8_gamma
from rt_tpu.config import RenderConfig
from rt_tpu.sky import SkyParams, sky_color_toward

REF_IMG = "/root/reference/images/final_render.png"


def test_hosek_dispatch_and_shapes():
    p = SkyParams.hosek_reference()
    dirs = jnp.asarray(
        [[0.0, 0.0, 1.0], [0.8, 0.0, 0.6], [0.99, 0.0, 0.14]], jnp.float32
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = np.asarray(sky_color_toward(p, dirs))
    assert rgb.shape == (3, 3)
    assert np.all(np.isfinite(rgb)) and np.all(rgb >= 0.0)
    # Near-horizon reference sky is brighter in blue than red.
    assert rgb[2, 2] > rgb[2, 0]


def test_hosek_gradients_flow():
    p = SkyParams.hosek_reference()
    d = jnp.asarray([0.6, 0.0, 0.8], jnp.float32)

    def lum(hw):
        return jnp.sum(sky_color_toward(p.replace(hw_params=hw), d))

    g = jax.grad(lum)(p.hw_params)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


@pytest.mark.skipif(not os.path.exists(REF_IMG), reason="reference not mounted")
def test_hosek_tint_matches_reference_render_top_rows():
    """Render the sky through rt_tpu's display pipeline along the exact
    pixel directions of the reference's 1920x1080 golden render and compare
    u8 values on the pure-sky band."""
    from PIL import Image

    img = np.asarray(Image.open(REF_IMG).convert("RGB"), np.float32)
    h, w, _ = img.shape
    camera = scenes.cam1(w, h)
    rows = np.arange(0, 30)
    cols = np.arange(0, w, 37)
    ys, xs = np.meshgrid(rows, cols, indexing="ij")
    p00 = np.asarray(camera.pixel00_loc)
    du = np.asarray(camera.pixel_du)
    dv = np.asarray(camera.pixel_dv)
    ctr = np.asarray(camera.center)
    dirs = p00 + xs[..., None] * du + ys[..., None] * dv - ctr
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    p = SkyParams.hosek_reference()
    rgb = sky_color_toward(p, jnp.asarray(dirs.reshape(-1, 3), jnp.float32))
    got = np.asarray(to_u8_gamma(rgb), np.float32)
    want = img[ys, xs].reshape(-1, 3)
    diff = np.abs(got - want)
    # Display-pipeline tint parity: within ~1 quantization step on average.
    assert diff.mean() < 1.5, diff.mean()
    assert (diff > 6).mean() < 0.01


def test_hosek_scene_renders_and_perez_still_default():
    b_scene = scenes.gen_checkered()
    assert b_scene.sky.hw_params is None  # Perez remains the default
    hs = b_scene.replace(sky=SkyParams.hosek_reference())
    from rt_tpu.render import render_pixel_colors

    from rt_tpu.camera import make_camera

    cam = make_camera(
        (35.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
        focus_distance=35.0, defocus_angle=0.0,
        image_width=32, image_height=18, vertical_fov=40.0,
    )
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=2, max_depth=4)
    img = np.asarray(render_pixel_colors(hs, cam, cfg))
    assert np.all(np.isfinite(img)) and img.max() > 0.1


# ---------------------------------------------------------------------------
# Dataset interpolation (hosek_config): the live (turbidity, albedo,
# elevation) knobs the hw-skymodel crate exposes (hittable.rs:84-93).
# The dataset is GENERATED (tools/gen_hw_dataset.py) — validation targets
# are stored alongside it.
# ---------------------------------------------------------------------------


def test_hosek_config_shape_and_finite():
    hw = sky_mod.hosek_config(3.0, 0.2, 0.5)
    assert hw.shape == (3, 10)
    assert np.all(np.isfinite(np.asarray(hw)))


def test_hosek_config_matches_dataset_validation_targets():
    """Interpolated radiance tracks the generator's ground truth at the
    stored validation rows (the 'published sample values' analog for a
    generated dataset): <= 12% mean relative error per (T, eta, albedo)."""
    ds = sky_mod._hw_dataset()
    rows = ds["samples"]  # T, eta, albedo, cos_theta, gamma, _, _
    targets = ds["targets"]
    configs = {}
    for (T, eta, alb, ct, ga, _, _), tgt in zip(rows, targets):
        configs.setdefault((float(T), float(eta), float(alb)), []).append(
            (ct, ga, tgt)
        )
    assert len(configs) >= 3
    for (T, eta, alb), pts in configs.items():
        hw = sky_mod.hosek_config(T, alb, eta)
        ct = jnp.asarray([p[0] for p in pts])
        ga = jnp.asarray([p[1] for p in pts])
        r, g, b = sky_mod.hosek_radiance_rgb(hw, ct, ga, jnp.cos(ga))
        pred = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
        tgt = np.stack([p[2] for p in pts])
        rel = np.abs(pred - tgt) / (np.abs(tgt) + 1e-2)
        assert rel.mean() < 0.12, ((T, eta, alb), rel.mean())


def test_hosek_config_knobs_are_live_and_differentiable():
    eta = 0.7
    base = np.asarray(sky_mod.hosek_config(2.0, 0.0, eta))
    hi_t = np.asarray(sky_mod.hosek_config(8.0, 0.0, eta))
    hi_a = np.asarray(sky_mod.hosek_config(2.0, 1.0, eta))
    assert not np.allclose(base, hi_t)  # turbidity knob live
    assert not np.allclose(base, hi_a)  # albedo knob live

    d = jnp.asarray([[0.3, 0.1, 0.95], [0.8, 0.0, 0.6]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def mean_rad(t):
        p = sky_mod.SkyParams.hosek(turbidity=t, albedo=0.3, elevation=0.9)
        return jnp.mean(sky_mod.sky_radiance_rgb(p, d))

    g = jax.grad(mean_rad)(jnp.asarray(4.3, jnp.float32))
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0


def test_hosek_config_continuous_at_knots():
    """Piecewise-linear interpolation has no jumps at grid knots."""
    ds = sky_mod._hw_dataset()
    knots = ds["knots"]
    eta_k = float(knots[4])
    lo = np.asarray(sky_mod.hosek_config(4.0, 0.5, eta_k - 1e-4))
    hi = np.asarray(sky_mod.hosek_config(4.0, 0.5, eta_k + 1e-4))
    assert np.allclose(lo, hi, atol=5e-3)
    lo = np.asarray(sky_mod.hosek_config(4.0 - 1e-4, 0.5, 0.6))
    hi = np.asarray(sky_mod.hosek_config(4.0 + 1e-4, 0.5, 0.6))
    assert np.allclose(lo, hi, atol=5e-3)


def test_hosek_scene_with_live_config_renders():
    from rt_tpu.camera import make_camera
    from rt_tpu.render import render_pixel_colors

    b_scene = scenes.gen_checkered()
    hs = b_scene.replace(
        sky=sky_mod.SkyParams.hosek(turbidity=5.0, albedo=0.4, elevation=0.6)
    )
    cam = make_camera(
        (35.0, 2.0, 3.0), (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
        focus_distance=35.0, defocus_angle=0.0,
        image_width=32, image_height=18, vertical_fov=40.0,
    )
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=2, max_depth=4)
    img = np.asarray(render_pixel_colors(hs, cam, cfg))
    assert np.all(np.isfinite(img)) and img.max() > 0.05
