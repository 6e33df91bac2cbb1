"""Megakernel parity (interpret mode on CPU; VERDICT round-1 item 4 +
the round-2 persistent-megakernel architecture).

The megakernel must produce the same image as the generic wavefront
(_render_generic, the readable correctness reference) for every material,
texture and camera feature it supports — the two share RNG streams keyed
on the global (sample, pixel) id, so differences are limited to f32
summation order plus the kernel's polynomial transcendentals (~1e-4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import scenes
from rt_tpu.camera import make_camera
from rt_tpu.config import CompatConfig, RenderConfig
from rt_tpu.megakernel import eligible, render_megakernel
from rt_tpu.scene import SceneBuilder
from rt_tpu.sky import SkyParams
from rt_tpu.wavefront import _render_generic

W, H = 32, 24


def _camera(defocus=0.0):
    return make_camera(
        (6, 0, 2), (0, 0, 1), (0, 0, 1), focus_distance=6.0,
        defocus_angle=defocus, image_width=W, image_height=H, vertical_fov=30.0,
    )


def _compare(scene, camera, cfg, spp=2, packed=False, atol=1e-3):
    key = jax.random.key(cfg.seed)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    ref = np.asarray(
        _render_generic(scene, camera, pix, cfg, spp, jnp.int32(0), key)
    )
    got = np.asarray(
        render_megakernel(
            scene, camera, cfg, spp, 0, key,
            lanes=256, tile_pixels=256, packed_select=packed, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)


def _simple(mat_fn):
    b = SceneBuilder()
    g = b.lambertian(b.solid_color((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -1000), 1000, g)
    mat_fn(b)
    return b.build(sky=SkyParams.default())


@pytest.mark.parametrize(
    "name,mat_fn",
    [
        ("lambertian", lambda b: b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.8, 0.2, 0.1))))),
        ("metal", lambda b: b.add_sphere((0, 0, 1), 1, b.metal(b.solid_color((0.8, 0.7, 0.6)), fuzz=0.2))),
        ("dielectric", lambda b: b.add_sphere((0, 0, 1), 1, b.dielectric(1.5))),
        ("emissive", lambda b: b.add_sphere((0, 0, 1), 1, b.emissive((3.0, 2.0, 1.0)))),
        ("triangle", lambda b: b.add_triangle((-1, -1, 0.5), (2, -1, 0.5), (0, 1, 2.5), b.lambertian(b.solid_color((0.2, 0.4, 0.8))))),
    ],
)
def test_megakernel_matches_generic(name, mat_fn):
    scene = _simple(mat_fn)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=8)
    _compare(scene, _camera(), cfg)


def test_megakernel_defocus_and_packed_select():
    scene = _simple(
        lambda b: b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.7, 0.3, 0.2))))
    )
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=8)
    _compare(scene, _camera(defocus=0.6), cfg, packed=False)
    # packed id-in-mantissa winner selection truncates t by <= 2^-14 rel.
    _compare(scene, _camera(defocus=0.6), cfg, packed=True, atol=2e-3)


def test_megakernel_cover_scene_with_image_texture():
    """The bench configuration in miniature: checker ground triangles,
    glass/metal/textured big spheres, image-atlas fetch in-kernel."""
    camera = scenes.cam1(W, H)
    scene = scenes.cover_scene(4, 4, camera, z=-0.2, seed=0)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=12)
    assert eligible(scene, cfg)
    _compare(scene, camera, cfg, packed=True, atol=2e-3)


def test_megakernel_scrambled_jitter_mode():
    """shared_halton_jitter=False (the moire fix) uses the same per-pixel
    hash scramble as the wavefront."""
    scene = _simple(
        lambda b: b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.6, 0.6, 0.2))))
    )
    cfg = RenderConfig(
        width=W, height=H, samples_per_pixel=2, max_depth=8,
        compat=CompatConfig(shared_halton_jitter=False),
    )
    _compare(scene, _camera(), cfg)


def test_megakernel_quirk_sky():
    scene = _simple(
        lambda b: b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.6, 0.2, 0.6))))
    )
    scene = scene.replace(sky=scene.sky.replace(cos_gamma_as_angle=True))
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=8)
    _compare(scene, _camera(), cfg)


def test_megakernel_multi_tile_and_offsets():
    """Several grid tiles + a nonzero sample offset and pixel base."""
    scene = _simple(
        lambda b: b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.3, 0.5, 0.7))))
    )
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=8)
    camera = _camera()
    key = jax.random.key(0)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    ref = np.asarray(
        _render_generic(scene, camera, pix, cfg, 2, jnp.int32(3), key)
    )
    got = np.asarray(
        render_megakernel(
            scene, camera, cfg, 2, 3, key,
            lanes=256, tile_pixels=256, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
    # Half-frame render with pixel_base: rows H/2.. of the full frame.
    half = W * H // 2
    got2 = np.asarray(
        render_megakernel(
            scene, camera, cfg, 2, 3, key,
            pixel_base=half, n_pixels=half,
            lanes=256, tile_pixels=256, interpret=True,
        )
    )
    np.testing.assert_allclose(got2, ref[half:], atol=1e-3, rtol=1e-3)


def test_megakernel_hosek_sky():
    from rt_tpu.sky import SkyParams

    scene = _simple(
        lambda b: b.add_sphere((0, 0, 1), 1, b.lambertian(b.solid_color((0.5, 0.4, 0.3))))
    )
    scene = scene.replace(sky=SkyParams.hosek_reference())
    assert eligible(scene, RenderConfig())
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=2, max_depth=8)
    _compare(scene, _camera(), cfg)
