"""Emissive area lights (rt_tpu extension; MAT_EMISSIVE)."""

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.integrator import trace_radiance, trace_radiance_diff
from rt_tpu.render import render_pixel_colors
from rt_tpu.scene import SceneBuilder
from rt_tpu.wavefront import _render_fast, _render_generic

CFG = RenderConfig(max_depth=8, diff_max_depth=4)


def _panel_scene(radiance=(5.0, 4.0, 3.0)):
    b = SceneBuilder()
    light = b.emissive(radiance)
    # Panel at z=3 facing -z (toward the origin).
    b.add_triangle((-2, -2, 3), (0, 2, 3), (2, -2, 3), light)
    return b.build(use_bvh=False)


def test_emissive_direct_hit_returns_radiance():
    scene = _panel_scene()
    org = jnp.zeros((4, 3), jnp.float32)
    dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
    got = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(0), CFG))
    np.testing.assert_allclose(got, np.tile([5.0, 4.0, 3.0], (4, 1)), rtol=1e-5)


def test_emissive_terminates_path():
    """Radiance must be exactly emit * throughput — no sky double count."""
    scene = _panel_scene((2.0, 2.0, 2.0))
    org = jnp.zeros((1, 3), jnp.float32)
    dirn = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    a = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(1), CFG))[0]
    b = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(2), CFG))[0]
    np.testing.assert_allclose(a, b)  # deterministic: no RNG on the path
    np.testing.assert_allclose(a, 2.0, rtol=1e-6)


def test_emissive_illuminates_diffuse():
    """A lambertian floor under a bright panel in a dark-ish sky direction
    should pick up light via bounce paths (wavefront paths)."""
    b = SceneBuilder()
    light = b.emissive((30.0, 30.0, 30.0))
    b.add_triangle((-3, -3, 2.5), (0, 3, 2.5), (3, -3, 2.5), light)
    lam = b.lambertian_rgb(0.8, 0.8, 0.8)
    b.add_triangle((-5, -5, 0.0), (5, -5, 0.0), (0, 5, 0.0), lam)
    scene = b.build(use_bvh=False)
    # Look down at the floor from between floor and panel.
    from rt_tpu.camera import make_camera

    cam = make_camera((0, -1.5, 1.2), (0, 0, 0), (0, 0, 1),
                      focus_distance=2.0, defocus_angle=0.0,
                      image_width=24, image_height=16, vertical_fov=60.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=16, max_depth=6)
    img = np.asarray(render_pixel_colors(scene, cam, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.3  # lit well beyond sky-only levels


def test_emissive_fast_matches_generic():
    scene = _panel_scene((3.0, 2.0, 1.0))
    from rt_tpu import scenes as sc

    cam = sc.cam1(16, 12)
    pix = jnp.arange(16 * 12, dtype=jnp.int32)
    cfg = RenderConfig(width=16, height=12, max_depth=6)
    key = jax.random.key(0)
    fast = np.asarray(_render_fast(scene, cam, pix, cfg, 2, jnp.int32(0), key))
    gen = np.asarray(_render_generic(scene, cam, pix, cfg, 2, jnp.int32(0), key))
    np.testing.assert_allclose(fast, gen, rtol=1e-3, atol=1e-3)


def test_emissive_gradient_flows_to_radiance():
    scene = _panel_scene((5.0, 4.0, 3.0))
    org = jnp.zeros((8, 3), jnp.float32)
    dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8, 1))

    def loss(tex_color):
        s = scene.replace(tex_color=tex_color)
        return jnp.mean(trace_radiance_diff(s, org, dirn, jax.random.key(0), CFG))

    g = np.asarray(jax.grad(loss)(scene.tex_color))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_mesh_with_area_light_factory(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 1\nf 1 2 3\n")
    scene = scenes.mesh_with_area_light(str(obj))
    # ground(2) + mesh(1) + panel(2)
    assert scene.num_triangles == 5
    from rt_tpu.scene import MAT_EMISSIVE

    assert (np.asarray(scene.mat_kind) == MAT_EMISSIVE).sum() == 1
