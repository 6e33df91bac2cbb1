import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import sky as sky_mod
from rt_tpu.config import RenderConfig
from rt_tpu.integrator import trace_radiance, trace_radiance_diff
from rt_tpu.scene import SceneBuilder

CFG = RenderConfig(max_depth=16, diff_max_depth=6)


def _empty_scene():
    b = SceneBuilder()
    b.lambertian_rgb(0.5, 0.5, 0.5)
    return b.build(use_bvh=False)


def test_miss_returns_sky():
    scene = _empty_scene()
    dirn = jnp.asarray([[0.2, 0.1, 0.7]], jnp.float32)
    org = jnp.zeros((1, 3), jnp.float32)
    got = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(0), CFG))[0]
    unit = np.asarray(dirn[0]) / np.linalg.norm(dirn[0])
    want = np.asarray(sky_mod.sky_color_toward(scene.sky, jnp.asarray(unit)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_black_absorber_gives_black():
    """p = max(attenuation) = 0 => Russian roulette kills immediately
    (gen_bool(0) is always false, camera.rs:288)."""
    b = SceneBuilder()
    m = b.lambertian_rgb(0.0, 0.0, 0.0)
    b.add_sphere((0, 0, 3), 1.0, m)
    scene = b.build(use_bvh=False)
    org = jnp.zeros((4, 3), jnp.float32)
    dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
    got = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(0), CFG))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_mirror_sees_sky_behind():
    """A perfect metal mirror at normal incidence returns the sky color of
    the reversed direction, scaled by attenuation (deterministic path)."""
    b = SceneBuilder()
    m = b.metal_solid((0.7, 0.6, 0.5), None)
    b.add_sphere((0, 0, 3), 1.0, m)
    scene = b.build(use_bvh=False)
    org = jnp.zeros((1, 3), jnp.float32)
    dirn = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    got = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(0), CFG))[0]
    # Reflected ray goes straight back (-z); RR survives with p = 0.7 and
    # scales 1/0.7, so radiance = (0.7,0.6,0.5)/0.7 * sky(-z) when it
    # survives, else 0.  With attenuation p=0.7, over many keys the mean is
    # atten * sky.  Deterministically per key it is one of the two.
    sky_back = np.asarray(
        sky_mod.sky_color_toward(scene.sky, jnp.asarray([0.0, 0.0, -1.0]))
    )
    option_a = np.array([0.7, 0.6, 0.5]) / 0.7 * sky_back
    assert np.allclose(got, option_a, rtol=1e-4, atol=1e-5) or np.allclose(got, 0.0)


def test_russian_roulette_unbiased():
    """Mean over many rays of the mirror scene equals atten * sky."""
    b = SceneBuilder()
    m = b.metal_solid((0.7, 0.6, 0.5), None)
    b.add_sphere((0, 0, 3), 1.0, m)
    scene = b.build(use_bvh=False)
    n = 8192
    org = jnp.zeros((n, 3), jnp.float32)
    dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    got = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(7), CFG)).mean(0)
    sky_back = np.asarray(
        sky_mod.sky_color_toward(scene.sky, jnp.asarray([0.0, 0.0, -1.0]))
    )
    want = np.array([0.7, 0.6, 0.5]) * sky_back
    np.testing.assert_allclose(got, want, rtol=0.05, atol=1e-4)


def test_max_depth_zero_hits_are_black():
    """With max_depth=0, any hit is absorbed (depth < max_depth fails,
    camera.rs:300) while misses still see the sky."""
    b = SceneBuilder()
    m = b.metal_solid((1.0, 1.0, 1.0), None)
    b.add_sphere((0, 0, 3), 1.0, m)
    scene = b.build(use_bvh=False)
    cfg = CFG.replace(max_depth=0)
    org = jnp.zeros((2, 3), jnp.float32)
    dirn = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], jnp.float32)
    got = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(0), cfg))
    np.testing.assert_allclose(got[0], 0.0, atol=1e-7)  # hit -> black
    assert got[1].max() > 0.0  # miss -> sky


def test_diff_trace_close_to_forward_trace():
    """The scan-based differentiable integrator must agree with the
    while_loop integrator when depth suffices (same keys, same math)."""
    b = SceneBuilder()
    m = b.lambertian_rgb(0.8, 0.6, 0.4)
    b.add_sphere((0, 0, 3), 1.0, m)
    scene = b.build(use_bvh=False)
    n = 64
    org = jnp.zeros((n, 3), jnp.float32)
    dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    cfg = CFG.replace(max_depth=6, diff_max_depth=6)
    a = np.asarray(trace_radiance(scene, org, dirn, jax.random.key(3), cfg))
    b_ = np.asarray(trace_radiance_diff(scene, org, dirn, jax.random.key(3), cfg))
    np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


def test_gradient_flows_to_albedo():
    b = SceneBuilder()
    m = b.lambertian_rgb(0.8, 0.6, 0.4)
    b.add_sphere((0, 0, 3), 1.0, m)
    scene = b.build(use_bvh=False)
    n = 128
    org = jnp.zeros((n, 3), jnp.float32)
    dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))

    def loss(tex_color):
        s = scene.replace(tex_color=tex_color)
        r = trace_radiance_diff(s, org, dirn, jax.random.key(0), CFG)
        return jnp.mean(r)

    g = jax.grad(loss)(scene.tex_color)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0
