"""Gradient correctness: reverse-mode vs finite differences on material /
sky parameters (SURVEY.md §4, BASELINE.json gradient metric)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import grad as grad_mod
from rt_tpu import scenes
from rt_tpu.config import CompatConfig, RenderConfig
from rt_tpu.scene import SceneBuilder


@pytest.fixture(scope="module")
def setup():
    b = SceneBuilder()
    lam = b.lambertian_rgb(0.8, 0.5, 0.3)
    metal = b.metal_solid((0.7, 0.6, 0.5), 0.1)
    glass = b.dielectric(1.5)
    # Bright procedural image so rr_clamp=0.6 still pins survival.
    img = np.linspace(0.6, 1.0, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    textured = b.lambertian(b.image_texture(img))
    # In cam1's field of view (it looks at the origin from (3,-5,0.6)).
    b.add_sphere((-0.6, 0.4, 0.0), 0.7, lam)
    b.add_sphere((0.7, -0.3, 0.1), 0.6, metal)
    b.add_sphere((1.4, -1.5, 0.2), 0.5, glass)
    b.add_sphere((-1.3, -0.9, 0.0), 0.5, textured)
    scene = b.build(use_bvh=False)
    camera = scenes.cam1(24, 16)
    # Per-sample FD checking needs the sampling *decisions* to be constant
    # under parameter bumps: rr_clamp=0.6 pins the Russian-roulette
    # probability to 0.6 (every material's max attenuation channel is
    # >= 0.6 here), so survival is parameter-independent and, with frozen
    # keys, the per-sample loss is a smooth function of the parameters.
    # detach_sampling=False differentiates through the (now constant) 1/p.
    cfg = RenderConfig(
        width=24,
        height=16,
        diff_max_depth=4,
        detach_sampling=False,
        compat=CompatConfig(rr_clamp=0.6),
    )
    pixel_idx = jnp.arange(24 * 16, dtype=jnp.int32)
    key = jax.random.key(0)
    target = jnp.zeros((24 * 16, 3), jnp.float32)
    return scene, camera, cfg, pixel_idx, target, key


def _loss_fn(setup_vals):
    scene, camera, cfg, pixel_idx, target, key = setup_vals

    def loss(p):
        return grad_mod.pixel_loss(p, scene, camera, cfg, pixel_idx, target, key, spp=2)

    return loss


@pytest.mark.parametrize(
    "leaf,index,eps,tol",
    [
        ("tex_color", (0, 0), 1e-2, 0.08),  # lambertian albedo R
        ("tex_color", (1, 1), 1e-2, 0.08),  # metal albedo G
        ("sky_exposure", (), 1e-2, 0.08),
        ("sky_turbidity", (), 1e-2, 0.12),
        # VERDICT round-1 item 6: every SceneParams leaf FD-validated.
        # fuzz/IOR flow through the detached-decision machinery; with
        # frozen keys their per-sample losses are smooth except for the
        # measure-small reflect/refract threshold flips, hence the wider
        # tolerances and smaller IOR step.
        ("mat_fuzz", (1,), 1e-2, 0.15),  # metal fuzz
        # IOR step 1e-4: under the fast-shade diff path's draw stream a
        # reflect/refract Schlick flip straddles the 1e-3 window (FD then
        # measures the jump, not the derivative); FD converges to AD by
        # 1e-4 (checked at 1e-5 too).
        ("mat_ior", (2,), 1e-4, 0.20),  # dielectric refractive index
        ("sky_sun_direction", (0,), 1e-2, 0.12),
    ],
)
def test_grad_matches_finite_difference(setup, leaf, index, eps, tol):
    loss = _loss_fn(setup)
    params = grad_mod.get_params(setup[0])
    g = jax.grad(loss)(params)
    ad = float(getattr(g, leaf)[index]) if index != () else float(getattr(g, leaf))
    fd = grad_mod.finite_difference_grad(loss, params, leaf, index, eps)
    # Same RNG keys on both sides of the difference -> correlated estimator;
    # agreement should be tight relative to magnitude.  Both sides must be
    # nonzero or the comparison is vacuous.
    assert abs(fd) > 1e-6, (leaf, index, "FD gradient vanished — scene bug?")
    scale = max(abs(ad), abs(fd), 1e-4)
    assert abs(ad - fd) / scale < tol, (leaf, index, ad, fd)


def test_grad_atlas_matches_finite_difference(setup):
    """FD-check the atlas texel that AD says matters most (an arbitrary
    fixed texel might never be sampled)."""
    loss = _loss_fn(setup)
    params = grad_mod.get_params(setup[0])
    g = jax.grad(loss)(params)
    ga = np.asarray(g.atlas)
    assert np.abs(ga).max() > 0.0, "no atlas gradient — textured sphere unhit?"
    idx = np.unravel_index(np.argmax(np.abs(ga)), ga.shape)
    ad = float(ga[idx])
    fd = grad_mod.finite_difference_grad(loss, params, "atlas", idx, 1e-2)
    scale = max(abs(ad), abs(fd), 1e-4)
    assert abs(ad - fd) / scale < 0.1, (idx, ad, fd)


def test_pixel_grad_api(setup):
    scene, camera, cfg, pixel_idx, target, key = setup
    loss, grads = grad_mod.pixel_grad(scene, camera, cfg, pixel_idx, target, key, spp=1)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert float(jnp.abs(grads.tex_color).max()) > 0.0


def test_set_get_params_roundtrip(setup):
    scene = setup[0]
    p = grad_mod.get_params(scene)
    scene2 = grad_mod.set_params(scene, p)
    np.testing.assert_array_equal(np.asarray(scene2.tex_color), np.asarray(scene.tex_color))
    np.testing.assert_array_equal(
        np.asarray(scene2.sky.sun_direction), np.asarray(scene.sky.sun_direction)
    )
