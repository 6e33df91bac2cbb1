"""Interpret-mode parity for the flat TPU hot-path kernels (VERDICT item:
`prim_nearest_packed` and `prim_nearest_shaded` are what the bench runs on
TPU, so both must be pinned against the XLA reference off-TPU).

Oracle: fast_shade.sphere_nearest_rows / triangle_nearest_rows (the
scalarized XLA fallback the CPU wavefront actually uses, themselves tested
against the readable geometry module)."""

import numpy as np
import jax.numpy as jnp

from rt_tpu import fast_shade, scenes
from rt_tpu.config import CompatConfig, RenderConfig
from rt_tpu.pallas_ops import prim_nearest_packed, prim_nearest_shaded


def _scene_and_rays(rng, n=512):
    camera = scenes.cam1(32, 24)
    scene = scenes.cover_scene(3, 3, camera, z=-0.2, seed=0)
    assert scene.num_triangles > 0  # ground plane triangles exercised
    org = rng.uniform(-3, 3, (3, n)).astype(np.float32)
    dirn = rng.normal(size=(3, n)).astype(np.float32)
    rays = np.zeros((8, n), np.float32)
    rays[0:3] = org
    rays[3:6] = dirn
    return scene, jnp.asarray(rays)


def _oracle(scene, rays, t_min, t_max, compat):
    t_s, i_s = fast_shade.sphere_nearest_rows(scene, rays, t_min, t_max)
    t_t, i_t = fast_shade.triangle_nearest_rows(scene, rays, t_min, t_max, compat)
    tri_better = t_t < t_s
    t_best = jnp.where(tri_better, t_t, t_s)
    prim = jnp.where(tri_better, i_t + scene.num_spheres, i_s)
    prim = jnp.where(t_best < fast_shade.BIG, prim, -1)
    return np.asarray(t_best), np.asarray(prim)


def test_prim_nearest_packed_matches_rows(rng):
    scene, rays = _scene_and_rays(rng)
    compat = CompatConfig()
    t_k, i_k = prim_nearest_packed(
        rays, scene.sph_packed, scene.tri_packed, scene.num_spheres,
        1e-3, 3.0e38, compat.triangle_backface_cull, interpret=True,
    )
    want_t, want_i = _oracle(scene, rays, 1e-3, 3.0e38, compat)
    t_k, i_k = np.asarray(t_k), np.asarray(i_k)
    miss = want_t >= 1e30
    np.testing.assert_allclose(t_k[~miss], want_t[~miss], rtol=5e-4, atol=5e-4)
    assert np.all(i_k[miss] == -1)
    # Winners may differ only at near-ties: their t values must agree.
    diff = (i_k != want_i) & ~miss
    assert diff.mean() < 0.01


def test_prim_nearest_packed_no_cull(rng):
    scene, rays = _scene_and_rays(rng)
    compat = CompatConfig(triangle_backface_cull=False)
    t_k, i_k = prim_nearest_packed(
        rays, scene.sph_packed, scene.tri_packed, scene.num_spheres,
        1e-3, 3.0e38, False, interpret=True,
    )
    want_t, want_i = _oracle(scene, rays, 1e-3, 3.0e38, compat)
    miss = want_t >= 1e30
    np.testing.assert_allclose(
        np.asarray(t_k)[~miss], want_t[~miss], rtol=5e-4, atol=5e-4
    )


def test_prim_nearest_shaded_params_match_fetch(rng):
    """The in-kernel one-hot shade fetch must equal fast_shade.fetch_params
    on the winning ids."""
    scene, rays = _scene_and_rays(rng)
    t_k, i_k, params = prim_nearest_shaded(
        rays, scene.sph_packed, scene.tri_packed, scene.shade_table,
        scene.num_spheres, 1e-3, 3.0e38, True, interpret=True,
    )
    hit = np.asarray(i_k) >= 0
    want = np.asarray(
        fast_shade.fetch_params(
            scene.shade_table, jnp.maximum(jnp.asarray(i_k), 0)
        )
    )
    got = np.asarray(params)
    np.testing.assert_allclose(got[:, hit], want[:, hit], rtol=1e-5, atol=1e-5)
    # t/idx outputs equal the plain packed kernel's.
    t_p, i_p = prim_nearest_packed(
        rays, scene.sph_packed, scene.tri_packed, scene.num_spheres,
        1e-3, 3.0e38, True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_p))
    np.testing.assert_array_equal(np.asarray(t_k), np.asarray(t_p))
