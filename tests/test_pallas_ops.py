"""Pallas kernel parity vs the XLA brute-force reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp

from rt_tpu import geometry
from rt_tpu.pallas_ops import sphere_nearest


def test_sphere_nearest_matches_bruteforce(rng):
    n, s = 300, 37  # deliberately non-multiples of the tile sizes
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    dirn = rng.normal(size=(n, 3)).astype(np.float32)
    centers = rng.uniform(-4, 4, (s, 3)).astype(np.float32)
    radius = rng.uniform(0.2, 1.5, (s,)).astype(np.float32)

    t_k, i_k = sphere_nearest(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(centers), jnp.asarray(radius),
        1e-3, 1e9, interpret=True,
    )
    ts = geometry.sphere_candidate_t(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(centers), jnp.asarray(radius), 1e-3, 1e9
    )
    want_i = np.asarray(jnp.argmin(ts, axis=-1))
    want_t = np.asarray(jnp.min(ts, axis=-1))
    miss = want_t >= 1e30

    t_k, i_k = np.asarray(t_k), np.asarray(i_k)
    # The kernel computes |oc|^2 - r^2 directly (well-conditioned); the XLA
    # path expands it through matmuls (|c|^2 - 2 o.c + |o|^2, cancellation-
    # prone) — so values agree only to ~1e-4 relative, and near-ties may
    # pick different spheres.  Compare t loosely and ids via their t.
    np.testing.assert_allclose(t_k[~miss], want_t[~miss], rtol=5e-4, atol=5e-4)
    ts_np = np.asarray(ts)
    chosen_t = ts_np[np.arange(n), np.clip(i_k, 0, s - 1)]
    np.testing.assert_allclose(chosen_t[~miss], want_t[~miss], rtol=5e-4, atol=5e-4)
    assert np.all(i_k[miss] == -1)
    assert np.all(t_k[miss] >= 1e30)


def test_sphere_nearest_zero_radius_padding(rng):
    """Padded/degenerate spheres (r=0) must never win."""
    org = np.zeros((4, 3), np.float32)
    dirn = np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1))
    centers = np.array([[0, 0, 2.0], [0, 0, 1.0]], np.float32)
    radius = np.array([0.5, 0.0], np.float32)
    t, i = sphere_nearest(
        jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(centers), jnp.asarray(radius),
        1e-3, 1e9, interpret=True,
    )
    assert np.all(np.asarray(i) == 0)
    np.testing.assert_allclose(np.asarray(t), 1.5, rtol=1e-6)
