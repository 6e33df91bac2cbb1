import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu import sampling
from tests import oracles


def test_halton_matches_reference_generator():
    """The closed-form radical inverse must equal the reference's iterative
    generator (camera.rs:140-165) for both bases, over a long prefix."""
    n = 4096
    idx = jnp.arange(n, dtype=jnp.uint32)
    got2, got3 = sampling.halton_pair(idx)
    want2 = np.array(oracles.halton_sequence(2, n))
    want3 = np.array(oracles.halton_sequence(3, n))
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got3), want3, atol=1e-6)


def test_halton_first_values():
    got2, got3 = sampling.halton_pair(jnp.arange(4, dtype=jnp.uint32))
    np.testing.assert_allclose(np.asarray(got2), [0.5, 0.25, 0.75, 0.125], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got3), [1 / 3, 2 / 3, 1 / 9, 4 / 9], atol=1e-6
    )


def test_random_unit_is_unit_and_biased_like_reference(rng):
    key = jax.random.key(0)
    v = np.asarray(sampling.random_unit(key, (20000,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # The cube-corner bias of normalize(uniform cube) (vec3.rs:118-120):
    # diagonal directions are over-represented vs a true uniform sphere.
    # |x|+|y|+|z| has mean ~1.48 for uniform sphere; higher for cube-normalized.
    l1 = np.abs(v).sum(axis=-1).mean()
    assert l1 > 1.49, l1


def test_random_in_unit_disc():
    key = jax.random.key(1)
    v = np.asarray(sampling.random_in_unit_disc(key, (20000,)))
    r = np.linalg.norm(v[:, :2], axis=-1)
    assert np.all(v[:, 2] == 0.0)
    assert np.all(r <= 1.0 + 1e-6)
    # Uniform-in-disc => mean radius 2/3.
    assert abs(r.mean() - 2 / 3) < 0.01


def test_random_on_hemisphere():
    key = jax.random.key(2)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (1000, 1))
    v = np.asarray(sampling.random_on_hemisphere(key, n))
    assert np.all(v[:, 2] >= 0.0)


def test_keys_are_deterministic():
    k = jax.random.key(7)
    a = sampling.ray_key(k, jnp.arange(4), jnp.zeros(4, jnp.int32))
    b = sampling.ray_key(k, jnp.arange(4), jnp.zeros(4, jnp.int32))
    assert jnp.array_equal(jax.random.key_data(a), jax.random.key_data(b))
