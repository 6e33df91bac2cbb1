"""Sampling: Halton low-discrepancy sequences and counter-based RNG helpers.

Reference behavior being matched / replaced:

- Halton(2,3) pair sequence, 2^20 entries precomputed at camera build and
  indexed by *sample index only* (camera.rs:140-165, 208-210, 239).  The
  reference's iterative generator emits the standard radical-inverse
  sequence starting at index 1 (first element 1/2, 1/4, 3/4, ...), so
  ``halton_pair(i)`` here equals the reference's ``rng_map[i]``.
  rt_tpu computes the radical inverse on device in closed form — no 16 MB
  host table.

- ``thread_rng`` everywhere (materials, RR, defocus: material.rs:98,112,164,
  camera.rs:288) — non-reproducible.  rt_tpu replaces it with counter-based
  ``jax.random`` (threefry) keys derived from (seed, pixel, sample, bounce),
  deterministic and replayable, which the backward pass requires.

- ``Vec3Ext::random_unit`` is normalize(uniform cube sample) — NOT uniform on
  the sphere (vec3.rs:118-120).  ``random_unit`` replicates that exact
  distribution since it shapes the reference's lambertian/fuzz lobes.

- ``random_in_unit_disc`` uses rejection sampling (vec3.rs:124-135); rt_tpu
  uses the polar transform, which yields the *same distribution* without
  data-dependent loops (rejection is hostile to SIMD/XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radical_inverse_base2(index: jnp.ndarray) -> jnp.ndarray:
    """Van der Corput sequence in base 2 via 32-bit reversal.

    ``index`` is the 1-based sequence position (index=1 -> 0.5).
    """
    i = index.astype(jnp.uint32)
    i = ((i >> 16) | (i << 16)) & jnp.uint32(0xFFFFFFFF)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    return i.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)  # 2^-32


def radical_inverse(base: int, index: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of 1-based ``index`` in integer ``base`` (static).

    Fixed-trip-count digit loop — no data-dependent control flow.  21 digits
    cover base>=3 for all uint32 indices (3^21 > 2^32).
    """
    if base == 2:
        return radical_inverse_base2(index)
    n_digits = 21
    idx = index.astype(jnp.uint32)
    inv_base = jnp.float32(1.0 / base)

    def body(_, carry):
        idx, result, scale = carry
        digit = idx % base
        return idx // base, result + digit.astype(jnp.float32) * scale, scale * inv_base

    _, result, _ = jax.lax.fori_loop(
        0, n_digits, body, (idx, jnp.zeros_like(index, jnp.float32), inv_base)
    )
    return result


def halton_pair(sample_index: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(base-2, base-3) Halton pair matching the reference's ``rng_map[i]``
    (camera.rs:208-210): 0-based ``sample_index`` maps to 1-based radical
    inverse position."""
    pos = sample_index.astype(jnp.uint32) + jnp.uint32(1)
    return radical_inverse_base2(pos), radical_inverse(3, pos)


# ---------------------------------------------------------------------------
# Counter-based RNG key discipline.
# ---------------------------------------------------------------------------


def ray_key(seed_key: jax.Array, pixel_index: jnp.ndarray, sample_index: jnp.ndarray) -> jax.Array:
    """Per-ray key derived from (seed, pixel, sample) — vectorized fold_in."""
    fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
    keys = fold(seed_key, pixel_index.astype(jnp.uint32))
    return jax.vmap(jax.random.fold_in)(keys, sample_index.astype(jnp.uint32))


def bounce_key(ray_keys: jax.Array, bounce: jnp.ndarray) -> jax.Array:
    """Fold the bounce counter into a batch of per-ray keys."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(ray_keys, bounce)


# ---------------------------------------------------------------------------
# Geometric sampling primitives (batched; key has leading batch dim via vmap
# at the call site or explicit shape argument here).
# ---------------------------------------------------------------------------


def random_unit(key: jax.Array, shape: tuple[int, ...] = ()) -> jnp.ndarray:
    """normalize(uniform([-1,1]^3)) — replicates the reference's slightly
    non-uniform sphere distribution (vec3.rs:118-120)."""
    v = jax.random.uniform(key, shape + (3,), jnp.float32, -1.0, 1.0)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, 1.0e-12)


def random_in_unit_disc(key: jax.Array, shape: tuple[int, ...] = ()) -> jnp.ndarray:
    """Uniform sample in the unit x-y disc, z=0.

    Same distribution as the reference's rejection loop (vec3.rs:124-135),
    computed by the polar transform (r = sqrt(u)) — XLA-friendly.
    """
    ku, kt = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(ku, shape, jnp.float32))
    theta = jax.random.uniform(kt, shape, jnp.float32, 0.0, 2.0 * jnp.pi)
    zeros = jnp.zeros_like(r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), zeros], axis=-1)


def random_on_hemisphere(key: jax.Array, normal: jnp.ndarray) -> jnp.ndarray:
    """Random unit vector in the hemisphere around ``normal``
    (vec3.rs:138-145; unused by the reference integrator but part of its
    public sampling surface)."""
    u = random_unit(key, normal.shape[:-1])
    sign = jnp.where(jnp.sum(u * normal, axis=-1, keepdims=True) > 0.0, 1.0, -1.0)
    return u * sign
