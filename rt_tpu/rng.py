"""Fast counter-based RNG for the render hot path.

``jax.random`` (threefry) keys are the gold standard for statistical
quality, but a per-lane ``fold_in`` chain costs ~40 bit-mixing rounds per
key and profiles at tens of milliseconds per wavefront iteration.  The hot
path instead uses a vectorized stateless integer hash (murmur3-style
finalizer over a Weyl-sequence combination of (seed, work_id, depth,
purpose, draw)), the standard construction in production renderers:

    bits = mix(seed ^ mix(work ^ mix(depth ^ mix(purpose))))

Properties that matter here and hold:
- deterministic and replayable from (seed, work_id, depth) — pool-size and
  chunking invariant, which the tests assert;
- independent streams per purpose/draw index;
- full 24-bit mantissa uniforms in [0, 1).

This is NOT a cryptographic RNG and is intentionally weaker than threefry;
the reference's own bar is ``thread_rng`` with *no* reproducibility at all
(material.rs:98,112,164).  jax.random remains in use for tests and
non-hot-path sampling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_WEYL = np.uint32(0x9E3779B9)  # golden-ratio increment


def mix(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 finalizer — full avalanche on 32 bits."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= _M1
    x ^= x >> 13
    x *= _M2
    x ^= x >> 16
    return x


def hash_u32(seed, a, b, c) -> jnp.ndarray:
    """Combine four 32-bit streams into uniform bits (vectorized over any
    broadcastable shapes; python ints accepted)."""
    as_u32 = lambda x: jnp.asarray(x).astype(jnp.uint32)
    h = mix(as_u32(seed) + _WEYL * jnp.uint32(1))
    h = mix(h ^ (as_u32(a) + _WEYL * jnp.uint32(2)))
    h = mix(h ^ (as_u32(b) + _WEYL * jnp.uint32(3)))
    h = mix(h ^ (as_u32(c) + _WEYL * jnp.uint32(4)))
    return h


def uniform(seed, a, b, c) -> jnp.ndarray:
    """Uniform f32 in [0, 1) with a full 24-bit mantissa."""
    bits = hash_u32(seed, a, b, c)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(5.9604645e-8)


def uniform3(seed, a, b, purpose) -> jnp.ndarray:
    """Three independent uniforms stacked on the last axis: f32[..., 3]."""
    p = jnp.uint32(purpose)
    return jnp.stack(
        [
            uniform(seed, a, b, p * jnp.uint32(3) + jnp.uint32(0)),
            uniform(seed, a, b, p * jnp.uint32(3) + jnp.uint32(1)),
            uniform(seed, a, b, p * jnp.uint32(3) + jnp.uint32(2)),
        ],
        axis=-1,
    )


def unit_vector(seed, a, b, purpose) -> jnp.ndarray:
    """normalize(uniform cube sample) — the reference's random_unit
    distribution (vec3.rs:118-120)."""
    v = uniform3(seed, a, b, purpose) * 2.0 - 1.0
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def in_unit_disc(seed, a, b, purpose) -> jnp.ndarray:
    """Uniform point in the unit x-y disc (polar transform), f32[..., 3]."""
    p = jnp.uint32(purpose)
    r = jnp.sqrt(uniform(seed, a, b, p * jnp.uint32(3)))
    theta = uniform(seed, a, b, p * jnp.uint32(3) + jnp.uint32(1)) * (2.0 * jnp.pi)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1)
