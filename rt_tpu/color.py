"""Color pipeline: gamma correction, u8 quantization, Uncharted2 tonemap.

Reference behavior being matched:
- gamma 1/2.2 correction (vec3.rs:39-42)
- u8 quantization by round(c * 255) (vec3.rs:64-68); the reference *panics*
  on out-of-range colors (vec3.rs:44-63) — rt_tpu clamps instead (validated
  pipelines must never crash the device program).
- Uncharted2 filmic tonemap with A=.15 B=.50 C=.10 D=.20 E=.02 F=.30,
  exposure_bias=1.1, white point 11.2 (hittable.rs:51-79), applied to sky
  radiance only (hittable.rs:84-93).

All functions are jittable, vectorized over leading dims, f32, and
differentiable (the tonemap feeds sky-parameter gradients).
"""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 1.0 / 2.2

# Uncharted2 constants (hittable.rs:52-58).
_U2_A = 0.15
_U2_B = 0.50
_U2_C = 0.10
_U2_D = 0.20
_U2_E = 0.02
_U2_F = 0.30
_U2_EXPOSURE_BIAS = 1.1  # hittable.rs:72
_U2_WHITE = 11.2  # hittable.rs:76


def linear_to_gamma(color: jnp.ndarray) -> jnp.ndarray:
    """Gamma-correct linear color: c ** (1/2.2) (vec3.rs:39-42)."""
    return jnp.power(jnp.maximum(color, 0.0), GAMMA)


def to_u8(color: jnp.ndarray) -> jnp.ndarray:
    """Quantize [0,1] linear values to u8 by rounding (vec3.rs:64-68).

    Divergence from reference: out-of-range values are clamped, not panicked
    on (vec3.rs:46-63 panics).
    """
    c = jnp.clip(color, 0.0, 1.0)
    return jnp.round(c * 255.0).astype(jnp.uint8)


def to_u8_gamma(color: jnp.ndarray) -> jnp.ndarray:
    """Gamma-correct then quantize (vec3.rs:71-97)."""
    return to_u8(linear_to_gamma(color))


def uncharted2_tonemap(x: jnp.ndarray) -> jnp.ndarray:
    """The Uncharted2 curve applied per channel (hittable.rs:51-66)."""
    a, b, c, d, e, f = _U2_A, _U2_B, _U2_C, _U2_D, _U2_E, _U2_F
    numerator = x * (a * x + c * b) + d * e
    denominator = x * (a * x + b) + d * f
    return numerator / denominator - e / f


def uncharted2(x: jnp.ndarray) -> jnp.ndarray:
    """Exposure-biased Uncharted2 with white-point normalization
    (hittable.rs:70-79)."""
    curr = uncharted2_tonemap(_U2_EXPOSURE_BIAS * x)
    white_scale = 1.0 / uncharted2_tonemap(jnp.full((3,), _U2_WHITE, x.dtype))
    return white_scale * curr
