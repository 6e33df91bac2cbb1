import numpy as np
import jax.numpy as jnp

from rt_tpu import color
from tests import oracles


def test_uncharted2_tonemap_matches_oracle():
    x = np.linspace(0.0, 12.0, 64, dtype=np.float32).reshape(-1, 1) * np.ones(3)
    got = np.asarray(color.uncharted2_tonemap(jnp.asarray(x)))
    want = oracles.uncharted2_tonemap(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_uncharted2_matches_oracle():
    x = np.array([[0.0, 0.1, 0.5], [1.0, 2.0, 11.2], [0.01, 5.0, 0.3]], np.float32)
    got = np.asarray(color.uncharted2(jnp.asarray(x)))
    want = np.stack([oracles.uncharted2(row) for row in x.astype(np.float64)])
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_gamma_and_quantize():
    c = np.array([0.0, 0.25, 1.0], np.float32)
    g = np.asarray(color.linear_to_gamma(jnp.asarray(c)))
    np.testing.assert_allclose(g, c ** (1 / 2.2), rtol=1e-5)
    # round(c*255) quantization (vec3.rs:64-68)
    u8 = np.asarray(color.to_u8(jnp.asarray(c)))
    assert u8.tolist() == [0, 64, 255]
    # out-of-range clamps instead of panicking (divergence from vec3.rs:46-63)
    u8 = np.asarray(color.to_u8(jnp.asarray([-0.5, 1.5, 0.5])))
    assert u8.tolist() == [0, 255, 128]


def test_gamma_u8_roundtrip_values():
    c = np.array([0.5], np.float32)
    got = int(np.asarray(color.to_u8_gamma(jnp.asarray(c)))[0])
    want = round((0.5 ** (1 / 2.2)) * 255)
    assert got == want
