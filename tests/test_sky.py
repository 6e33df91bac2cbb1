import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu import sky


def _dirs(n=64, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2])  # upper hemisphere
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_sky_radiance_positive_and_finite():
    params = sky.SkyParams.default()
    rgb = np.asarray(sky.sky_radiance_rgb(params, jnp.asarray(_dirs())))
    assert np.all(np.isfinite(rgb))
    assert np.all(rgb >= 0.0)
    assert rgb.max() > 0.0


def test_sky_brighter_toward_sun():
    """Circumsolar brightening: at equal elevation, the direction toward
    the sun's azimuth outshines the opposite azimuth (same Perez theta
    term, smaller gamma)."""
    sun = np.array([1.0, 0.0, 1.0]) / np.sqrt(2.0)
    params = sky.SkyParams.default().replace(sun_direction=jnp.asarray(sun, jnp.float32))
    near = jnp.asarray([sun], jnp.float32)  # gamma = 0
    away = jnp.asarray([[-1.0, 0.0, 1.0]], jnp.float32) / np.sqrt(2.0)  # gamma = 90 deg
    y_near, _, _ = sky.sky_radiance_xyy(params, near)
    y_away, _, _ = sky.sky_radiance_xyy(params, away)
    assert float(y_near[0]) > float(y_away[0])


def test_sky_horizon_bluer_zenith_darker_than_horizon_luminance():
    """For clear skies (low turbidity) the horizon is brighter than the
    zenith in the Perez model with a zenith sun."""
    params = sky.SkyParams.default()
    zenith = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    horizon = jnp.asarray([[1.0, 0.0, 0.02]], jnp.float32)
    horizon = horizon / jnp.linalg.norm(horizon)
    y_z, _, _ = sky.sky_radiance_xyy(params, zenith)
    y_h, _, _ = sky.sky_radiance_xyy(params, horizon)
    assert np.isfinite(float(y_z[0])) and np.isfinite(float(y_h[0]))


def test_sky_color_toward_tonemapped_range():
    params = sky.SkyParams.default()
    rgb = np.asarray(sky.sky_color_toward(params, jnp.asarray(_dirs(128))))
    assert np.all(rgb >= 0.0)
    assert np.all(rgb <= 1.5)  # tonemap keeps values display-scaled
    assert np.all(np.isfinite(rgb))


def test_sky_differentiable_in_params():
    params = sky.SkyParams.default()
    d = jnp.asarray([[0.3, 0.1, 0.95]], jnp.float32)
    d = d / jnp.linalg.norm(d)

    def loss(p):
        return jnp.sum(sky.sky_color_toward(p, d))

    g = jax.grad(loss)(params)
    assert np.isfinite(float(g.turbidity))
    assert np.isfinite(float(g.exposure))
    assert np.all(np.isfinite(np.asarray(g.sun_direction)))
    # Exposure must have nonzero influence.
    assert abs(float(g.exposure)) > 0.0


def test_below_horizon_does_not_nan():
    params = sky.SkyParams.default()
    down = jnp.asarray([[0.0, 0.3, -0.95]], jnp.float32)
    down = down / jnp.linalg.norm(down)
    rgb = np.asarray(sky.sky_color_toward(params, down))
    assert np.all(np.isfinite(rgb))
