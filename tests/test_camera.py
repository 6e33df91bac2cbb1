import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu.camera import make_camera
from rt_tpu.config import CompatConfig
from tests import oracles

CAM1 = dict(  # scenes.rs:17-42 (cam1)
    center=(3.0, -5.0, 0.6),
    lookat=(0.0, 0.0, 0.0),
    up=(0.0, 0.0, 1.0),
    defocus_angle=0.0,
    width=800,
    height=600,
    vfov=20.0,
)


def _cam(**kw):
    p = dict(CAM1, **kw)
    focus = np.linalg.norm(np.array(p["center"]) - np.array(p["lookat"]))
    cam = make_camera(
        p["center"],
        p["lookat"],
        p["up"],
        focus_distance=focus,
        defocus_angle=p["defocus_angle"],
        image_width=p["width"],
        image_height=p["height"],
        vertical_fov=p["vfov"],
    )
    oracle = oracles.camera_frame(
        p["center"], p["lookat"], p["up"], focus, p["defocus_angle"], p["width"], p["height"], p["vfov"]
    )
    return cam, oracle


def test_camera_frame_matches_oracle():
    cam, want = _cam()
    np.testing.assert_allclose(np.asarray(cam.pixel00_loc), want["pixel00"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.pixel_du), want["pixel_du"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cam.pixel_dv), want["pixel_dv"], rtol=1e-5, atol=1e-7)


def test_camera_frame_with_defocus():
    cam, want = _cam(defocus_angle=0.7)
    np.testing.assert_allclose(np.asarray(cam.defocus_disk_u), want["defocus_u"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cam.defocus_disk_v), want["defocus_v"], rtol=1e-5, atol=1e-7)


def test_generate_rays_no_defocus_origin_is_center():
    cam, want = _cam()
    key = jax.random.key(0)
    px = jnp.array([0, 400, 799], jnp.int32)
    py = jnp.array([0, 300, 599], jnp.int32)
    org, dirn = cam.generate_rays(px, py, jnp.zeros(3, jnp.int32), key)
    np.testing.assert_allclose(np.asarray(org), np.tile(CAM1["center"], (3, 1)), atol=1e-6)
    # Sample 0 jitter is halton(0) = (0.5, 1/3) for every pixel (compat
    # shared-jitter mode, camera.rs:239).
    off = np.array([0.5, 1 / 3])
    for i, (x, y) in enumerate([(0, 0), (400, 300), (799, 599)]):
        sample = want["pixel00"] + want["pixel_du"] * (x + off[0]) + want["pixel_dv"] * (y + off[1])
        np.testing.assert_allclose(np.asarray(dirn[i]), sample - np.array(CAM1["center"]), rtol=1e-4, atol=1e-5)


def test_generate_rays_defocus_origins_on_disk():
    cam, want = _cam(defocus_angle=0.7)
    key = jax.random.key(0)
    n = 512
    px = jnp.zeros(n, jnp.int32)
    org, _ = cam.generate_rays(px, px, jnp.zeros(n, jnp.int32), key)
    rel = np.asarray(org) - np.array(CAM1["center"])
    # Origins must lie inside the defocus ellipse spanned by disk_u, disk_v.
    basis = np.stack([want["defocus_u"], want["defocus_v"]], axis=1)
    coeffs, *_ = np.linalg.lstsq(basis, rel.T, rcond=None)
    assert np.all(np.linalg.norm(coeffs, axis=0) <= 1.0 + 1e-4)
    assert np.linalg.norm(rel, axis=-1).max() > 0.0  # actually scattered


def test_per_pixel_scramble_decorrelates():
    cam, _ = _cam()
    compat = CompatConfig(shared_halton_jitter=False)
    key = jax.random.key(0)
    px = jnp.array([0, 1], jnp.int32)
    py = jnp.array([0, 0], jnp.int32)
    _, d = cam.generate_rays(px, py, jnp.zeros(2, jnp.int32), key, compat)
    # With scrambling, adjacent pixels' jitters differ (not just by du).
    delta = np.asarray(d[1] - d[0])
    np.testing.assert_array_less(1e-7, np.abs(delta - np.asarray(cam.pixel_du)).max())


def test_debug_ray():
    cam, want = _cam()
    org, dirn = cam.debug_ray(10.0, 20.0)
    sample = want["pixel00"] + want["pixel_du"] * 10.0 + want["pixel_dv"] * 20.0
    np.testing.assert_allclose(np.asarray(dirn), sample - np.array(CAM1["center"]), rtol=1e-4, atol=1e-5)
