import numpy as np
import jax.numpy as jnp

from rt_tpu.scene import SceneBuilder
from rt_tpu.textures import texture_value
from tests import oracles


def _scene_with_textures():
    b = SceneBuilder()
    solid = b.solid_color((0.2, 0.4, 0.6))
    even = b.solid_color((0.0, 0.0, 0.0))
    odd = b.solid_color((0.95, 0.95, 0.95))
    checker = b.checker(0.31, even, odd)  # cover-scene params (scenes.rs:167)
    img = np.zeros((4, 8, 3), np.float32)
    img[0, 0] = (1, 0, 0)
    img[3, 7] = (0, 1, 0)
    img[1, 2] = (0, 0, 1)
    image = b.image_texture(img)
    m = b.lambertian(solid)
    b.add_sphere((0, 0, 0), 1.0, m)
    return b.build(use_bvh=False), dict(solid=solid, checker=checker, image=image, img=img)


def test_solid_color():
    scene, ids = _scene_with_textures()
    uv = jnp.zeros((3, 2), jnp.float32)
    pt = jnp.zeros((3, 3), jnp.float32)
    tex = jnp.full((3,), ids["solid"], jnp.int32)
    got = np.asarray(texture_value(scene, tex, uv, pt))
    np.testing.assert_allclose(got, np.tile([0.2, 0.4, 0.6], (3, 1)), rtol=1e-6)


def test_checker_parity_matches_oracle(rng):
    scene, ids = _scene_with_textures()
    pts = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    tex = jnp.full((256,), ids["checker"], jnp.int32)
    got = np.asarray(texture_value(scene, tex, jnp.zeros((256, 2)), jnp.asarray(pts)))
    for i in range(256):
        want = [0.0] * 3 if oracles.checker_is_even(pts[i], 1 / 0.31) else [0.95] * 3
        np.testing.assert_allclose(got[i], want, atol=1e-6, err_msg=str(pts[i]))


def test_image_texture_fetch_matches_oracle():
    scene, ids = _scene_with_textures()
    img = ids["img"]
    h, w = img.shape[:2]
    cases = [(0.0, 0.0), (1.0, 1.0), (0.3, 0.4), (-0.5, 0.5), (2.0, 0.25), (0.999, 0.999)]
    uv = jnp.asarray(cases, jnp.float32)
    tex = jnp.full((len(cases),), ids["image"], jnp.int32)
    got = np.asarray(texture_value(scene, tex, uv, jnp.zeros((len(cases), 3))))
    for i, (u, v) in enumerate(cases):
        x, y = oracles.image_texel(w, h, u, v)
        np.testing.assert_allclose(got[i], img[y, x], atol=1e-6, err_msg=f"case {i}")


def test_nested_checker_rejected():
    b = SceneBuilder()
    s1 = b.solid_color((0, 0, 0))
    s2 = b.solid_color((1, 1, 1))
    c1 = b.checker(1.0, s1, s2)
    try:
        b.checker(1.0, c1, s2)
        assert False, "expected ValueError"
    except ValueError:
        pass
