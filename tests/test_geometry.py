import numpy as np
import jax.numpy as jnp
import pytest

from rt_tpu import geometry
from rt_tpu.config import CompatConfig
from rt_tpu.scene import SceneBuilder
from tests import oracles

COMPAT = CompatConfig()


def _rand_rays(rng, n):
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    dirn = rng.normal(size=(n, 3)).astype(np.float32)
    return org, dirn


def test_sphere_candidate_matches_oracle(rng):
    n, s = 128, 17
    org, dirn = _rand_rays(rng, n)
    centers = rng.uniform(-4, 4, (s, 3)).astype(np.float32)
    radii = rng.uniform(0.2, 1.5, (s,)).astype(np.float32)
    t = np.asarray(
        geometry.sphere_candidate_t(
            jnp.asarray(org), jnp.asarray(dirn), jnp.asarray(centers), jnp.asarray(radii), 1e-3, 1e9
        )
    )
    for i in range(0, n, 7):
        for j in range(s):
            want = oracles.sphere_hit_t(centers[j], radii[j], org[i], dirn[i], 1e-3, 1e9)
            if want is None:
                assert t[i, j] >= 1e30, (i, j)
            else:
                assert t[i, j] == pytest.approx(want, rel=2e-3, abs=2e-3), (i, j)


def test_triangle_candidate_matches_oracle(rng):
    n, m = 96, 11
    org, dirn = _rand_rays(rng, n)
    tri = rng.uniform(-3, 3, (m, 3, 3)).astype(np.float32)
    t, _, _ = geometry.triangle_candidate(
        jnp.asarray(org), jnp.asarray(dirn),
        jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2]),
        1e-3, 1e9, COMPAT,
    )
    t = np.asarray(t)
    for i in range(0, n, 5):
        for j in range(m):
            want = oracles.triangle_hit(tri[j, 0], tri[j, 1], tri[j, 2], org[i], dirn[i], 1e-3, 1e9)
            if want is None:
                assert t[i, j] >= 1e30, (i, j)
            else:
                assert t[i, j] == pytest.approx(want[0], rel=1e-3, abs=1e-3), (i, j)


def test_backface_culling_flag(rng):
    # A triangle facing +z; a ray hitting its back face (from below).
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    org = np.array([[0.2, 0.2, -1.0]], np.float32)
    dirn = np.array([[0.0, 0.0, 1.0]], np.float32)
    t_cull, _, _ = geometry.triangle_candidate(
        jnp.asarray(org), jnp.asarray(dirn),
        jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2]),
        1e-3, 1e9, CompatConfig(triangle_backface_cull=True),
    )
    t_nocull, _, _ = geometry.triangle_candidate(
        jnp.asarray(org), jnp.asarray(dirn),
        jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2]),
        1e-3, 1e9, CompatConfig(triangle_backface_cull=False),
    )
    # From below, det = e1.(d x e2) < 0: culled in compat mode.
    assert np.asarray(t_cull)[0, 0] >= 1e30
    assert np.asarray(t_nocull)[0, 0] == pytest.approx(1.0, rel=1e-5)


def test_sphere_uv_facing_matches_oracle(rng):
    for _ in range(64):
        p = rng.normal(size=3)
        p = (p / np.linalg.norm(p)).astype(np.float32)
        f = rng.normal(size=3).astype(np.float32)
        got = np.asarray(geometry.sphere_uv_facing(jnp.asarray(p[None]), jnp.asarray(f[None])))[0]
        want = oracles.unit_sphere_uv_facing(p.astype(np.float64), f.astype(np.float64))
        # u wraps at 1.0 ~ 0.0
        du = abs(got[0] - want[0])
        assert min(du, 1.0 - du) < 1e-3
        assert got[1] == pytest.approx(want[1], abs=1e-3)


def test_triangle_uv_bbox_quirk(rng):
    uv_abc = np.array([[[0.1, 0.2], [0.9, 0.3], [0.4, 0.8]]], np.float32)
    u, v = np.float32(0.25), np.float32(0.5)
    got = np.asarray(
        geometry.triangle_uv(jnp.asarray(uv_abc), jnp.asarray([u]), jnp.asarray([v]), COMPAT)
    )[0]
    want = oracles.triangle_uv_bbox(uv_abc[0, 0], uv_abc[0, 1], uv_abc[0, 2], u, v)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # Corrected mode: true barycentric interpolation.
    got2 = np.asarray(
        geometry.triangle_uv(
            jnp.asarray(uv_abc), jnp.asarray([u]), jnp.asarray([v]),
            CompatConfig(triangle_uv_bbox_remap=False),
        )
    )[0]
    w = 1 - u - v
    want2 = w * uv_abc[0, 0] + u * uv_abc[0, 1] + v * uv_abc[0, 2]
    np.testing.assert_allclose(got2, want2, rtol=1e-5)


def _two_prim_scene():
    b = SceneBuilder()
    m = b.lambertian_rgb(0.5, 0.5, 0.5)
    b.add_sphere((0.0, 0.0, 5.0), 1.0, m)
    # Winding chosen so the normal faces -z (toward rays from the origin);
    # +z-winding would be backface-culled, as in the reference.
    b.add_triangle((-2, -2, 10), (0, 2, 10), (2, -2, 10), m)
    return b.build(use_bvh=False)


def test_nearest_hit_prefers_closer_prim():
    scene = _two_prim_scene()
    org = jnp.array([[0.0, 0.0, 0.0], [0.0, 1.5, 0.0]], jnp.float32)
    dirn = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    rec = geometry.nearest_hit(scene, org, dirn, 1e-3, 1e9)
    assert bool(rec.hit[0]) and bool(rec.hit[1])
    assert int(rec.prim[0]) == 0  # sphere at t=4
    assert float(rec.t[0]) == pytest.approx(4.0, rel=1e-5)
    assert int(rec.prim[1]) == 1  # triangle at t=10 (ray passes over sphere)
    assert float(rec.t[1]) == pytest.approx(10.0, rel=1e-5)
    # Sphere normal flipped against the ray; front face.
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0, 0, -1], atol=1e-5)
    assert bool(rec.front[0])


def test_nearest_hit_miss():
    scene = _two_prim_scene()
    org = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    dirn = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    rec = geometry.nearest_hit(scene, org, dirn, 1e-3, 1e9)
    assert not bool(rec.hit[0])
    assert int(rec.prim[0]) == -1


def test_unit_sphere_uv_with_rotation(rng):
    """Public unit_sphere_uv incl. the rotation_rads texture spin
    (hittable.rs:370-388): rotating by pi shifts u by 0.5 mod 1."""
    import jax.numpy as jnp

    for _ in range(16):
        p = rng.normal(size=3)
        p = (p / np.linalg.norm(p)).astype(np.float32)
        pitch, yaw = rng.uniform(-1.5, 1.5), rng.uniform(-3, 3)
        base = np.asarray(
            geometry.unit_sphere_uv(jnp.asarray(p[None]), pitch, yaw, 0.0)
        )[0]
        spun = np.asarray(
            geometry.unit_sphere_uv(jnp.asarray(p[None]), pitch, yaw, np.pi)
        )[0]
        du = abs((spun[0] - base[0]) % 1.0 - 0.5)
        assert du < 1e-3 or du > 0.5 - 1e-3
        assert spun[1] == pytest.approx(base[1], abs=1e-5)  # v unchanged
        # Zero-rotation path agrees with the facing-based oracle pipeline:
        want = oracles.unit_sphere_uv_facing(p.astype(np.float64), np.array([1.0, 0, 0]))
        got = np.asarray(geometry.unit_sphere_uv(jnp.asarray(p[None]), 0.0, 0.0, 0.0))[0]
        ddu = abs(got[0] - want[0])
        assert min(ddu, 1 - ddu) < 1e-3 and got[1] == pytest.approx(want[1], abs=1e-3)
