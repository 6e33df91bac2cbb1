"""Reference-parity mesh_scene composition (scenes.rs:344-393, 460-475):
scale_rotate_mat semantics and the five-slot mesh placement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.scenes import MESH_SCENE_SLOTS, mesh_scene_reference, scale_rotate_mat
from rt_tpu.wavefront import render_wavefront

TETRA = """v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1 2 4
f 1 3 4
f 2 3 4
"""


def _rz(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _ry(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def test_scale_rotate_mat_nalgebra_semantics():
    """rotation = Ry(pitch) @ Rz(yaw) @ Rz(roll) — including the reference
    quirk that roll is fed into a Z rotation — scaled uniformly."""
    m = scale_rotate_mat(30.0, 90.0, 90.0, 12.0)
    want = (_ry(90.0) @ _rz(90.0) @ _rz(30.0)) * 12.0
    np.testing.assert_allclose(m[:3, :3], want, atol=1e-5)
    assert m.shape == (4, 4)
    # The translation column is zero (transform_vector ignores it anyway).
    np.testing.assert_allclose(m[:3, 3], 0.0)


def test_scale_rotate_mat_identity():
    m = scale_rotate_mat(0.0, 0.0, 0.0, 1.0)
    np.testing.assert_allclose(m, np.eye(4), atol=1e-7)


def test_mesh_scene_reference_composition(tmp_path):
    for stem, _, _ in MESH_SCENE_SLOTS:
        (tmp_path / f"{stem}.obj").write_text(TETRA)
    scene = mesh_scene_reference(str(tmp_path))
    # 2 ground triangles + 5 meshes x 4 faces.
    assert scene.num_triangles == 2 + 5 * 4
    assert scene.num_spheres == 0

    # Transform check: the teapot slot (0, -90, -90, 0.6) maps vertex
    # (1,0,0) -> 0.6 * Ry(-90) @ Rz(-90) @ (1,0,0) = 0.6 * (0,-1,0).
    want = (_ry(-90) @ _rz(-90) @ np.array([1.0, 0, 0])) * 0.6
    tri_pts = np.concatenate(
        [np.asarray(scene.tri_a), np.asarray(scene.tri_b), np.asarray(scene.tri_c)]
    )
    d = np.linalg.norm(tri_pts - want[None, :], axis=1)
    assert d.min() < 1e-5, (want, d.min())


def test_mesh_scene_reference_missing_meshes(tmp_path):
    (tmp_path / "teapot.obj").write_text(TETRA)
    scene = mesh_scene_reference(str(tmp_path))
    assert scene.num_triangles == 2 + 4
    with pytest.raises(FileNotFoundError):
        mesh_scene_reference(str(tmp_path), missing_ok=False)


def test_mesh_scene_reference_renders(tmp_path):
    """End-to-end smoke: the composed scene renders finite radiance
    through the wavefront (the first mesh-path render pinned by a test)."""
    for stem, _, _ in MESH_SCENE_SLOTS:
        (tmp_path / f"{stem}.obj").write_text(TETRA)
    scene = mesh_scene_reference(str(tmp_path))
    camera = scenes.cam1(16, 12)
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=2, max_depth=6)
    pix = jnp.arange(16 * 12, dtype=jnp.int32)
    img = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 2, jnp.int32(0), jax.random.key(0))
    )
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05
