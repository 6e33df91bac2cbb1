"""Scene-library coverage: mesh factories, progressive compat modes,
PPM byte parity, frosted dielectric."""

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.io.ppm import write_ppm
from rt_tpu.scene import SceneBuilder, MAT_METAL, MAT_LAMBERTIAN, MAT_DIELECTRIC


def test_mesh_scene_factory(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 1\nf 1 2 3\n")
    scene = scenes.mesh_scene({"plaster": str(obj), "mirror": str(obj)})
    # ground (2) + two meshes (1 tri each)
    assert scene.num_triangles == 4
    kinds = np.asarray(scene.mat_kind)
    assert (kinds == MAT_LAMBERTIAN).sum() >= 2  # checker ground + plaster
    assert (kinds == MAT_METAL).sum() >= 1


def test_cover_large_vectorized_gen():
    camera = scenes.cam1(16, 9)
    scene = scenes.cover_scene(60, 60, camera, z=-0.2, seed=1)
    # Vectorized path (>2500 grid cells) with collision holes.
    assert 10_000 < scene.num_spheres < 14_410
    kinds = np.asarray(scene.mat_kind)
    # Mix roughly 80/15/5 lambertian/metal/glass.
    n = kinds.size
    assert (kinds == MAT_LAMBERTIAN).sum() / n > 0.6
    assert (kinds == MAT_DIELECTRIC).sum() / n < 0.12


def test_ppm_header_byte_parity(tmp_path):
    """Exact reference header format (camera.rs:346-350): P3, 'w h # width,
    height', '255 # max color value', rows newline-separated."""
    img = np.zeros((2, 3, 3), np.float32)
    img[0, 0] = 1.0
    path = str(tmp_path / "t.ppm")
    write_ppm(path, img)
    lines = open(path).read().splitlines()
    assert lines[0] == "P3"
    assert lines[1] == "3 2 # width, height"
    assert lines[2] == "255 # max color value"
    assert lines[3].startswith("255 255 255 0 0 0")
    assert len(lines) == 5  # one line per row


def test_frosted_dielectric_scatters_with_spread():
    """Frosted glass (material.rs:138-143, 168-171): fuzz perturbs only the
    refracted branch, producing angular spread vs clear glass."""
    from rt_tpu import materials
    from rt_tpu.geometry import nearest_hit

    def scatter_dirs(fuzz):
        b = SceneBuilder()
        m = b.dielectric(1.5, fuzz)
        b.add_sphere((0, 0, 3), 1.0, m)
        scene = b.build(use_bvh=False)
        n = 512
        org = jnp.zeros((n, 3), jnp.float32)
        dirn = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        rec = nearest_hit(scene, org, dirn, 1e-3, 1e9)
        _, out = materials.scatter(scene, rec, dirn, jax.random.key(0))
        return np.asarray(out)

    clear = scatter_dirs(None)
    frosted = scatter_dirs(0.3)
    # Straight-on: refracted lanes continue +z exactly for clear glass.
    refr_clear = clear[clear[:, 2] > 0]
    refr_frost = frosted[frosted[:, 2] > 0]
    assert np.abs(refr_clear[:, 0:2]).max() < 1e-5
    assert np.abs(refr_frost[:, 0:2]).std() > 0.05


def test_progressive_corrected_sample_indexing():
    """reuse_sample_indices=False advances Halton indices across sweeps
    (the corrected mode; True replicates camera.rs:317-320)."""
    from rt_tpu.progressive import ProgressiveRenderer

    camera = scenes.cam1(8, 6)
    scene = scenes.cover_scene(2, 2, camera, seed=0)
    cfg = RenderConfig(width=8, height=6, max_depth=4)
    r1 = ProgressiveRenderer(scene, camera, cfg, reuse_sample_indices=True)
    r2 = ProgressiveRenderer(scene, camera, cfg, reuse_sample_indices=False)
    for _ in range(3):
        r1.step()
        r2.step()
    assert r1.state.total_spp == r2.state.total_spp == 7
    assert np.all(np.isfinite(r1.state.image))
    assert np.all(np.isfinite(r2.state.image))
    # Different jitter schedules -> different accumulations.
    assert not np.array_equal(r1.state.accum, r2.state.accum)


def test_add_triangles_transform_and_shift():
    """Triangle::transform rotation/scale (no translation) and
    Triangle::shift parity (hittable.rs:214-239)."""
    b = SceneBuilder()
    m = b.lambertian_rgb(0.5, 0.5, 0.5)
    verts = np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], np.float32)
    scale2 = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    scale2[0:3, 3] = [9, 9, 9]  # translation must be IGNORED (transform_vector)
    b.add_triangles(verts, None, m, transform=scale2, shift=(0.0, 0.0, 1.0))
    scene = b.build(use_bvh=False)
    np.testing.assert_allclose(np.asarray(scene.tri_a[0]), [2, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.tri_b[0]), [0, 2, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.tri_c[0]), [0, 0, 3], atol=1e-6)
