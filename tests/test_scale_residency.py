"""Sponza-class residency validation (VERDICT round-1 missing item 6).

The reference crashes loading its Sponza glTF at ~40 GB because every
triangle clones its material and decoded texture AoS-style
(scenes.rs:443-446, TODO.md:69-70).  rt_tpu's SoA scene must stay LINEAR
in primitive count with a small constant: this test pushes a 100k-triangle
mesh through the real OBJ loader -> SceneBuilder -> build(BVH) pipeline
and asserts the byte budget, then renders through the BVH path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu import scenes
from rt_tpu.config import RenderConfig
from rt_tpu.io.obj_loader import load_obj
from rt_tpu.scene import SceneBuilder
from rt_tpu.wavefront import render_wavefront


def _write_grid_obj(path, nx=224, ny=224):
    """~100k-triangle height-field OBJ (2 tris per cell)."""
    xs = np.linspace(-5, 5, nx + 1)
    ys = np.linspace(-5, 5, ny + 1)
    with open(path, "w") as f:
        for y in ys:
            for x in xs:
                z = 0.2 * np.sin(x) * np.cos(y)
                f.write(f"v {x:.4f} {y:.4f} {z:.4f}\n")
        w = nx + 1
        for j in range(ny):
            for i in range(nx):
                a = j * w + i + 1
                b = a + 1
                c = a + w + 1
                d = a + w
                f.write(f"f {a} {b} {c}\n")
                f.write(f"f {a} {c} {d}\n")


def _scene_bytes(scene):
    total = 0
    for leaf in jax.tree.leaves(scene):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total


def test_100k_triangle_mesh_linear_residency(tmp_path):
    path = str(tmp_path / "grid.obj")
    _write_grid_obj(path)

    models = load_obj(path)
    n_tris = sum(m["vertices"].shape[0] for m in models)
    assert n_tris == 2 * 224 * 224  # 100,352 triangles

    b = SceneBuilder()
    mat = b.lambertian_rgb(0.6, 0.6, 0.6)
    for m in models:
        b.add_triangles(m["vertices"], m["uvs"], mat)
    scene = b.build()
    assert scene.bvh is not None

    per_tri = _scene_bytes(scene) / n_tris
    # Measured composition (~690 B/tri): SoA geometry+uv+normal (~80 B),
    # kernel-layout packed rows (48 B), BVH arrays (~60 B), clustered slot
    # tables (~3x48 B with padding), and the 40-row shade tables (flat +
    # slot-ordered, 160 B each).  Linear with a sub-kB constant — a 10M-tri
    # Sponza fits in ~7 GB where the reference needs ~40 GB and dies
    # (scenes.rs:443-446).  A drift past 1 kB/tri means some table went
    # quadratic or AoS.
    assert per_tri < 1000, f"{per_tri:.0f} B/triangle — scene residency blew up"

    camera = scenes.cam1(8, 6)
    cfg = RenderConfig(width=8, height=6, samples_per_pixel=1, max_depth=2)
    pix = jnp.arange(8 * 6, dtype=jnp.int32)
    img = np.asarray(
        render_wavefront(scene, camera, pix, cfg, 1, jnp.int32(0), jax.random.key(0))
    )
    assert np.all(np.isfinite(img))
