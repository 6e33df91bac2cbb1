"""BVH builders (NumPy + C++) and stackless traversal."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_tpu.bvh import native
from rt_tpu.bvh.builder import _build_python, build_bvh
from rt_tpu.config import CompatConfig
from rt_tpu.geometry import nearest_hit_bruteforce
from rt_tpu.bvh.traverse import nearest_hit_bvh
from rt_tpu.scene import SceneBuilder

COMPAT = CompatConfig()


def _random_bounds(rng, n):
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    half = rng.uniform(0.1, 0.8, (n, 1)).astype(np.float32)
    return centers - half, centers + half


def _validate_threaded_bvh(arrays, n_prims, leaf_size):
    node_min, node_max, hit_next, miss_next, leaf_start, leaf_count, prim_order = arrays
    n_nodes = len(hit_next)
    # Every prim appears exactly once.
    assert sorted(prim_order.tolist()) == list(range(n_prims))
    covered = np.zeros(n_prims, bool)
    for i in range(n_nodes):
        assert (node_min[i] <= node_max[i] + 1e-6).all()
        if leaf_start[i] >= 0:
            assert 1 <= leaf_count[i] <= max(leaf_size, 1) * 2 + 4
            covered[prim_order[leaf_start[i] : leaf_start[i] + leaf_count[i]]] = True
            assert hit_next[i] == miss_next[i]
        else:
            assert hit_next[i] == i + 1  # preorder left child
        # Links point forward (DFS) or terminate.
        assert miss_next[i] == -1 or miss_next[i] > i
    assert covered.all()
    # Walking hit links from the root visits every node exactly once
    # when every AABB "hits": preorder sequence.
    cur, seen = 0, 0
    while cur != -1 and seen <= n_nodes:
        seen += 1
        cur = hit_next[cur] if leaf_start[cur] < 0 else miss_next[cur]
    # child containment
    for i in range(n_nodes):
        if leaf_start[i] < 0:
            for child in (i + 1,):
                assert (node_min[i] <= node_min[child] + 1e-5).all()
                assert (node_max[i] >= node_max[child] - 1e-5).all()


def test_python_builder_structure(rng):
    mins, maxs = _random_bounds(rng, 137)
    arrays = _build_python(mins, maxs, 4)
    _validate_threaded_bvh(arrays, 137, 4)


@pytest.mark.skipif(not native.available(), reason="native builder not built")
def test_native_builder_structure(rng):
    mins, maxs = _random_bounds(rng, 953)
    arrays = native.build(np.asarray(mins), np.asarray(maxs), 4)
    _validate_threaded_bvh(arrays, 953, 4)


@pytest.mark.skipif(not native.available(), reason="native builder not built")
def test_native_builder_large(rng):
    mins, maxs = _random_bounds(rng, 50_000)
    import time

    t0 = time.perf_counter()
    arrays = native.build(np.asarray(mins), np.asarray(maxs), 4)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"native build too slow: {dt}s"
    node_min, *_ , prim_order = arrays
    assert sorted(prim_order.tolist()) == list(range(50_000))


def _sphere_scene(rng, n, use_bvh):
    b = SceneBuilder()
    m = b.lambertian_rgb(0.5, 0.5, 0.5)
    for _ in range(n):
        b.add_sphere(rng.uniform(-8, 8, 3), rng.uniform(0.2, 1.0), m)
    return b.build(use_bvh=use_bvh)


def test_bvh_traversal_matches_bruteforce(rng):
    scene_bvh = _sphere_scene(np.random.default_rng(7), 300, True)
    scene_brute = _sphere_scene(np.random.default_rng(7), 300, False)
    assert scene_bvh.bvh is not None

    n = 256
    org = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    dirn = rng.normal(size=(n, 3)).astype(np.float32)
    t_bvh, p_bvh = nearest_hit_bvh(
        scene_bvh, jnp.asarray(org), jnp.asarray(dirn), 1e-3, 1e9, COMPAT
    )
    t_bf, p_bf = nearest_hit_bruteforce(
        scene_brute, jnp.asarray(org), jnp.asarray(dirn), 1e-3, 1e9, COMPAT
    )
    t_bvh, t_bf = np.asarray(t_bvh), np.asarray(t_bf)
    hit_bf = t_bf < 1e30
    np.testing.assert_array_equal(np.asarray(p_bvh) >= 0, hit_bf)
    np.testing.assert_allclose(t_bvh[hit_bf], t_bf[hit_bf], rtol=2e-4, atol=2e-4)


def test_bvh_traversal_triangles(rng):
    b = SceneBuilder()
    m = b.lambertian_rgb(0.5, 0.5, 0.5)
    for _ in range(200):
        base = rng.uniform(-5, 5, 3)
        b.add_triangle(base, base + rng.normal(size=3), base + rng.normal(size=3), m)
    scene_bvh = b.build(use_bvh=True)
    b2 = SceneBuilder()
    m2 = b2.lambertian_rgb(0.5, 0.5, 0.5)
    rng2 = np.random.default_rng()  # rebuild identically via state copy not possible; rebuild same tris
    scene_brute = scene_bvh.replace(bvh=None)

    n = 128
    org = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    dirn = rng.normal(size=(n, 3)).astype(np.float32)
    t_bvh, p_bvh = nearest_hit_bvh(
        scene_bvh, jnp.asarray(org), jnp.asarray(dirn), 1e-3, 1e9, COMPAT
    )
    t_bf, p_bf = nearest_hit_bruteforce(
        scene_brute, jnp.asarray(org), jnp.asarray(dirn), 1e-3, 1e9, COMPAT
    )
    t_bvh, t_bf = np.asarray(t_bvh), np.asarray(t_bf)
    hit = t_bf < 1e30
    np.testing.assert_array_equal(np.asarray(p_bvh) >= 0, hit)
    np.testing.assert_allclose(t_bvh[hit], t_bf[hit], rtol=2e-4, atol=2e-4)
