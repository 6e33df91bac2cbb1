"""Clustered kernel structures and parity with the flat path."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_tpu.cluster import build_clusters, pack_sphere_slots, CLUSTER_SLOTS
from rt_tpu.pallas_ops import cluster_nearest
from rt_tpu.scene import SceneBuilder
from rt_tpu import fast_shade
from rt_tpu.config import CompatConfig


def test_build_clusters_structure(rng):
    n = 500
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    half = rng.uniform(0.1, 0.5, (n, 1)).astype(np.float32)
    slot_of, slots, cl_aabb, sup_aabb = build_clusters(centers - half, centers + half)
    # Every prim in exactly one slot; slot_of inverts slots.
    live = slots >= 0
    assert sorted(slots[live].tolist()) == list(range(n))
    for p in range(n):
        assert slots[slot_of[p]] == p
    # Fixed strides; AABB tables are [M, 8].
    assert slots.shape[0] % CLUSTER_SLOTS == 0
    assert cl_aabb.shape[0] * CLUSTER_SLOTS == slots.shape[0]
    assert cl_aabb.shape[0] % 64 == 0
    # Cluster AABBs contain their prims.
    m = cl_aabb.shape[0]
    for ci in range(m):
        ids = slots[ci * CLUSTER_SLOTS : (ci + 1) * CLUSTER_SLOTS]
        ids = ids[ids >= 0]
        if len(ids) == 0:
            assert cl_aabb[ci, 0] > cl_aabb[ci, 3]  # inverted dummy
            continue
        assert (cl_aabb[ci, 0:3] <= (centers - half)[ids].min(0) + 1e-5).all()
        assert (cl_aabb[ci, 3:6] >= (centers + half)[ids].max(0) - 1e-5).all()


def test_build_clusters_empty():
    slot_of, slots, cl_aabb, sup_aabb = build_clusters(
        np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    )
    assert (slots == -1).all()
    assert (cl_aabb[:, 0] > cl_aabb[:, 3]).all()
    assert (sup_aabb[:, 0] > sup_aabb[:, 3]).all()


def _cluster_scene(rng, n_sph=300, n_tri=200):
    b = SceneBuilder()
    for i in range(n_sph):
        m = b.lambertian_rgb(*rng.uniform(0.2, 0.9, 3))
        b.add_sphere(rng.uniform(-8, 8, 3), rng.uniform(0.2, 0.8), m)
    mt = b.metal_solid((0.8, 0.7, 0.6), 0.1)
    for i in range(n_tri):
        base = rng.uniform(-8, 8, 3)
        b.add_triangle(base, base + rng.normal(size=3), base + rng.normal(size=3), mt)
    return b.build(use_bvh=False)


def test_cluster_kernel_matches_rows(rng):
    scene = _cluster_scene(rng)
    assert scene.clusters is not None
    cl = scene.clusters

    n = 256
    rays = np.zeros((8, n), np.float32)
    rays[0:3] = rng.uniform(-10, 10, (3, n))
    rays[3:6] = rng.normal(size=(3, n))
    rays_j = jnp.asarray(rays)

    t_k, slot_k = cluster_nearest(
        rays_j, cl.sph_super, cl.sph_cluster, cl.sph_slots,
        cl.tri_super, cl.tri_cluster, cl.tri_slots,
        cl.n_sph_slots, 1e-3, 1e9, True, interpret=True,
    )
    t_s, id_s = fast_shade.sphere_nearest_rows(scene, rays_j, 1e-3, 1e9)
    t_t, id_t = fast_shade.triangle_nearest_rows(scene, rays_j, 1e-3, 1e9, CompatConfig())
    t_ref = np.minimum(np.asarray(t_s), np.asarray(t_t))

    t_k = np.asarray(t_k)
    hit = t_ref < 1e30
    assert np.array_equal(np.asarray(slot_k) >= 0, hit)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=2e-4, atol=2e-4)

    # Slot ids map back to consistent shading params: the slot table's
    # geometry must match the winning primitive's t.
    slot_k = np.asarray(slot_k)
    sph_tab = np.asarray(cl.sph_slots)
    for lane in np.nonzero(hit)[0][:50]:
        s = slot_k[lane]
        if s < cl.n_sph_slots:
            c, r = sph_tab[0:3, s], sph_tab[3, s]
            assert r > 0
            # the hit point lies on this sphere
            p = rays[0:3, lane] + t_k[lane] * rays[3:6, lane]
            assert abs(np.linalg.norm(p - c) - r) < 5e-3 * max(1, r)


def test_cluster_scene_shade_table_slots(rng):
    scene = _cluster_scene(rng, 80, 200)  # >128 tris triggers clustering
    cl = scene.clusters
    table = np.asarray(cl.shade_table)
    sph_tab = np.asarray(cl.sph_slots)
    # Sphere slot columns carry the sphere's own center/radius rows.
    live = sph_tab[3] > 0
    np.testing.assert_allclose(
        table[fast_shade.F_AX : fast_shade.F_AZ + 1, : cl.n_sph_slots][:, live],
        sph_tab[0:3, live],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        table[fast_shade.F_RADIUS, : cl.n_sph_slots][live], sph_tab[3, live], rtol=1e-6
    )
    assert (table[fast_shade.F_IS_SPHERE, : cl.n_sph_slots][live] == 1.0).all()


def test_worklist_kernel_matches_rows(rng):
    from rt_tpu.pallas_ops import cluster_worklist_nearest

    scene = _cluster_scene(rng)
    cl = scene.clusters

    n = 256
    rays = np.zeros((8, n), np.float32)
    rays[0:3] = rng.uniform(-10, 10, (3, n))
    rays[3:6] = rng.normal(size=(3, n))
    rays_j = jnp.asarray(rays)

    t_k, slot_k = cluster_worklist_nearest(
        rays_j, cl.sph_super, cl.sph_cluster, cl.sph_slots,
        cl.tri_super, cl.tri_cluster, cl.tri_slots,
        cl.n_sph_slots, 1e-3, 1e9, True, interpret=True,
    )
    t_s, _ = fast_shade.sphere_nearest_rows(scene, rays_j, 1e-3, 1e9)
    t_t, _ = fast_shade.triangle_nearest_rows(scene, rays_j, 1e-3, 1e9, CompatConfig())
    t_ref = np.minimum(np.asarray(t_s), np.asarray(t_t))

    t_k = np.asarray(t_k)
    hit = t_ref < 1e30
    assert np.array_equal(np.asarray(slot_k) >= 0, hit)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=2e-4, atol=2e-4)

    # Winner slots reference consistent geometry.
    slot_k = np.asarray(slot_k)
    sph_tab = np.asarray(cl.sph_slots)
    for lane in np.nonzero(hit)[0][:40]:
        sl = slot_k[lane]
        if sl < cl.n_sph_slots:
            c, r = sph_tab[0:3, sl], sph_tab[3, sl]
            assert r > 0
            p = rays[0:3, lane] + t_k[lane] * rays[3:6, lane]
            assert abs(np.linalg.norm(p - c) - r) < 5e-3 * max(1, r)


def test_paged_worklist_matches_single_page(rng):
    """Manual page split of one scene's cluster tables: per-page kernel
    results merged by min-t must equal the single-page kernel (slot bases
    globalize winner ids)."""
    from rt_tpu.pallas_ops import cluster_worklist_nearest

    # Enough spheres to build clusters (>2048 prims) with >= 128 cluster
    # entries so two 64-cluster sub-pages exist.
    b = SceneBuilder()
    m = b.lambertian_rgb(0.6, 0.5, 0.4)
    centers = rng.uniform(-40, 40, (16500, 3))
    radii = rng.uniform(0.2, 0.5, 16500)
    for c, r in zip(centers, radii):
        b.add_sphere(c, r, m)
    scene = b.build(use_bvh=False)
    cl = scene.clusters
    ms = cl.sph_cluster.shape[0]
    assert ms >= 128  # two 64-cluster sub-pages available

    n = 256
    rays = np.zeros((8, n), np.float32)
    rays[0:3] = rng.uniform(-8, 8, (3, n))
    rays[3:6] = rng.normal(size=(3, n))
    rays_j = jnp.asarray(rays)

    args = dict(t_min=1e-3, t_max=1e9, backface_cull=True, interpret=True)
    t_ref, s_ref = cluster_worklist_nearest(
        rays_j, cl.sph_super, cl.sph_cluster, cl.sph_slots,
        cl.tri_super, cl.tri_cluster, cl.tri_slots,
        cl.n_sph_slots, **args,
    )

    half = 64
    t_best = np.full((n,), 3e38, np.float32)
    s_best = np.full((n,), -1, np.int32)
    for lo in range(0, ms, half):
        hi = min(lo + half, ms)
        t_p, s_p = cluster_worklist_nearest(
            rays_j,
            cl.sph_super[lo // 64 : -(-hi // 64)],
            cl.sph_cluster[lo:hi],
            cl.sph_slots[:, lo * 128 : hi * 128],
            cl.tri_super,
            cl.tri_cluster,
            cl.tri_slots,
            cl.n_sph_slots,
            sph_slot_base=lo * 128,
            **args,
        )
        t_p, s_p = np.asarray(t_p), np.asarray(s_p)
        better = t_p < t_best
        t_best = np.where(better, t_p, t_best)
        s_best = np.where(better, s_p, s_best)

    np.testing.assert_allclose(t_best, np.asarray(t_ref), rtol=1e-6)
    np.testing.assert_array_equal(s_best, np.asarray(s_ref))


def test_leaf_preserving_packing_tightness(rng):
    """Round-4 builder fix: clusters preserve SAH-leaf locality.  On a
    curved shell, exact-128-window packing merged boxes across leaf
    boundaries and blew per-ray entered counts ~3x (tools/bin_sim.py);
    leaf-preserving packing must keep total cluster surface area well
    below the window packing's."""
    from rt_tpu.cluster import _leaf_clusters, build_clusters

    n = 20000
    ang = rng.uniform(0, np.pi * 2, n)
    z = rng.uniform(-1, 1, n)
    r = np.sqrt(1 - z * z)
    c = np.stack([r * np.cos(ang), r * np.sin(ang), z], 1).astype(np.float32)
    h = np.full((n, 1), 0.01, np.float32)
    mins, maxs = c - h, c + h

    def total_area(aabb):
        live = aabb[:, 0] <= aabb[:, 3]
        e = np.maximum(aabb[live, 3:6] - aabb[live, 0:3], 0)
        return float(
            (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 0] * e[:, 2]).sum()
        )

    _, _, cl, _ = build_clusters(mins, maxs)
    leaves = _leaf_clusters(mins, maxs, 128)
    dfs = np.concatenate(leaves)
    wnd = [dfs[i : i + 128] for i in range(0, len(dfs), 128)]
    wa = np.zeros((len(wnd), 8), np.float32)
    for ci, ids in enumerate(wnd):
        wa[ci, 0:3] = mins[ids].min(axis=0)
        wa[ci, 3:6] = maxs[ids].max(axis=0)
    assert total_area(cl) < 0.7 * total_area(wa)


def test_build_clusters_capacity_escalation(rng):
    """max_clusters merges (then window-packs) until the budget holds —
    the streamed-scene capacity guarantee behind eligible_clustered."""
    from rt_tpu.cluster import build_clusters

    n = 60000
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = np.full((n, 1), 0.05, np.float32)
    # unconstrained: leaf packing, fill < 1
    _, _, cl_free, _ = build_clusters(pts - h, pts + h)
    assert cl_free.shape[0] * 128 > n
    # feasible cap: honored (pre-padding count <= cap, padded to 64)
    cap = -(-n // 128) + 32
    slot_of, slots, cl_cap, _ = build_clusters(pts - h, pts + h, cap)
    live = slots >= 0
    n_live_cl = int((cl_cap[:, 0] <= cl_cap[:, 3]).sum())
    assert n_live_cl <= cap
    # every prim still in exactly one slot
    assert sorted(slots[live].tolist()) == list(range(n))
    for p in range(0, n, 997):
        assert slots[slot_of[p]] == p


def test_capacity_split_stays_within_worklist_supers():
    """The per-type capacity split must keep PADDED super totals <= 256
    (_WL_ROWS) for every prim mix — including the one-sided scenes whose
    forced empty-type super previously overflowed the budget (round-4
    advisor finding: nt=0 gave 256 sphere supers + 1 padded tri super)."""
    from rt_tpu.scene import _cluster_capacity_split

    for ns, nt in [
        (10**7, 0), (0, 10**7), (10**7, 1), (1, 10**7),
        (5, 5), (10**6, 3), (3, 10**6), (123456, 654321),
    ]:
        cap_s, cap_t = _cluster_capacity_split(ns, nt)
        assert cap_s >= 64 and cap_t >= 64
        assert cap_s % 64 == 0 and cap_t % 64 == 0
        # worst-case padded supers: a type at its cap fills cap//64
        # supers exactly (cap is a 64-multiple); an empty/tiny type pads
        # to one super, which its >=64 cap already accounts for.
        assert cap_s // 64 + cap_t // 64 <= 256
