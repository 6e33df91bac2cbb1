"""Stackless BVH traversal on device.

Replaces the reference's ``bvh.nearest_traverse_iterator`` walk with
shrinking range (hittable.rs:135-149).  Wavefront form: every ray carries
its own node cursor; one ``lax.while_loop`` iteration advances every active
ray by one node (AABB slab test -> hit_next / miss_next threaded links;
leaves run a fixed-size unrolled primitive loop with masking).  Rays that
terminate early (cursor -1) idle until the whole batch drains — the classic
SIMD-divergence trade the survey flags (§7 hard part #1); the slab test
prunes against the current best t, so work still shrinks front-to-back-ish
even though threaded order is fixed DFS.

All shapes are static; there is no data-dependent control flow beyond the
single while_loop, so the whole traversal jits and shards cleanly.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from rt_tpu.bvh.builder import LEAF_SIZE
from rt_tpu.config import CompatConfig
from rt_tpu.scene import SceneData

BIG = np.float32(3.0e38)
TRI_EPS = np.float32(1.0e-7)


def _sphere_t_single(org, dirn, center, radius, t_min, t_limit):
    """Per-ray single-sphere candidate t (hittable.rs:318-338); inputs
    gathered per ray: center f32[N,3], radius f32[N]."""
    oc = center - org
    a = jnp.sum(dirn * dirn, axis=-1)
    h = jnp.sum(dirn * oc, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = h * h - a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 1.0e-30))  # finite grad at disc=0
    t0 = (h - sqrt_disc) / a
    t1 = (h + sqrt_disc) / a
    t_cand = jnp.where(t0 >= t_min, t0, t1)
    ok = (disc >= 0.0) & (radius > 0.0) & (t_cand >= t_min) & (t_cand < t_limit)
    return jnp.where(ok, t_cand, BIG)


def _triangle_t_single(org, dirn, a, b, c, t_min, t_limit, compat: CompatConfig):
    """Per-ray single-triangle Möller–Trumbore (hittable.rs:408-461)."""
    e1 = b - a
    e2 = c - a
    u_vec = jnp.cross(dirn, e2)
    det = jnp.sum(e1 * u_vec, axis=-1)
    if compat.triangle_backface_cull:
        det_ok = det > TRI_EPS
    else:
        det_ok = jnp.abs(det) > TRI_EPS
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    ao = org - a
    u = jnp.sum(ao * u_vec, axis=-1) * inv_det
    v_vec = jnp.cross(ao, e1)
    v = jnp.sum(dirn * v_vec, axis=-1) * inv_det
    t = jnp.sum(e2 * v_vec, axis=-1) * inv_det
    ok = (
        det_ok
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t < t_limit)
        & (t > TRI_EPS)
    )
    return jnp.where(ok, t, BIG)


def _prim_t(scene: SceneData, pid, org, dirn, t_min, t_limit, compat):
    """Candidate t for global prim id ``pid`` i32[N] (sphere ids first)."""
    is_sphere = pid < scene.num_spheres
    s_idx = jnp.clip(pid, 0, max(scene.num_spheres - 1, 0))
    t_idx = jnp.clip(pid - scene.num_spheres, 0, max(scene.num_triangles - 1, 0))
    ts = (
        _sphere_t_single(
            org, dirn, scene.sph_center[s_idx], scene.sph_radius[s_idx], t_min, t_limit
        )
        if scene.num_spheres > 0
        else jnp.full(pid.shape, BIG)
    )
    tt = (
        _triangle_t_single(
            org,
            dirn,
            scene.tri_a[t_idx],
            scene.tri_b[t_idx],
            scene.tri_c[t_idx],
            t_min,
            t_limit,
            compat,
        )
        if scene.num_triangles > 0
        else jnp.full(pid.shape, BIG)
    )
    return jnp.where(is_sphere, ts, tt)


def nearest_hit_bvh(
    scene: SceneData, org, dirn, t_min, t_max, compat: CompatConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest (t f32[N], prim i32[N]) via stackless threaded traversal."""
    bvh = scene.bvh
    assert bvh is not None
    n = org.shape[0]
    n_nodes = bvh.node_min.shape[0]

    safe_dir = jnp.where(jnp.abs(dirn) > 1.0e-20, dirn, 1.0e-20)
    inv_dir = 1.0 / safe_dir

    def cond(state):
        cur, _, _ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, t_best, prim_best = state
        active = cur >= 0
        node = jnp.clip(cur, 0, n_nodes - 1)

        # AABB slab test pruned by the current best t (the analog of the
        # reference's shrinking range, hittable.rs:139-143).
        nmin = bvh.node_min[node]
        nmax = bvh.node_max[node]
        t_lo = (nmin - org) * inv_dir
        t_hi = (nmax - org) * inv_dir
        t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
        t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
        t_near = jnp.maximum(t_near, 0.0)  # rays may start inside the box
        box_hit = active & (t_near <= t_far) & (t_far >= 0.0) & (t_near < t_best)

        start = bvh.leaf_start[node]
        count = bvh.leaf_count[node]
        is_leaf = start >= 0

        do_leaf = box_hit & is_leaf
        t_limit = jnp.minimum(t_best, t_max)
        for i in range(LEAF_SIZE):
            slot = jnp.clip(start + i, 0, bvh.prim_order.shape[0] - 1)
            pid = bvh.prim_order[slot]
            valid = do_leaf & (i < count)
            t_cand = _prim_t(scene, pid, org, dirn, t_min, t_limit, compat)
            better = valid & (t_cand < t_limit)
            t_best = jnp.where(better, t_cand, t_best)
            prim_best = jnp.where(better, pid, prim_best)
            t_limit = jnp.minimum(t_best, t_max)

        descend = box_hit & ~is_leaf
        cur = jnp.where(descend, bvh.hit_next[node], bvh.miss_next[node])
        cur = jnp.where(active, cur, -1)
        return cur, t_best, prim_best

    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), jnp.minimum(BIG, t_max), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
    )
    _, t_best, prim_best = jax.lax.while_loop(cond, body, init)
    t_best = jnp.where(prim_best >= 0, t_best, BIG)
    return t_best, prim_best


def nearest_hit_bvh_diff(
    scene: SceneData, org, dirn, t_min, t_max, compat: CompatConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse-differentiable nearest hit for BVH scenes.

    ``lax.while_loop`` has no reverse rule, so the traversal runs fully
    detached (stop_gradient on every input) to pick the WINNER id only,
    and the winner's t is recomputed differentiably — the same
    detached-decision estimator the sampling machinery uses
    (RenderConfig.detach_sampling): discrete choices frozen, continuous
    values carry gradients.  Cost: one extra per-winner primitive test.
    """
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    _, prim = nearest_hit_bvh(scene_sg, sg(org), sg(dirn), t_min, t_max, compat)
    t = _prim_t(scene, jnp.maximum(prim, 0), org, dirn, t_min, t_max, compat)
    t = jnp.where(prim >= 0, t, BIG)
    return t, prim
