"""Host-side BVH construction -> flattened threaded node arrays.

Replaces the Rust `bvh` crate's ``Bvh::build_par`` (reference:
hittable.rs:34).  Output layout is designed for the *stackless* on-device
traversal (SURVEY.md §7): nodes in depth-first preorder, each carrying

- ``hit_next``: where to go when the ray hits the node's AABB — the first
  child for interior nodes (preorder: self+1), the escape for leaves
  (after intersecting the leaf's primitives);
- ``miss_next``: the "escape" index — the right sibling of the nearest
  ancestor that has one; -1 terminates traversal.

The Python builder here is the correctness baseline (median split on the
largest centroid axis).  The C++ binned-SAH builder (rt_tpu/bvh/cpp) is
used automatically when its shared library is available; it produces the
same array contract.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from rt_tpu.scene import BvhArrays

LEAF_SIZE = 4


def build_bvh(bounds: tuple[np.ndarray, np.ndarray], leaf_size: int = LEAF_SIZE) -> BvhArrays:
    """Build a BVH over per-primitive AABBs.

    Args:
      bounds: (mins f32[P,3], maxs f32[P,3]) in global prim-id order.

    Returns: BvhArrays (see rt_tpu/scene.py) with at most ``leaf_size``
    primitives per leaf.
    """
    from rt_tpu.bvh import native

    mins, maxs = bounds
    mins = np.asarray(mins, np.float32)
    maxs = np.asarray(maxs, np.float32)
    if native.available():
        arrays = native.build(mins, maxs, leaf_size)
    else:
        arrays = _build_python(mins, maxs, leaf_size)
    node_min, node_max, hit_next, miss_next, leaf_start, leaf_count, prim_order = arrays
    return BvhArrays(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        hit_next=jnp.asarray(hit_next),
        miss_next=jnp.asarray(miss_next),
        leaf_start=jnp.asarray(leaf_start),
        leaf_count=jnp.asarray(leaf_count),
        prim_order=jnp.asarray(prim_order),
    )


def _build_python(mins: np.ndarray, maxs: np.ndarray, leaf_size: int):
    """NumPy median-split builder emitting preorder threaded arrays."""
    n = mins.shape[0]
    centroids = (mins + maxs) * 0.5

    # Upper bound on node count for a binary tree with >=1 prim per leaf.
    max_nodes = max(2 * n, 1)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    hit_next = np.empty((max_nodes,), np.int32)
    miss_next = np.empty((max_nodes,), np.int32)
    leaf_start = np.full((max_nodes,), -1, np.int32)
    leaf_count = np.zeros((max_nodes,), np.int32)
    prim_order = np.empty((n,), np.int32)

    n_nodes = 0
    n_ordered = 0

    def emit_subtree(ids: np.ndarray, escape: int) -> int:
        """Emit subtree in preorder; returns subtree root index.  Iterative
        via an explicit stack (no Python recursion limits).  Preorder with
        known escapes works because the median split is count-deterministic:
        the left subtree's node count — and hence the right subtree's root
        index — is computable up front via ``_subtree_size``."""
        nonlocal n_nodes, n_ordered
        stack = [(ids, escape)]
        root = n_nodes
        while stack:
            ids, escape = stack.pop()
            idx = n_nodes
            n_nodes += 1
            node_min[idx] = mins[ids].min(axis=0)
            node_max[idx] = maxs[ids].max(axis=0)
            miss_next[idx] = escape
            if len(ids) <= leaf_size:
                leaf_start[idx] = n_ordered
                leaf_count[idx] = len(ids)
                prim_order[n_ordered : n_ordered + len(ids)] = ids
                n_ordered += len(ids)
                hit_next[idx] = escape
                continue
            # Median split on the largest centroid-extent axis.
            cent = centroids[ids]
            axis = int(np.argmax(cent.max(axis=0) - cent.min(axis=0)))
            order = np.argsort(cent[:, axis], kind="stable")
            half = len(ids) // 2
            left_ids = ids[order[:half]]
            right_ids = ids[order[half:]]
            hit_next[idx] = idx + 1  # left child (preorder)
            # Emit left subtree fully (its escape = right subtree root),
            # then the right subtree (escape = our escape).  We know the
            # right root only after the left is emitted, so emit left
            # eagerly with a sub-stack.
            left_size = _subtree_size(len(left_ids), leaf_size)
            right_root = idx + 1 + left_size
            stack.append((right_ids, escape))
            stack.append((left_ids, right_root))
        return root

    emit_subtree(np.arange(n, dtype=np.int64), -1)

    return (
        node_min[:n_nodes],
        node_max[:n_nodes],
        hit_next[:n_nodes],
        miss_next[:n_nodes],
        leaf_start[:n_nodes],
        leaf_count[:n_nodes],
        prim_order,
    )


@lru_cache(maxsize=None)
def _subtree_size(count: int, leaf_size: int) -> int:
    """Node count of the deterministic median-split subtree over ``count``
    prims — computable from the count alone because splits are always
    floor-half/ceil-half."""
    if count <= leaf_size:
        return 1
    half = count // 2
    return 1 + _subtree_size(half, leaf_size) + _subtree_size(count - half, leaf_size)
