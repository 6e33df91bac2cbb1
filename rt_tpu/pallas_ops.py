"""Pallas TPU kernels for the intersection hot path.

The XLA brute-force sphere query (geometry.sphere_candidate_t) materializes
[N,S] f32 intermediates in HBM — ~6 arrays of rays x spheres per bounce —
and profiles HBM-bound (~40 ms for 131k x 447 on v5e).  This kernel fuses
the whole candidate-t computation *and* the nearest reduction into VMEM:

- rays are packed SoA as one f32[8, N] block-tiled input (rows: origin
  xyz, direction xyz, 2 pad rows -> exactly the (8, 128) f32 tile);
- the sphere table f32[S,4] (center xyz, radius) is VMEM-resident and
  reused by every grid program;
- each program processes R rays against sphere chunks of C in a fori_loop,
  carrying the running (best_t, best_id) in registers/VMEM;
- HBM traffic is rays-in + (t, id)-out: ~36 B/ray instead of ~48*S B/ray.

Reference analog: this *is* the inner loop of World::hit over the BVH's
candidate set (hittable.rs:135-149) for the all-spheres case; the math is
hittable.rs:318-338 (half-b quadratic, near-root-else-far-root).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)

RAY_TILE = 256  # rays per grid program (lanes: 2 x 128)
SPHERE_CHUNK = 128  # spheres per inner iteration (sublanes: 16 x 8)
TRI_CHUNK = 64  # triangles per inner iteration (9 coord rows each)


def _kernel(rays_ref, sph_ref, t_ref, idx_ref, *, n_chunks, t_min, t_max):
    rays = rays_ref[:, :]  # [8, R]
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a

    r_lanes = rays.shape[1]
    big = 3.0e38  # python float: jnp scalars would be captured consts
    init = (
        jnp.full((1, r_lanes), big, jnp.float32),
        jnp.full((1, r_lanes), -1, jnp.int32),
    )

    def chunk_body(ci, carry):
        best_t, best_i = carry
        sph = sph_ref[pl.ds(ci * SPHERE_CHUNK, SPHERE_CHUNK), :]  # [C,4]
        cx, cy, cz, rad = sph[:, 0:1], sph[:, 1:2], sph[:, 2:3], sph[:, 3:4]

        ocx = cx - ox  # [C,R] broadcast
        ocy = cy - oy
        ocz = cz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = h * h - a * c
        sd = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (h - sd) * inv_a
        t1 = (h + sd) * inv_a
        t_cand = jnp.where(t0 >= t_min, t0, t1)
        valid = (disc >= 0.0) & (rad > 0.0) & (t_cand >= t_min) & (t_cand < t_max)
        t_cand = jnp.where(valid, t_cand, big)

        cmin = jnp.min(t_cand, axis=0, keepdims=True)  # [1,R]
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 0)
            + ci * SPHERE_CHUNK
        )
        sel = jnp.min(
            jnp.where(t_cand == cmin, ids, jnp.int32(2**30)), axis=0, keepdims=True
        )
        better = cmin < best_t
        return (
            jnp.where(better, cmin, best_t),
            jnp.where(better, sel, best_i),
        )

    best_t, best_i = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    t_ref[0:1, :] = best_t
    idx_ref[0:1, :] = best_i


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def sphere_nearest(
    org: jnp.ndarray,  # f32[N,3]
    dirn: jnp.ndarray,  # f32[N,3]
    centers: jnp.ndarray,  # f32[S,3]
    radius: jnp.ndarray,  # f32[S]
    t_min: float,
    t_max: float,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest sphere per ray: (t f32[N] with BIG=miss, idx i32[N] with -1)."""
    n = org.shape[0]
    s = centers.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    s_pad = -(-s // SPHERE_CHUNK) * SPHERE_CHUNK

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(org.T)
    rays = rays.at[3:6, :n].set(dirn.T)
    # Padded lanes keep direction (1,1,1) so 1/a stays finite.
    if n_pad > n:
        rays = rays.at[3:6, n:].set(1.0)

    sph = jnp.zeros((s_pad, 4), jnp.float32)
    sph = sph.at[:s, 0:3].set(centers)
    sph = sph.at[:s, 3].set(radius)  # padded radius 0 => never valid

    grid = (n_pad // RAY_TILE,)
    kernel = functools.partial(
        _kernel,
        n_chunks=s_pad // SPHERE_CHUNK,
        t_min=float(t_min),
        t_max=float(t_max),
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays, sph)
    return t[0, :n], idx[0, :n]


def _prim_kernel(rays_ref, sph_ref, tri_ref, t_ref, idx_ref, *, n_sph_chunks,
                 n_tri_chunks, n_spheres, t_min, t_max, backface_cull):
    """Unified nearest-prim kernel: sphere chunks then triangle chunks.

    Triangle rows in ``tri_ref`` f32[T_pad, 12]: a.xyz, e1.xyz, e2.xyz,
    valid flag, pad, pad.  Winner ids are global prim ids (spheres first),
    matching the scene convention.
    Math: spheres hittable.rs:318-338; triangles (Möller–Trumbore with the
    det < EPS backface cull) hittable.rs:411-461.
    """
    rays = rays_ref[:, :]
    ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a

    r_lanes = rays.shape[1]
    big = 3.0e38
    init = (
        jnp.full((1, r_lanes), big, jnp.float32),
        jnp.full((1, r_lanes), -1, jnp.int32),
    )

    def sphere_chunk(ci, carry):
        best_t, best_i = carry
        sph = sph_ref[pl.ds(ci * SPHERE_CHUNK, SPHERE_CHUNK), :]
        cx, cy, cz, rad = sph[:, 0:1], sph[:, 1:2], sph[:, 2:3], sph[:, 3:4]
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = h * h - a * c
        sd = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (h - sd) * inv_a
        t1 = (h + sd) * inv_a
        t_cand = jnp.where(t0 >= t_min, t0, t1)
        valid = (disc >= 0.0) & (rad > 0.0) & (t_cand >= t_min) & (t_cand < t_max)
        t_cand = jnp.where(valid, t_cand, big)
        cmin = jnp.min(t_cand, axis=0, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 0) + ci * SPHERE_CHUNK
        sel = jnp.min(jnp.where(t_cand == cmin, ids, jnp.int32(2**30)), axis=0, keepdims=True)
        better = cmin < best_t
        return (jnp.where(better, cmin, best_t), jnp.where(better, sel, best_i))

    def tri_chunk(ci, carry):
        best_t, best_i = carry
        tri = tri_ref[pl.ds(ci * TRI_CHUNK, TRI_CHUNK), :]
        ax_, ay_, az_ = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        live = tri[:, 9:10]
        uvx = dy * e2z - dz * e2y
        uvy = dz * e2x - dx * e2z
        uvz = dx * e2y - dy * e2x
        det = e1x * uvx + e1y * uvy + e1z * uvz
        if backface_cull:
            det_ok = det > 1e-7
        else:
            det_ok = jnp.abs(det) > 1e-7
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        aox = ox - ax_
        aoy = oy - ay_
        aoz = oz - az_
        u = (aox * uvx + aoy * uvy + aoz * uvz) * inv_det
        vvx = aoy * e1z - aoz * e1y
        vvy = aoz * e1x - aox * e1z
        vvz = aox * e1y - aoy * e1x
        v = (dx * vvx + dy * vvy + dz * vvz) * inv_det
        t = (e2x * vvx + e2y * vvy + e2z * vvz) * inv_det
        ok = (
            det_ok
            & (live > 0.5)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= t_min)
            & (t < t_max)
            & (t > 1e-7)
        )
        t_cand = jnp.where(ok, t, big)
        cmin = jnp.min(t_cand, axis=0, keepdims=True)
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 0)
            + ci * TRI_CHUNK
            + n_spheres
        )
        sel = jnp.min(jnp.where(t_cand == cmin, ids, jnp.int32(2**30)), axis=0, keepdims=True)
        better = cmin < best_t
        return (jnp.where(better, cmin, best_t), jnp.where(better, sel, best_i))

    carry = jax.lax.fori_loop(0, n_sph_chunks, sphere_chunk, init)
    carry = jax.lax.fori_loop(0, n_tri_chunks, tri_chunk, carry)
    best_t, best_i = carry
    t_ref[0:1, :] = best_t
    idx_ref[0:1, :] = best_i


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "backface_cull", "n_spheres", "interpret"))
def prim_nearest_packed(
    rays: jnp.ndarray,  # f32[8, N]
    sph_packed: jnp.ndarray,  # f32[S_pad, 4]
    tri_packed: jnp.ndarray,  # f32[T_pad, 12]
    n_spheres: int,
    t_min: float,
    t_max: float,
    backface_cull: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest primitive over spheres + triangles in one fused kernel.

    Returns (t f32[N], global prim id i32[N] with -1 = miss)."""
    n = rays.shape[1]
    s_pad = sph_packed.shape[0]
    t_pad = tri_packed.shape[0]
    assert n % RAY_TILE == 0 and s_pad % SPHERE_CHUNK == 0 and t_pad % TRI_CHUNK == 0

    kernel = functools.partial(
        _prim_kernel,
        n_sph_chunks=s_pad // SPHERE_CHUNK,
        n_tri_chunks=t_pad // TRI_CHUNK,
        n_spheres=int(n_spheres),
        t_min=float(t_min),
        t_max=float(t_max),
        backface_cull=bool(backface_cull),
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=(n // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(rays, sph_packed, tri_packed)
    return t[0], idx[0]


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def sphere_nearest_packed(
    rays: jnp.ndarray,  # f32[8, N] (org xyz rows 0-2, dir xyz rows 3-5)
    sph_packed: jnp.ndarray,  # f32[S_pad, 4] (center xyz, radius; pad r=0)
    t_min: float,
    t_max: float,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-copy variant for callers that already keep ray state in the
    kernel layout (the persistent wavefront): no transposes, no padding.
    N must be a multiple of RAY_TILE and S_pad of SPHERE_CHUNK.
    """
    n = rays.shape[1]
    s_pad = sph_packed.shape[0]
    assert n % RAY_TILE == 0 and s_pad % SPHERE_CHUNK == 0

    kernel = functools.partial(
        _kernel,
        n_chunks=s_pad // SPHERE_CHUNK,
        t_min=float(t_min),
        t_max=float(t_max),
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=(n // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(rays, sph_packed)
    return t[0], idx[0]


def available() -> bool:
    """Pallas TPU kernels need a TPU backend (tests use interpret mode)."""
    return jax.default_backend() not in ("cpu",)
