"""Persistent-wavefront integrator with ray regeneration.

The naive wavefront (integrator.py) advances one megabatch of rays through
the bounce loop and pays full cost per iteration even when most lanes have
retired — and dielectric lanes (attenuation (1,1,1) => RR p=1,
material.rs:174-177) never retire early, so the loop runs to max_depth with
~1-5% occupancy.  This module is the TPU-native fix, the analog of GPU
"persistent threads" wavefront tracing:

- a fixed-size ray *pool* (static shape B) holds in-flight path segments;
- each ``lax.while_loop`` iteration advances every active lane one bounce;
- lanes that retire (miss -> sky contribution, absorb, RR kill) immediately
  *regenerate*: they claim the next (pixel, sample) work item from a global
  counter, emit a fresh camera ray, and keep the pool full;
- contributions land in a per-work-item buffer via unique-index scatter
  (radiance materializes exactly once per path — at the sky miss), and the
  pixel/sample mean is a dense reduction at the end.

Two implementations share that skeleton:

- the **fast path** (``_render_fast``): ray state packed as f32[16, B]
  component rows, sphere intersection in the fused Pallas kernel
  (pallas_ops.py), shading via the one-hot-matmul parameter fetch and
  scalarized math (fast_shade.py).  Requires scene.shade_table and brute-
  force-sized triangle counts.
- the **generic path** (``_render_generic``): [B,3] arrays and the
  readable geometry/materials modules; handles every scene (BVH meshes,
  exotic textures) and doubles as the correctness reference for the fast
  path.

RNG: the stateless hash generator (rt_tpu/rng.py) keyed on
(seed, work_id, depth, purpose) — per-sample deterministic and independent
of pool size, chunking, or which implementation runs.

Forward-only (the while_loop is not reverse-differentiable); gradients use
integrator.trace_radiance_diff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rt_tpu import fast_shade, materials, rng, sampling, sky
from rt_tpu.camera import Camera
from rt_tpu.config import RenderConfig
from rt_tpu.geometry import nearest_hit
from rt_tpu.scene import SceneData

MAX_FAST_TRIANGLES = 128  # brute-force triangle budget for the fast path


def render_wavefront(
    scene: SceneData,
    camera: Camera,
    pixel_idx: jnp.ndarray,  # i32[P] flattened pixel ids (y * W + x)
    cfg: RenderConfig,
    spp: int,
    sample_offset: jnp.ndarray,
    key: jax.Array,
    pool_size: int = 1 << 16,
) -> jnp.ndarray:
    """Mean radiance per pixel f32[P,3] over ``spp`` samples."""
    fast_ok = scene.shade_table is not None and (
        scene.clusters is not None
        or (scene.num_triangles <= MAX_FAST_TRIANGLES and scene.num_prims <= 4096)
    )
    impl = _render_fast if fast_ok else _render_generic
    return impl(scene, camera, pixel_idx, cfg, spp, sample_offset, key, pool_size)


def _rank_of_idle(idle: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix count of idle lanes: cumsum(idle) - 1.

    A flat 1-D cumsum at pool size measures ~1 ms on v5e; the reshaped
    two-stage form (lane-dim scans of [rows, 128] + a short row scan) is
    ~20x cheaper and exact.
    """
    b = idle.shape[0]
    if b % 128 != 0:
        return jnp.cumsum(idle.astype(jnp.int32)) - 1
    rows = idle.astype(jnp.int32).reshape(b // 128, 128)
    within = jnp.cumsum(rows, axis=1)
    row_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(within[:, -1])[:-1]]
    )
    return (within + row_offsets[:, None]).reshape(-1) - 1


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    """32-bit hash-RNG seed derived from the caller's key so the public
    API stays key-based."""
    return jax.random.key_data(key).reshape(-1)[-1].astype(jnp.uint32)


def _camera_jitter(camera: Camera, cfg: RenderConfig, seed, pix, sample):
    """Sub-pixel Halton jitter (+ optional per-pixel scramble) as rows."""
    off_u, off_v = sampling.halton_pair(sample)
    if not cfg.compat.shared_halton_jitter:
        off_u = jnp.mod(off_u + rng.uniform(seed, pix, 0, 5), 1.0)
        off_v = jnp.mod(off_v + rng.uniform(seed, pix, 0, 6), 1.0)
    return off_u, off_v


# ---------------------------------------------------------------------------
# Fast path: [16, B] row state + Pallas intersection + scalarized shading.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "spp", "pool_size"))
def _render_fast(
    scene: SceneData,
    camera: Camera,
    pixel_idx: jnp.ndarray,
    cfg: RenderConfig,
    spp: int,
    sample_offset: jnp.ndarray,
    key: jax.Array,
    pool_size: int = 1 << 16,
) -> jnp.ndarray:
    from rt_tpu import pallas_ops

    p = pixel_idx.shape[0]
    total_work = p * spp
    b = min(pool_size, max(-(-total_work // 256) * 256, 256))
    width = camera.image_width
    seed = _seed_from_key(key)
    use_pallas = pallas_ops.available()

    # Camera frame as scalar components.
    p00 = camera.pixel00_loc
    du = camera.pixel_du
    dv = camera.pixel_dv
    dku = camera.defocus_disk_u
    dkv = camera.defocus_disk_v
    center = camera.center

    n_global = camera.image_width * camera.image_height

    def camera_rays(work_ids):
        slot = work_ids % p
        sample = (work_ids // p).astype(jnp.int32) + sample_offset
        pix = pixel_idx[jnp.clip(slot, 0, p - 1)]
        # RNG streams key on the *global* (sample, pixel) pair, so renders
        # are invariant to pool size, spp chunking, AND pixel sharding
        # (a device's local work ids don't enter the hash).  int32
        # wrap-around is fine for hashing.
        gwork = sample * n_global + pix
        px = (pix % width).astype(jnp.float32)
        py = (pix // width).astype(jnp.float32)
        off_u, off_v = _camera_jitter(camera, cfg, seed, pix, sample)
        fx = px + off_u
        fy = py + off_v
        sx = p00[0] + fx * du[0] + fy * dv[0]
        sy = p00[1] + fx * du[1] + fy * dv[1]
        sz = p00[2] + fx * du[2] + fy * dv[2]
        # Defocus disk sample (camera.rs:366-371), polar transform; draw
        # indices match rng.in_unit_disc(purpose=7) so both wavefront
        # implementations consume identical streams (c = 3*7 and 3*7+1).
        r = jnp.sqrt(rng.uniform(seed, gwork, 0, 21))
        th = rng.uniform(seed, gwork, 0, 22) * (2.0 * jnp.pi)
        dskx = r * jnp.cos(th)
        dsky = r * jnp.sin(th)
        use_dk = camera.defocus_angle > 0.0
        ox = jnp.where(use_dk, center[0] + dskx * dku[0] + dsky * dkv[0], center[0])
        oy = jnp.where(use_dk, center[1] + dskx * dku[1] + dsky * dkv[1], center[1])
        oz = jnp.where(use_dk, center[2] + dskx * dku[2] + dsky * dkv[2], center[2])
        zeros = jnp.zeros_like(ox)
        rays = jnp.stack([ox, oy, oz, sx - ox, sy - oy, sz - oz, zeros, zeros], 0)
        return rays, slot, gwork

    # Cluster path: winner ids are slot ids into the slot-ordered table.
    use_cluster = use_pallas and scene.clusters is not None
    shade_table = (
        scene.clusters.shade_table if use_cluster else scene.shade_table
    )

    if use_cluster:
        # Scene bounds for ray-sorting keys (from live cluster AABBs).
        cl_ = scene.clusters
        live_s = cl_.sph_cluster[:, 0] <= cl_.sph_cluster[:, 3]
        live_t = cl_.tri_cluster[:, 0] <= cl_.tri_cluster[:, 3]
        mins = jnp.minimum(
            jnp.min(jnp.where(live_s[:, None], cl_.sph_cluster[:, 0:3], jnp.inf), axis=0),
            jnp.min(jnp.where(live_t[:, None], cl_.tri_cluster[:, 0:3], jnp.inf), axis=0),
        )
        maxs = jnp.maximum(
            jnp.max(jnp.where(live_s[:, None], cl_.sph_cluster[:, 3:6], -jnp.inf), axis=0),
            jnp.max(jnp.where(live_t[:, None], cl_.tri_cluster[:, 3:6], -jnp.inf), axis=0),
        )
        inv_ext = 1.0 / jnp.maximum(maxs - mins, 1e-6)

    def sort_pool(rays, tp, work, gid, depth, active):
        """Reorder pool lanes for tile coherence: key = (direction octant,
        8^3 origin Morton-ish cell).  The worklist kernel skips cluster
        chunks only when NO ray in a 256-lane tile enters them, so bounce
        coherence directly multiplies its effectiveness.  Lane order does
        not affect the image (RNG keys on (sample, pixel); claims assign
        the same contiguous work range either way).

        The round-1 form permuted six arrays separately (~5 ms/iter at
        B=64k, perf-neutral overall, ROADMAP item 3); this one bit-packs
        the whole state into ONE [16, B] f32 buffer so the permutation is
        a single gather, and callers additionally amortize via
        ``cfg.sort_every``."""
        oct_ = (
            (rays[3] > 0).astype(jnp.int32) * 4
            + (rays[4] > 0).astype(jnp.int32) * 2
            + (rays[5] > 0).astype(jnp.int32)
        )
        cell = jnp.int32(0)
        for axis in range(3):
            nc = jnp.clip((rays[axis] - mins[axis]) * inv_ext[axis], 0.0, 0.999)
            cell = cell * 32 + (nc * 32.0).astype(jnp.int32)
        key = jnp.where(active, cell * 8 + oct_, jnp.int32(1 << 20))
        perm = jnp.argsort(key)
        as_f32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)[None, :]
        packed = jnp.concatenate(
            [
                rays[0:6],
                tp,
                as_f32(work),
                as_f32(gid),
                as_f32(depth),
                as_f32(active.astype(jnp.int32)),
                jnp.zeros((3, rays.shape[1]), jnp.float32),
            ],
            axis=0,
        )[:, perm]
        as_i32 = lambda r: jax.lax.bitcast_convert_type(r, jnp.int32)
        zeros2 = jnp.zeros((2, rays.shape[1]), jnp.float32)
        return (
            jnp.concatenate([packed[0:6], zeros2], axis=0),
            packed[6:9],
            as_i32(packed[9]),
            as_i32(packed[10]),
            as_i32(packed[11]),
            as_i32(packed[12]) > 0,
        )

    def intersect(rays, n):
        """Returns (t, prim, params|None); params are pre-fetched shade
        columns when the fused kernel ran."""
        if scene.num_spheres + scene.num_triangles == 0:
            return (
                jnp.full((n,), fast_shade.BIG, jnp.float32),
                jnp.full((n,), -1, jnp.int32),
                None,
            )
        if use_cluster:
            # Branchless worklist kernel over each VMEM-sized table page
            # (~10 us per pl.when branch made the predicated variant
            # slower than brute force); per-page winners merge by min-t.
            cl = scene.clusters
            t_best = jnp.full((n,), fast_shade.BIG, jnp.float32)
            slot_best = jnp.full((n,), -1, jnp.int32)
            for page in cl.pages:
                t_p, s_p = pallas_ops.cluster_worklist_nearest(
                    rays,
                    page.sph_super,
                    page.sph_cluster,
                    page.sph_slots,
                    page.tri_super,
                    page.tri_cluster,
                    page.tri_slots,
                    cl.n_sph_slots,
                    cfg.t_min,
                    cfg.t_max,
                    cfg.compat.triangle_backface_cull,
                    sph_slot_base=page.sph_slot_base,
                    tri_slot_base=page.tri_slot_base,
                )
                better = t_p < t_best
                t_best = jnp.where(better, t_p, t_best)
                slot_best = jnp.where(better, s_p, slot_best)
            return t_best, slot_best, None
        if use_pallas:
            # Fused variant also emits the winner's shade-table columns
            # (the XLA one-hot fetch is HBM-bound; in-kernel it is free).
            t_k, id_k, params_k = pallas_ops.prim_nearest_shaded(
                rays,
                scene.sph_packed,
                scene.tri_packed,
                shade_table,
                scene.num_spheres,
                cfg.t_min,
                cfg.t_max,
                cfg.compat.triangle_backface_cull,
            )
            return t_k, id_k, params_k
        # XLA fallback (CPU tests).
        t_s, id_s = (
            fast_shade.sphere_nearest_rows(scene, rays, cfg.t_min, cfg.t_max)
            if scene.num_spheres > 0
            else (jnp.full((n,), fast_shade.BIG), jnp.full((n,), -1, jnp.int32))
        )
        if scene.num_triangles > 0:
            t_t, id_t = fast_shade.triangle_nearest_rows(
                scene, rays, cfg.t_min, cfg.t_max, cfg.compat
            )
            tri_better = t_t < t_s
            t_best = jnp.where(tri_better, t_t, t_s)
            prim = jnp.where(tri_better, id_t + scene.num_spheres, id_s)
            return t_best, jnp.where(t_best < fast_shade.BIG, prim, -1), None
        return t_s, id_s, None

    def bounce(s, claiming: bool):
        """One wavefront iteration; ``claiming`` toggles work regeneration
        (phase 2 drains the pool without new claims)."""
        n = s["rays"].shape[1]
        if claiming:
            idle = ~s["active"]
            rank = _rank_of_idle(idle)
            claim_id = s["next_work"] + rank
            claim = idle & (claim_id < total_work)
            n_claimed = jnp.sum(claim.astype(jnp.int32))
            new_rays, _, new_gid = camera_rays(jnp.maximum(claim_id, 0))
            rays = jnp.where(claim[None, :], new_rays, s["rays"])
            tp = jnp.where(claim[None, :], 1.0, s["tp"])
            work = jnp.where(claim, claim_id, s["work"])
            gid = jnp.where(claim, new_gid, s["gid"])
            depth = jnp.where(claim, 0, s["depth"])
            active = s["active"] | claim
            next_work = s["next_work"] + n_claimed
        else:
            rays, tp = s["rays"], s["tp"]
            work, depth, active = s["work"], s["depth"], s["active"]
            gid = s["gid"]
            next_work = s["next_work"]

        if use_cluster and cfg.sort_rays:
            if cfg.sort_every > 1:
                # Amortized cadence: a real branch (lax.cond) so skipped
                # iterations pay nothing for the argsort + gather.
                rays, tp, work, gid, depth, active = jax.lax.cond(
                    s["it"] % cfg.sort_every == 0,
                    sort_pool,
                    lambda *a: a,
                    rays, tp, work, gid, depth, active,
                )
            else:
                rays, tp, work, gid, depth, active = sort_pool(
                    rays, tp, work, gid, depth, active
                )

        t_best, prim, params = intersect(rays, n)
        out = fast_shade.shade_bounce(
            scene, rays, t_best, prim, seed, gid, depth, cfg,
            table=shade_table, params=params,
        )

        miss = active & ~out["hit"]
        emis = active & out["hit"] & out["emissive"]
        cont = (
            active
            & out["hit"]
            & out["survive"]
            & (depth < cfg.max_depth)
            & ~out["emissive"]
        )

        # Per-channel 1-D deposits (scatter rows of a [W,3] target pay the
        # padded minor-dim tax; three flat scatters don't).  A path deposits
        # at most once: at its sky miss, or at an emissive hit (extension).
        skr, skg, skb = out["sky"]
        emr, emg, emb = out["emit"]
        dep_r = jnp.where(miss, skr, emr)
        dep_g = jnp.where(miss, skg, emg)
        dep_b = jnp.where(miss, skb, emb)
        # Idle lanes all share the out-of-bounds sentinel index, so the
        # indices are NOT unique — JAX's unique_indices contract doesn't
        # exempt dropped writes, so don't claim it.
        deposit_idx = jnp.where(miss | emis, work, total_work)
        acc_r = s["acc_r"].at[deposit_idx].set(tp[0] * dep_r, mode="drop")
        acc_g = s["acc_g"].at[deposit_idx].set(tp[1] * dep_g, mode="drop")
        acc_b = s["acc_b"].at[deposit_idx].set(tp[2] * dep_b, mode="drop")

        ar, ag, ab = out["att"]  # already RR-scaled by 1/p
        tp = jnp.where(
            cont[None, :], jnp.stack([tp[0] * ar, tp[1] * ag, tp[2] * ab], 0), tp
        )
        rays = jnp.where(cont[None, :], out["new_rays"], rays)

        return dict(
            acc_r=acc_r,
            acc_g=acc_g,
            acc_b=acc_b,
            rays=rays,
            tp=tp,
            work=work,
            gid=gid,
            depth=depth + 1,
            active=cont,
            n_active=jnp.sum(cont.astype(jnp.int32)),
            next_work=next_work,
            it=s["it"] + 1,
        )

    # Zeros derived from the (possibly sharded) pixel array: under
    # shard_map, constant-initialized while_loop carries are "unvarying"
    # while the loop outputs vary over the manual axes, which is a type
    # error — seeding every carry from a varying value fixes the types at
    # zero runtime cost.
    zf = 0.0 * pixel_idx[0].astype(jnp.float32)
    zi = 0 * pixel_idx[0]
    init = dict(
        acc_r=jnp.zeros((total_work,), jnp.float32) + zf,
        acc_g=jnp.zeros((total_work,), jnp.float32) + zf,
        acc_b=jnp.zeros((total_work,), jnp.float32) + zf,
        rays=jnp.concatenate(
            [jnp.zeros((3, b), jnp.float32), jnp.ones((5, b), jnp.float32)], axis=0
        )
        + zf,
        tp=jnp.zeros((3, b), jnp.float32) + zf,
        work=jnp.zeros((b,), jnp.int32) + zi,
        gid=jnp.zeros((b,), jnp.int32) + zi,
        depth=jnp.zeros((b,), jnp.int32) + zi,
        active=jnp.zeros((b,), bool) | (zi > 0),
        n_active=jnp.int32(0) + zi,
        next_work=jnp.int32(0) + zi,
        it=jnp.int32(0) + zi,
    )

    tail = 4096
    two_phase = b >= tail * 4

    if two_phase:
        # Phase 1: keep the pool full while work remains; once the queue is
        # drained, keep bouncing only until the survivor count fits the
        # tail pool (straggler paths — deep dielectric chains — would
        # otherwise drag ~full-pool iterations at ~1% occupancy).
        def cond1(s):
            return (s["next_work"] < total_work) | (s["n_active"] > tail)

        state = jax.lax.while_loop(cond1, lambda s: bounce(s, True), init)

        # Compact survivors to the front (actives-first stable order).
        order = jnp.argsort(~state["active"])[:tail]
        small = dict(
            acc_r=state["acc_r"],
            acc_g=state["acc_g"],
            acc_b=state["acc_b"],
            rays=state["rays"][:, order],
            tp=state["tp"][:, order],
            work=state["work"][order],
            gid=state["gid"][order],
            depth=state["depth"][order],
            active=state["active"][order],
            n_active=state["n_active"],
            next_work=state["next_work"],
            it=state["it"],
        )

        def cond2(s):
            return jnp.any(s["active"])

        state = jax.lax.while_loop(cond2, lambda s: bounce(s, False), small)
    else:
        def cond(s):
            return (s["next_work"] < total_work) | jnp.any(s["active"])

        state = jax.lax.while_loop(cond, lambda s: bounce(s, True), init)

    flat = jnp.stack([state["acc_r"], state["acc_g"], state["acc_b"]], axis=-1)
    return jnp.sum(flat.reshape(spp, p, 3), axis=0) / jnp.float32(spp)


# ---------------------------------------------------------------------------
# Generic path: works for every scene; correctness reference.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "spp", "pool_size"))
def _render_generic(
    scene: SceneData,
    camera: Camera,
    pixel_idx: jnp.ndarray,
    cfg: RenderConfig,
    spp: int,
    sample_offset: jnp.ndarray,
    key: jax.Array,
    pool_size: int = 1 << 16,
) -> jnp.ndarray:
    p = pixel_idx.shape[0]
    total_work = p * spp
    b = min(pool_size, max(total_work, 1))
    width = camera.image_width
    seed = _seed_from_key(key)

    n_global = camera.image_width * camera.image_height

    def camera_rays(work_ids):
        slot = work_ids % p
        sample = (work_ids // p).astype(jnp.int32) + sample_offset
        pix = pixel_idx[jnp.clip(slot, 0, p - 1)]
        gwork = sample * n_global + pix  # global (sample, pixel) stream
        px = pix % width
        py = pix // width
        off_u, off_v = _camera_jitter(camera, cfg, seed, pix, sample)
        fx = px.astype(jnp.float32) + off_u
        fy = py.astype(jnp.float32) + off_v
        pixel_sample = (
            camera.pixel00_loc[None, :]
            + fx[:, None] * camera.pixel_du[None, :]
            + fy[:, None] * camera.pixel_dv[None, :]
        )
        disk = rng.in_unit_disc(seed, gwork, 0, 7)
        defocus_origin = (
            camera.center[None, :]
            + disk[:, 0:1] * camera.defocus_disk_u[None, :]
            + disk[:, 1:2] * camera.defocus_disk_v[None, :]
        )
        org = jnp.where(
            camera.defocus_angle > 0.0, defocus_origin, camera.center[None, :]
        )
        return org, pixel_sample - org, gwork

    zf = 0.0 * pixel_idx[0].astype(jnp.float32)  # varying zero (see fast path)
    zi = 0 * pixel_idx[0]
    init = dict(
        accum=jnp.zeros((total_work, 3), jnp.float32) + zf,
        org=jnp.zeros((b, 3), jnp.float32) + zf,
        dirn=jnp.ones((b, 3), jnp.float32) + zf,
        throughput=jnp.zeros((b, 3), jnp.float32) + zf,
        work=jnp.zeros((b,), jnp.int32) + zi,
        gid=jnp.zeros((b,), jnp.int32) + zi,
        depth=jnp.zeros((b,), jnp.int32) + zi,
        active=jnp.zeros((b,), bool) | (zi > 0),
        next_work=jnp.int32(0) + zi,
    )

    def cond(s):
        return (s["next_work"] < total_work) | jnp.any(s["active"])

    def body(s):
        idle = ~s["active"]
        rank = _rank_of_idle(idle)
        claim_id = s["next_work"] + rank
        claim = idle & (claim_id < total_work)
        n_claimed = jnp.sum(claim.astype(jnp.int32))

        new_org, new_dir, new_gid = camera_rays(jnp.maximum(claim_id, 0))
        cm = claim[:, None]
        org = jnp.where(cm, new_org, s["org"])
        dirn = jnp.where(cm, new_dir, s["dirn"])
        throughput = jnp.where(cm, 1.0, s["throughput"])
        work = jnp.where(claim, claim_id, s["work"])
        gid = jnp.where(claim, new_gid, s["gid"])
        depth = jnp.where(claim, 0, s["depth"])
        active = s["active"] | claim

        rec = nearest_hit(
            scene, org, dirn, cfg.t_min, cfg.t_max, cfg.compat, impl="pallas"
        )

        unit_dir = dirn / jnp.maximum(
            jnp.linalg.norm(dirn, axis=-1, keepdims=True), 1e-20
        )
        sky_rgb = sky.sky_color_toward(scene.sky, unit_dir)
        miss = active & ~rec.hit

        # Emissive hits terminate with a deposit (extension; MAT_EMISSIVE).
        from rt_tpu.textures import texture_value

        mat_id = jnp.clip(rec.material, 0, scene.mat_kind.shape[0] - 1)
        is_emissive = scene.mat_kind[mat_id] == 3
        emis = active & rec.hit & is_emissive
        emit_rgb = texture_value(scene, scene.mat_texture[mat_id], rec.uv, rec.point)

        attenuation, new_bounce_dir = materials.scatter_hashed(
            scene, rec, dirn, seed, gid, depth, cfg.compat
        )
        rr_p = jnp.clip(jnp.max(attenuation, axis=-1), 0.0, cfg.compat.rr_clamp)
        survive = rng.uniform(seed, gid, depth, 10) < rr_p
        cont = active & rec.hit & survive & (depth < cfg.max_depth) & ~is_emissive

        contribution = throughput * jnp.where(miss[:, None], sky_rgb, emit_rgb)
        deposit_idx = jnp.where(miss | emis, work, total_work)
        accum = s["accum"].at[deposit_idx].set(contribution, mode="drop")

        throughput = jnp.where(
            cont[:, None],
            throughput * attenuation / jnp.maximum(rr_p, 1e-12)[:, None],
            throughput,
        )
        point_scale = jnp.maximum(
            jnp.max(jnp.abs(rec.point), axis=-1, keepdims=True), 1.0
        )
        side = jnp.sign(jnp.sum(new_bounce_dir * rec.normal, axis=-1, keepdims=True))
        new_org2 = rec.point + cfg.origin_offset * point_scale * side * rec.normal

        return dict(
            accum=accum,
            org=jnp.where(cont[:, None], new_org2, org),
            dirn=jnp.where(cont[:, None], new_bounce_dir, dirn),
            throughput=throughput,
            work=work,
            gid=gid,
            depth=depth + 1,
            active=cont,
            next_work=s["next_work"] + n_claimed,
        )

    state = jax.lax.while_loop(cond, body, init)
    return jnp.sum(state["accum"].reshape(spp, p, 3), axis=0) / jnp.float32(spp)
