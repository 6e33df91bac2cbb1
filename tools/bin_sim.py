#!/usr/bin/env python
"""Offline (CPU) simulator for clustered-megakernel lane binning designs.

Replays the megakernel's pool dynamics on the blob fixture — claims in
pixel order, brute-force nearest hit, lambertian bounces, RR — then, on
snapshots of the live pool, evaluates SORT KEYS and T-PRUNING schemes by
the number the kernel actually pays: sum over the SUB lane-rows of each
row's entered-cluster union (the sweep visit count per iteration).

This answers "which key / prune would cut blob sweep visits how much"
without a 10-minute TPU compile per variant.

Run CPU-only: JAX_PLATFORMS=cpu python tools/bin_sim.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def load_blob():
    from rt_tpu import scenes
    from tools.gen_fixtures import ensure_fixtures

    fx = ensure_fixtures("/tmp/rt_fixtures")
    scene = scenes.mesh_with_area_light(fx["obj"])
    cam = scenes.cam1(800, 450)
    return scene, cam


def make_tracer(scene):
    """Brute-force nearest-hit over all triangles, jitted on CPU."""
    a = jnp.asarray(scene.tri_a)
    e1 = jnp.asarray(scene.tri_b) - a
    e2 = jnp.asarray(scene.tri_c) - a
    nrm = jnp.asarray(scene.tri_normal)
    mat = jnp.asarray(scene.tri_material)
    mat_kind = jnp.asarray(scene.mat_kind)

    @jax.jit
    def nearest(o, d):
        # o, d: [R, 3] -> t [R], tri id [R]
        def chunk(carry, idx):
            bt, bi = carry
            ac, e1c, e2c = a[idx], e1[idx], e2[idx]
            pv = jnp.cross(d[:, None, :], e2c[None, :, :])
            det = jnp.einsum("cj,rcj->rc", e1c, pv)
            ok = det > 1e-7  # backface-culled like the compat default
            inv = 1.0 / jnp.where(ok, det, 1.0)
            s = o[:, None, :] - ac[None, :, :]
            u = jnp.einsum("rcj,rcj->rc", s, pv) * inv
            q = jnp.cross(s, e1c[None, :, :])
            v = jnp.einsum("rj,rcj->rc", d, q) * inv
            t = jnp.einsum("cj,rcj->rc", e2c, q) * inv
            hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (
                t > 1e-3
            )
            t = jnp.where(hit, t, jnp.inf)
            ci = jnp.argmin(t, axis=1)
            ct = t[jnp.arange(t.shape[0]), ci]
            better = ct < bt
            return (
                jnp.where(better, ct, bt),
                jnp.where(better, idx[ci], bi),
            ), None

        n = a.shape[0]
        C = 4096
        npad = -(-n // C) * C
        idxs = jnp.arange(npad).reshape(-1, C) % n
        (bt, bi), _ = jax.lax.scan(
            chunk,
            (jnp.full(o.shape[0], jnp.inf), jnp.full(o.shape[0], -1)),
            idxs,
        )
        return bt, bi

    return nearest, nrm, mat, mat_kind


def simulate_pool(scene, cam, sub=8, g=128, iters=24, seed=0, snap_at=(6, 12, 20)):
    """Replay the claim/trace/bounce loop; return pool snapshots."""
    rng = np.random.default_rng(seed)
    R = sub * g
    nearest, nrm, mat, mat_kind = make_tracer(scene)

    center = np.asarray(cam.center)
    p00 = np.asarray(cam.pixel00_loc)
    du = np.asarray(cam.pixel_du)
    dv = np.asarray(cam.pixel_dv)
    width = 800
    NP = 8192

    o = np.zeros((R, 3), np.float32)
    d = np.ones((R, 3), np.float32)
    tp = np.zeros((R,), np.float32)  # throughput proxy (max component)
    depth = np.zeros((R,), np.int32)
    active = np.zeros((R,), bool)
    last_cl = np.zeros((R,), np.int32)  # last winner CLUSTER (tri set)
    pix = np.zeros((R,), np.int32)
    next_work = 0

    cl = np.asarray(scene.clusters.tri_cluster)  # [M, 8]
    slot_to_cluster = None  # winner tri id -> cluster id
    slots = np.asarray(scene.clusters.tri_slots)
    # invert: prim id -> slot -> cluster
    slot_ids = None
    # tri_slots is f32[12, Mt_pad*128] packed table; recover prim->cluster
    # via the cluster builder instead:
    from rt_tpu.cluster import build_clusters

    t_lo = np.minimum(
        np.minimum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
        np.asarray(scene.tri_c),
    )
    t_hi = np.maximum(
        np.maximum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
        np.asarray(scene.tri_c),
    )
    slot_of_prim, _, cl_aabb, sup_aabb = build_clusters(t_lo, t_hi)
    prim_cluster = (slot_of_prim // 128).astype(np.int32)
    n_cl = cl_aabb.shape[0]

    snaps = []
    for it in range(iters):
        # claims
        idle = ~active
        n_idle = int(idle.sum())
        take = min(n_idle, max(0, NP * 2 - next_work))
        ids = np.nonzero(idle)[0][:take]
        cw = next_work + np.arange(take)
        next_work += take
        pl = cw & (NP - 1)
        px = pl % width
        py = pl // width
        ju = rng.random(take)
        jv = rng.random(take)
        o[ids] = center
        d[ids] = (
            p00[None, :]
            + (px + ju)[:, None] * du[None, :]
            + (py + jv)[:, None] * dv[None, :]
            - center[None, :]
        )
        tp[ids] = 1.0
        depth[ids] = 0
        active[ids] = True
        last_cl[ids] = -1
        pix[ids] = pl

        # trace all lanes (inactive too, cheap enough)
        bt, bi = jax.device_get(nearest(jnp.asarray(o), jnp.asarray(d)))
        hit = np.isfinite(bt) & active

        if it in snap_at:
            snaps.append(
                dict(
                    o=o.copy(), d=d.copy(), depth=depth.copy(),
                    active=active.copy(), last_cl=last_cl.copy(),
                    pix=pix.copy(), t_hit=bt.copy(),
                )
            )

        # shade: emissive or miss terminates; lambertian bounces
        k = np.asarray(mat_kind)[np.asarray(mat)[np.maximum(bi, 0)]]
        emissive = hit & (k == 4)  # MAT_EMISSIVE? (checked below)
        # treat any non-lambertian as terminate for the sim
        bounce = hit & (k == 0)
        n = np.asarray(nrm)[np.maximum(bi, 0)]
        # flip normal against ray
        flip = (n * d).sum(1) > 0
        n = np.where(flip[:, None], -n, n)
        # cosine hemisphere
        r1 = rng.random(R)
        r2 = rng.random(R)
        phi = 2 * np.pi * r1
        sq = np.sqrt(r2)
        lx = np.cos(phi) * sq
        ly = np.sin(phi) * sq
        lz = np.sqrt(np.maximum(0, 1 - r2))
        up = np.where(np.abs(n[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-9)
        ty = np.cross(n, tx)
        nd = lx[:, None] * tx + ly[:, None] * ty + lz[:, None] * n
        hp = o + bt[:, None] * d
        o = np.where(bounce[:, None], hp + 1e-3 * n, o)
        d = np.where(bounce[:, None], nd, d)
        tp = np.where(bounce, tp * 0.8, tp)
        # RR
        surv = rng.random(R) < np.clip(tp, 0.05, 0.95) ** 0.0  # no RR kill on tp yet
        rrp = np.clip(tp, 0.05, 0.95)
        surv = rng.random(R) < rrp
        keep = bounce & surv & (depth < 50)
        last_cl = np.where(hit, prim_cluster[np.maximum(bi, 0)], last_cl)
        depth = depth + 1
        active = keep

    return snaps, cl_aabb, n_cl


def slab_masks(cl_aabb, o, d, t_hit=None, eps=1e-6):
    """Entered mask [M, R]; optionally pruned by tn <= t_hit."""
    lo = cl_aabb[:, 0:3]
    hi = cl_aabb[:, 3:6]
    invd = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    t0 = (lo[:, None, :] - o[None, :, :]) * invd[None, :, :]
    t1 = (hi[:, None, :] - o[None, :, :]) * invd[None, :, :]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    tn = np.maximum(tn, 0.0)
    tf = tf * (1 + 6e-7) + 1e-6
    m = (tn <= tf) & (tf >= 0)
    if t_hit is not None:
        m &= tn <= (t_hit[None, :] * (1 + 1e-4) + 1e-4)
    return m


def eval_key(order, mask, sub, g, active):
    """Visits = sum over rows of the row's entered-cluster union."""
    m = mask[:, order] & active[None, order]
    tot = 0
    for s in range(sub):
        tot += m[:, s * g : (s + 1) * g].any(axis=1).sum()
    return int(tot)


def leaf_clusters_aabbs(scene, leaf_size):
    """Cluster AABBs for an arbitrary leaf budget (for the leaf sweep)."""
    from rt_tpu.cluster import _leaf_clusters

    t_lo = np.minimum(
        np.minimum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
        np.asarray(scene.tri_c),
    )
    t_hi = np.maximum(
        np.maximum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
        np.asarray(scene.tri_c),
    )
    leaves = _leaf_clusters(t_lo, t_hi, leaf_size)
    m = len(leaves)
    aabb = np.zeros((m, 8), np.float32)
    prim_cluster = np.zeros(t_lo.shape[0], np.int32)
    for ci, ids in enumerate(leaves):
        aabb[ci, 0:3] = t_lo[ids].min(axis=0)
        aabb[ci, 3:6] = t_hi[ids].max(axis=0)
        prim_cluster[ids] = ci
    return aabb, prim_cluster


def row_segments(order, mask, sub, g, active, blocks_per_visit):
    """Packed-visit count: per row, ceil(union / blocks_per_visit)."""
    m = mask[:, order] & active[None, order]
    tot = 0
    for s in range(sub):
        u = int(m[:, s * g : (s + 1) * g].any(axis=1).sum())
        tot += -(-u // blocks_per_visit)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sub", type=int, default=8)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--leafsweep", action="store_true")
    ap.add_argument("--packsweep", action="store_true")
    ap.add_argument("--keysweep", action="store_true")
    ap.add_argument("--expansion", action="store_true")
    args = ap.parse_args()
    sub, g = args.sub, args.g

    t0 = time.time()
    scene, cam = load_blob()
    snaps, cl_aabb, n_cl = simulate_pool(scene, cam, sub=sub, g=g)
    print(f"setup+sim: {time.time()-t0:.1f}s, clusters={n_cl}")

    if args.packsweep:
        # STEP-1 candidates: how to form 128-slot clusters from SAH leaves.
        from rt_tpu.cluster import _leaf_clusters

        t_lo = np.minimum(
            np.minimum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
            np.asarray(scene.tri_c),
        )
        t_hi = np.maximum(
            np.maximum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
            np.asarray(scene.tri_c),
        )

        def sa(lo, hi):
            e = np.maximum(hi - lo, 0)
            return 2 * (e[0] * e[1] + e[1] * e[2] + e[0] * e[2])

        def pack(leaf_budget, mode, cap=0.75):
            leaves = _leaf_clusters(t_lo, t_hi, leaf_budget)
            if mode == "window":  # production today
                dfs = np.concatenate(leaves)
                cls = [dfs[i : i + 128] for i in range(0, len(dfs), 128)]
            elif mode == "leaf":  # one leaf per 128-slot cluster
                cls = leaves
            elif mode == "greedy":  # adjacent leaves while <= 128
                cls, cur = [], []
                n = 0
                for ids in leaves:
                    if n + len(ids) > 128 and cur:
                        cls.append(np.concatenate(cur))
                        cur, n = [], 0
                    cur.append(ids)
                    n += len(ids)
                if cur:
                    cls.append(np.concatenate(cur))
            elif mode == "sacap":  # merge while area growth bounded
                cls = []
                cur = None
                for ids in leaves:
                    llo, lhi = t_lo[ids].min(0), t_hi[ids].max(0)
                    if cur is None:
                        cur, clo, chi = [ids], llo, lhi
                        n = len(ids)
                        continue
                    ulo, uhi = np.minimum(clo, llo), np.maximum(chi, lhi)
                    if n + len(ids) <= 128 and sa(ulo, uhi) <= cap * (
                        sa(clo, chi) + sa(llo, lhi)
                    ):
                        cur.append(ids)
                        clo, chi, n = ulo, uhi, n + len(ids)
                    else:
                        cls.append(np.concatenate(cur))
                        cur, clo, chi, n = [ids], llo, lhi, len(ids)
                if cur:
                    cls.append(np.concatenate(cur))
            m = len(cls)
            aabb = np.zeros((m, 8), np.float32)
            pc = np.zeros(t_lo.shape[0], np.int32)
            for ci, ids in enumerate(cls):
                aabb[ci, 0:3] = t_lo[ids].min(axis=0)
                aabb[ci, 3:6] = t_hi[ids].max(axis=0)
                pc[ids] = ci
            fill = t_lo.shape[0] / (m * 128)
            return aabb, pc, fill

        for mode, lb, cap in (
            ("window", 128, 0), ("leaf", 128, 0),
            ("sacap", 128, 0.7), ("sacap", 128, 0.85), ("sacap", 128, 1.0),
            ("sacap", 64, 0.85), ("sacap", 32, 0.85),
        ):
            aabb, pc, fill = pack(lb, mode, cap)
            mode = f"{mode}{cap}" if mode == "sacap" else mode
            for si, sn in enumerate(snaps):
                act = sn["active"]
                mask = slab_masks(aabb, sn["o"], sn["d"])
                oct_ = (
                    (sn["d"][:, 0] < 0) * 4
                    + (sn["d"][:, 1] < 0) * 2
                    + (sn["d"][:, 2] < 0) * 1
                )
                fresh = sn["depth"] == 0
                # re-key last_cl into THIS clustering via the hit prim
                lc = sn["last_cl"]  # coarse (production) cluster — key
                # proxy only; good enough for ordering
                k = np.where(
                    fresh,
                    np.minimum(sn["pix"] >> 9, 127),
                    128 + np.minimum(lc, 4095) * 8 + oct_,
                )
                k = np.where(act, k, 10**7)
                order = np.argsort(k, kind="stable")
                v = eval_key(order, mask, sub, g, act)
                v0 = eval_key(np.arange(sn["o"].shape[0]), mask, sub, g, act)
                per_ray = mask[:, act].sum(axis=0)
                print(
                    f"{mode}/{lb:3d} snap{si}: M={aabb.shape[0]:5d} "
                    f"fill={fill:.2f} per-ray={per_ray.mean():5.1f} "
                    f"visits sorted={v:6d} unsorted={v0:6d}"
                )
        return

    if args.expansion:
        # Round-5 design validation: 8-item sublane-packed visits.
        # Items = (ray, entered cluster) pairs, sorted by cluster;
        # each visit = 8 consecutive items x one cluster's 128 slots.
        # Occupancy = items of the visit's cluster / 8.
        from rt_tpu.cluster import _leaf_clusters

        t_lo = np.minimum(
            np.minimum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
            np.asarray(scene.tri_c),
        )
        t_hi = np.maximum(
            np.maximum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
            np.asarray(scene.tri_c),
        )
        leaves = _leaf_clusters(t_lo, t_hi, 128)
        m = len(leaves)
        aabb = np.zeros((m, 8), np.float32)
        for ci, ids in enumerate(leaves):
            aabb[ci, 0:3] = t_lo[ids].min(axis=0)
            aabb[ci, 3:6] = t_hi[ids].max(axis=0)
        for si, sn in enumerate(snaps):
            act = sn["active"]
            mask = slab_masks(aabb, sn["o"], sn["d"])  # [M, R]
            mask = mask & act[None, :]
            pairs = int(mask.sum())
            upool = int(mask.any(axis=1).sum())
            percl = mask.sum(axis=1)
            # items sorted by cluster; per-ray cap K (overflow runs the
            # old row-sweep as fallback — count capped pairs only)
            for K in (4, 6, 1 << 30):
                perray = mask.sum(axis=0)
                capped = np.minimum(perray, K)
                # keep the first K clusters per ray
                mk = mask.copy()
                csum = np.cumsum(mk, axis=0)
                mk &= csum <= K
                pc = mk.sum(axis=1)  # items per cluster
                # visits: ceil(items_c / 8) per cluster (sorted runs)
                visits8 = int(np.ceil(pc / 8.0).sum())
                items = int(pc.sum())
                occ = items / max(visits8 * 8, 1)
                over = int((perray > K).sum())
                print(
                    f"snap{si} K={K if K < 1000 else 'inf'}: items={items} "
                    f"U_pool={upool} visits8={visits8} occ={occ:.2f} "
                    f"overflow_rays={over}/{int(act.sum())}"
                )
        return

    if args.keysweep:
        # Key quality on the LEAF clustering (no repacking): what the
        # kernel's rank matrices must support (NB = bins).
        from rt_tpu.cluster import _leaf_clusters

        t_lo = np.minimum(
            np.minimum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
            np.asarray(scene.tri_c),
        )
        t_hi = np.maximum(
            np.maximum(np.asarray(scene.tri_a), np.asarray(scene.tri_b)),
            np.asarray(scene.tri_c),
        )
        leaves = _leaf_clusters(t_lo, t_hi, 128)
        m = len(leaves)
        aabb = np.zeros((m, 8), np.float32)
        pc = np.zeros(t_lo.shape[0], np.int32)
        for ci, ids in enumerate(leaves):
            aabb[ci, 0:3] = t_lo[ids].min(axis=0)
            aabb[ci, 3:6] = t_hi[ids].max(axis=0)
            pc[ids] = ci
        # re-run the pool sim tracking last winner cluster at THIS
        # granularity: approximate by re-deriving from the hit prim —
        # simulate_pool stored last_cl at production granularity, so
        # instead re-map via prim ids is unavailable in snaps; use the
        # ORIGIN position as the spatial key source (kernel could carry
        # either; origin cell == hit point of the previous bounce).
        for si, sn in enumerate(snaps):
            act = sn["active"]
            o, d = sn["o"], sn["d"]
            mask = slab_masks(aabb, o, d)
            oct_ = (d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 1
            fresh = sn["depth"] == 0
            per_ray = mask[:, act].sum(axis=0)

            lob = o.min(axis=0)
            hib = o.max(axis=0)
            ext = np.maximum(hib - lob, 1e-6)

            def qz(bits):
                q = ((o - lob) / ext * (2**bits - 1e-4)).astype(np.int32)
                return np.clip(q, 0, 2**bits - 1)

            def morton(bits):
                q = qz(bits)
                out = np.zeros(o.shape[0], np.int64)
                for b in range(bits):
                    for ax in range(3):
                        out |= ((q[:, ax] >> b) & 1).astype(np.int64) << (
                            3 * b + ax
                        )
                return out

            def mk(kb, nb):
                k = np.where(fresh, np.minimum(sn["pix"] >> 9, 127), 128 + kb)
                k = np.where(act, k, 10**9)
                return np.argsort(k, kind="stable"), nb + 128

            lc = sn["last_cl"]  # production-granularity winner cluster
            ns_tot2 = 18  # ~ supers at leaf granularity
            sup2 = np.where(lc >= 0, lc // 64, 0)
            def key_mixed():
                nbc = 16
                cell = np.where(
                    fresh, np.minimum(sn["pix"] >> 9, nbc - 1),
                    np.clip((sup2 * nbc) // ns_tot2, 0, nbc - 1),
                )
                kk = np.where(act, cell * 8 + oct_, nbc * 8 - 1)
                return np.argsort(kk, kind="stable"), 128
            variants = [
                ("KERNEL-mixed sup16xoct", *key_mixed()),
                ("prodcl16 x oct", *mk(np.clip(lc * 16 // 832, 0, 15) * 8 + oct_, 128)),
                ("prodcl64 x oct", *mk(np.clip(lc * 64 // 832, 0, 63) * 8 + oct_, 512)),
                ("prodcl-full x oct", *mk(np.clip(lc, 0, 831) * 8 + oct_, 832 * 8)),
                ("morton2 x oct (64c)", *mk(morton(2) * 8 + oct_, 512)),
                ("morton3 x oct (512c)", *mk(morton(3) * 8 + oct_, 4096)),
                ("oct x morton3", *mk(oct_ * 512 + morton(3), 4096)),
                ("morton4 x oct", *mk(morton(4) * 8 + oct_, 4096 * 8)),
                ("morton3 only", *mk(morton(3), 512)),
            ]
            print(
                f"\nsnap {si}: per-ray={per_ray.mean():.1f} "
                f"unsorted={eval_key(np.arange(o.shape[0]), mask, sub, g, act)}"
            )
            for name, order, nb in variants:
                v = eval_key(order, mask, sub, g, act)
                print(f"  {name:24s} (NB={nb:5d}): visits={v:6d}")
        return

    if args.leafsweep:
        # Which leaf budget minimizes modeled sweep time when each visit
        # packs 128/L leaf blocks of the SAME row's segment?
        for L in (8, 16, 32, 64, 128):
            aabb, pc = leaf_clusters_aabbs(scene, L)
            bpv = 128 // L
            for si, sn in enumerate(snaps):
                act = sn["active"]
                th = sn["t_hit"]
                mask = slab_masks(aabb, sn["o"], sn["d"])
                maskp = slab_masks(
                    aabb, sn["o"], sn["d"],
                    t_hit=np.where(np.isfinite(th), th, 1e30),
                )
                per_ray_p = maskp[:, act].sum(axis=0)
                # key: last winner cluster at THIS granularity x oct,
                # fresh rays by pixel block, dead lanes last
                lc = pc[np.maximum(0, 0)]  # placeholder; use coarse sort
                oct_ = (
                    (sn["d"][:, 0] < 0) * 4
                    + (sn["d"][:, 1] < 0) * 2
                    + (sn["d"][:, 2] < 0) * 1
                )
                fresh = sn["depth"] == 0
                k = np.where(
                    fresh,
                    np.minimum(sn["pix"] >> 9, 127),
                    128 + np.minimum(sn["last_cl"], 4095) * 8 + oct_,
                )
                k = np.where(act, k, 10**7)
                order = np.argsort(k, kind="stable")
                v = row_segments(order, mask, sub, g, act, bpv)
                vp = row_segments(order, maskp, sub, g, act, bpv)
                print(
                    f"L={L:3d} snap{si}: clusters={aabb.shape[0]:5d} "
                    f"per-ray-pruned={per_ray_p.mean():6.1f} "
                    f"packed-visits={v:6d} (t-pruned {vp:6d}) "
                    f"tests/iter={v * 128 * 128 / 1e6:.1f}M"
                )
        return

    for si, sn in enumerate(snaps):
        o, d, act = sn["o"], sn["d"], sn["active"]
        depth, lc, pix, th = sn["depth"], sn["last_cl"], sn["pix"], sn["t_hit"]
        R = o.shape[0]
        mask = slab_masks(cl_aabb, o, d)
        maskp = slab_masks(cl_aabb, o, d, t_hit=np.where(np.isfinite(th), th, 1e30))
        oct_ = (d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 1
        fresh = depth == 0
        n_act = int(act.sum())
        per_ray = mask[:, act].sum(axis=0)
        per_ray_p = maskp[:, act].sum(axis=0)
        print(
            f"\nsnap {si}: active={n_act}/{R} fresh={int((fresh&act).sum())} "
            f"per-ray entered mean={per_ray.mean():.1f} "
            f"pruned(t_hit)={per_ray_p.mean():.1f}"
        )

        ns_tot = -(-n_cl // 64)
        sup = np.where(lc >= 0, lc // 64, 0)

        def key_current():
            nbc = 16
            cell = np.where(
                fresh, np.minimum(pix >> 9, nbc - 1),
                np.clip((sup * nbc) // max(ns_tot, 1), 0, nbc - 1),
            )
            k = np.where(act, cell * 8 + oct_, nbc * 8 - 1)
            return np.argsort(k, kind="stable")

        def key_sep(nbc=16, octm=False, fine=False):
            spat = (
                np.clip((lc * nbc) // max(n_cl, 1), 0, nbc - 1)
                if fine
                else np.clip((sup * nbc) // max(ns_tot, 1), 0, nbc - 1)
            )
            kb = oct_ * nbc + spat if octm else spat * 8 + oct_
            base = 128
            k = np.where(fresh, np.minimum(pix >> 9, 127), base + kb)
            k = np.where(act, k, 100000)
            return np.argsort(k, kind="stable")

        def key_cluster_only():
            k = np.where(fresh, np.minimum(pix >> 9, 127), 128 + lc)
            k = np.where(act, k, 100000)
            return np.argsort(k, kind="stable")

        def key_cluster_oct():
            k = np.where(fresh, np.minimum(pix >> 9, 127), 128 + lc * 8 + oct_)
            k = np.where(act, k, 10000000)
            return np.argsort(k, kind="stable")

        variants = [
            ("unsorted", np.arange(R)),
            ("current(sup16xoct,mixed)", key_current()),
            ("sep sup16xoct", key_sep(16)),
            ("sep oct x sup16", key_sep(16, octm=True)),
            ("sep cl32xoct", key_sep(32, fine=True)),
            ("sep oct x cl32", key_sep(32, octm=True, fine=True)),
            ("sep cluster-only", key_cluster_only()),
            ("sep cluster x oct", key_cluster_oct()),
        ]
        for name, order in variants:
            v = eval_key(order, mask, sub, g, act)
            vp = eval_key(order, maskp, sub, g, act)
            print(f"  {name:26s}: visits={v:6d}  t-pruned={vp:6d}")


if __name__ == "__main__":
    main()
