"""Persistent megakernel: the whole bounce loop in ONE Pallas call.

Round-1 architecture ran two device programs per bounce (intersection
kernel + XLA-fused shading/RR/claims/deposits) and measured ~2.1 ms of
XLA-side stitching per wavefront iteration against ~1.35 ms of kernel —
a hard ceiling of ~24 Mray/s on the cover bench (ROADMAP.md).  This module
deletes the stitching: claims, camera-ray regeneration, Halton jitter,
intersection, shading, Russian roulette and radiance deposits all execute
inside a single ``pallas_call`` whose state lives in VMEM across bounce
iterations.  HBM traffic per frame is the scene tables in + one radiance
image out.

Reference analog: the whole of ``Camera::render_pixel`` + ``World::hit``
(camera.rs:266-313, hittable.rs:58-93) — here as one persistent TPU
program per pixel tile instead of one rayon task per pixel.

Design (see also fast_shade.py, whose scalarized math this ports):

- the grid is ``n_pixels / NP`` tiles; each grid program OWNS a
  contiguous range of NP pixels and integrates all ``spp`` samples for
  them with a persistent pool of R ray lanes (claims + regeneration keep
  the pool full until the tile's work queue drains);
- work claims use a branchless prefix-sum over lanes (lower-triangular
  one-hot matmul on the MXU — Mosaic has no cumsum lowering);
- sphere intersection offloads its dot products to the MXU
  (``[C,3] @ [3,R]``); the remaining quadratic/select math is VPU
  elementwise, and the (t, prim-id) argmin packs the candidate id into
  the low mantissa bits of t so ONE i32 min-reduction resolves both
  (the ≤2^-14 relative t truncation is far below the scale-aware ray
  offset; an exact two-reduction variant exists for parity tests);
- radiance deposits accumulate into a per-tile VMEM image via a
  rank-1-factorized one-hot (pixel = q*256 + r: ``E_q[NQ,R]`` and
  ``E_r[256,R]`` outer-product matmuls), so NO scatter ever touches HBM;
- the RNG is the same counter-based murmur hash as rng.py keyed on the
  global (sample, pixel) work id, so images agree with the two-program
  wavefront up to f32 summation order.

Eligibility (callers fall back to wavefront.py otherwise): flat
brute-force scene (shade_table present, prims <= 4096), no image
textures (the atlas fetch is the one true gather on the path), and a
contiguous pixel range.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_tpu import sky as sky_mod
from rt_tpu.camera import Camera
from rt_tpu.cluster import CLUSTER_SLOTS, SUPER_SLOTS
from rt_tpu.config import RenderConfig
from rt_tpu.scene import SceneData
from rt_tpu import fast_shade

BIG = np.float32(3.0e38)
# BIG with the low 7 mantissa bits cleared — the miss sentinel of the
# clustered sweep's packed (t | local-slot) keys.  Comparisons must use
# this truncated value: a missed chunk's min key unpacks to exactly it,
# which is strictly LESS than BIG.
BIG_TRUNC = np.array(int(np.float32(BIG).view(np.int32)) & ~127, np.int32).view(
    np.float32
)[()]

# Default pool geometry (overridable for tests/tuning).  Swept on v5e
# (2026-08-17, 400x225@10spp cover, tools/mega_perf.py): with the packed
# (SUB, G) state layout and the hierarchical claim scan, R=2048/sub=8
# won at 6.7 ns per lane-bounce (vs 12.3 for round-1's (1, R) rows at
# R=512) — G=256 keeps every elementwise op on full (8, 128)+ vregs and
# the [G,G]+[SUB,SUB] scan replaces the old [R,R] VMEM hog.
LANES = 2048  # ray lanes per grid program (pool size per tile)
CLUSTER_LANES = 1024  # clustered-mode pool (smaller footprint, see below)
SUBROWS = 8  # state rows per pool: lanes pack as (SUBROWS, lanes//SUBROWS)
TILE_PIXELS = 8192  # pixels owned per grid program (multiple of 256)
SPHERE_CHUNK = 128
TRI_CHUNK = 64  # tri_packed is padded to 64 rows (scene.py)

# f32 scalar-param row layout (SMEM input).
_P_PIX00 = 0  # 3
_P_DU = 3  # 3
_P_DV = 6  # 3
_P_DKU = 9  # 3
_P_DKV = 12  # 3
_P_CENTER = 15  # 3
_P_SUN = 18  # 3
_P_COEF_Y = 21  # 5
_P_COEF_X = 26  # 5
_P_COEF_YC = 31  # 5
_P_ZY = 36  # zenith_y / den_y * exposure
_P_ZX = 37  # zenith_x / den_x
_P_ZYC = 38  # zenith_yc / den_yc
_P_HW = 40  # Hosek-Wilkie per-channel (A..I, scale*exposure): 40..69
_P_F32_LEN = 72

_PI_SEED = 0
_PI_SAMPLE_OFF = 1
_PI_PIX_BASE = 2
_PI_I32_LEN = 4

_INV_24 = np.float32(5.9604645e-8)  # 2^-24, matches rng.uniform
_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35
_WEYL = 0x9E3779B9

# Uncharted2 constants (color.py / the reference's tonemap).
_TM_A, _TM_B, _TM_C = 0.15, 0.50, 0.10
_TM_D, _TM_E, _TM_F = 0.20, 0.02, 0.30


def _chunk_plan(n_real, pad_total, step):
    """Flat-sweep chunk plan: full `step`-sized chunks plus an 8-multiple
    tail covering only the real prims (tables are padded to `pad_total`
    rows)."""
    if not n_real or not pad_total:
        return []
    full = n_real // step
    plan = [(i * step, step) for i in range(full)]
    rem = n_real - full * step
    if rem:
        tail = min(max(-(-rem // 8) * 8, 8), pad_total - full * step)
        plan.append((full * step, tail))
    return plan


def _u2(x):
    a, b, c, d, e, f = _TM_A, _TM_B, _TM_C, _TM_D, _TM_E, _TM_F
    return (x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f) - e / f


_WHITE_SCALE = float(1.0 / _u2(11.2))


def _u2f(x_u32):
    """u32 (< 2^31) -> f32; Mosaic lacks a direct uint32->float32 cast."""
    return pltpu.bitcast(x_u32, jnp.int32).astype(jnp.float32)


def _mix(x):
    """murmur3 fmix32 on u32 vectors (rng.mix parity)."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_M1)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_M2)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _hash_u32(seed, a, b, c):
    """rng.hash_u32 parity (seed scalar u32; a,b,c broadcastable u32)."""
    w = jnp.uint32(_WEYL)
    h = _mix(seed + w * jnp.uint32(1))
    h = _mix(h ^ (a + w * jnp.uint32(2)))
    h = _mix(h ^ (b + w * jnp.uint32(3)))
    h = _mix(h ^ (c + w * jnp.uint32(4)))
    return h


def _uniform(seed, a, b, c):
    bits = _hash_u32(seed, a.astype(jnp.uint32), b.astype(jnp.uint32), jnp.uint32(c))
    return _u2f(bits >> jnp.uint32(8)) * _INV_24


def _radical2(pos_u32):
    """Base-2 radical inverse = 32-bit reversal (sampling.py parity)."""
    i = pos_u32
    i = ((i >> jnp.uint32(16)) | (i << jnp.uint32(16))) & jnp.uint32(0xFFFFFFFF)
    i = ((i & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | (
        (i & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)
    )
    i = ((i & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | (
        (i & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)
    )
    i = ((i & jnp.uint32(0x33333333)) << jnp.uint32(2)) | (
        (i & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)
    )
    i = ((i & jnp.uint32(0x55555555)) << jnp.uint32(1)) | (
        (i & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)
    )
    # Split u32 -> f32 via two exact 24-bit converts (full-width u32->f32
    # conversion semantics differ across Mosaic versions).
    hi = _u2f((i >> jnp.uint32(8)) & jnp.uint32(0xFFFFFF))
    lo = _u2f(i & jnp.uint32(0xFF))
    return hi * np.float32(2.0**-24) + lo * np.float32(2.0**-32)


def _radical3(pos_u32):
    """Base-3 radical inverse via an exact f32 digit loop.

    Valid for pos < 2^20 (progressive spp tops out at ~41k): an f32
    divide-by-3 with the +0.5 guard floors to the exact quotient there.
    Accumulation order matches sampling.radical_inverse(3, .) bit for bit.
    """
    idx = _u2f(pos_u32)
    result = jnp.zeros_like(idx)
    s1 = jnp.full_like(idx, np.float32(1.0 / 3.0))
    # Two base-3 digits per step (7 base-9 steps instead of 13 serial
    # base-3 steps — the dependency chain is what the VPU waits on);
    # the partial-sum sequence matches the base-3 loop bit for bit.
    for _ in range(7):  # 9^7 > 2^20
        q = jnp.floor((idx + 0.5) * np.float32(1.0 / 9.0))
        d = idx - 9.0 * q
        d1 = jnp.floor((d + 0.5) * np.float32(1.0 / 3.0))
        d0 = d - 3.0 * d1
        s2 = s1 * np.float32(1.0 / 3.0)
        result = (result + d0 * s1) + d1 * s2
        s1 = s2 * np.float32(1.0 / 3.0)
        idx = q
    return result


def _atan(x):
    """atan for |x| <= 1 via a degree-13 odd minimax polynomial
    (|err| ~ 1e-7 rad)."""
    x2 = x * x
    p = np.float32(-0.0117212)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262348, 0.99997726):
        p = p * x2 + np.float32(c)
    return x * p


def _atan2(y, x):
    """Full-quadrant atan2 (Mosaic has no lowering).  Matches jnp.arctan2
    conventions away from the axes; inputs of exactly (0, 0) return 0."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    r = lo / jnp.maximum(hi, 1e-30)
    base = _atan(r)
    base = jnp.where(ay > ax, np.float32(np.pi / 2.0) - base, base)
    base = jnp.where(x < 0.0, np.float32(np.pi) - base, base)
    return jnp.where(y < 0.0, -base, base)


def _acos(x):
    """arccos via the A&S 4.4.46 7-term polynomial (|err| <= 2e-8 rad);
    Mosaic has no acos lowering.  Input must be within [-1, 1]."""
    ax = jnp.abs(x)
    p = np.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + np.float32(c)
    r = p * jnp.sqrt(jnp.maximum(1.0 - ax, 0.0))
    return jnp.where(x < 0.0, np.float32(np.pi) - r, r)


def _sincos(x):
    """(sin, cos) for x in [0, 2*pi) via degree-6 Chebyshev-style minimax
    on cos over [-pi/4, pi/4] + quadrant folding (|err| ~ 1e-7)."""
    two_over_pi = np.float32(2.0 / np.pi)
    k = jnp.floor(x * two_over_pi + 0.5)
    # Payne-Hanek not needed: x < 2*pi.
    r = x - k * np.float32(np.pi / 2.0)
    k = k.astype(jnp.int32) & 3
    r2 = r * r
    # cos(r), sin(r) on [-pi/4, pi/4]
    c = np.float32(-2.605e-07)
    for cc in (2.47609e-05, -1.3888397e-03, 4.16666418e-02, -4.999999963e-01, 1.0):
        c = c * r2 + np.float32(cc)
    s = np.float32(-2.50507e-08)
    for cc in (2.7526094e-06, -1.9840874e-04, 8.33333187e-03, -1.66666666e-01, 1.0):
        s = s * r2 + np.float32(cc)
    s = s * r
    k0 = k == 0
    k1 = k == 1
    k2 = k == 2
    sin = jnp.where(k0, s, jnp.where(k1, c, jnp.where(k2, -s, -c)))
    cos = jnp.where(k0, c, jnp.where(k1, -s, jnp.where(k2, -c, s)))
    return sin, cos


def _perez(coef_ref, base, cos_theta, gamma, cos_gamma):
    a = coef_ref[0, base + 0]
    b = coef_ref[0, base + 1]
    c = coef_ref[0, base + 2]
    d = coef_ref[0, base + 3]
    e = coef_ref[0, base + 4]
    return (1.0 + a * jnp.exp(b / jnp.maximum(cos_theta, 0.01))) * (
        1.0 + c * jnp.exp(d * gamma) + e * cos_gamma * cos_gamma
    )


def _mega_kernel(
    *refs,
    # Ref layout (flat mode, clustered=False):
    #   pf, pi, sph[S_pad,4], tri[T_pad,12], table[2F,P_pad], atlas,
    #   out, iters, sf, si, acc
    # Ref layout (clustered=True):
    #   pf, pi, ssup[Ss_pad,8], scl[Ms_pad,8], sslots[Ms_pad*128,4],
    #   tsup[St_pad,8], tcl[Mt_pad,8], tslots[Mt_pad*128,12],
    #   shade_hbm[2F, slots_pad] (ANY), atlas,
    #   out, iters, sf, si, acc, feat_scr[SUB*F,G], wl_vmem[WS,128],
    #   wl_smem[WS,128], sup_vmem[1,WS], sup_smem[1,WS],
    #   slice_vmem[2F,128], dma_sem
    lanes,
    sub,
    tile_pixels,
    spp,
    width,
    n_global,
    n_spheres,
    n_sph_chunks,
    n_tri_chunks,
    p_pad,
    max_depth,
    t_min,
    t_max,
    origin_offset,
    rr_clamp,
    backface_cull,
    shared_halton_jitter,
    use_defocus,
    cos_gamma_as_angle,
    packed_select,
    has_images,
    atlas_h,
    uv_bbox_remap,
    sky_model,
    ablate,
    clustered=False,
    f_rows=0,
    inline_shade=False,
    n_tris=0,
    spp_major=False,
    row_groups=1,
    stream_slots=False,
    bin_lanes=False,
    expand_sweep=False,
):
    if clustered:
        (
            pf_ref, pi_ref,
            ssup_ref, scl_ref, sslots_ref, tsup_ref, tcl_ref, tslots_ref,
            shade_hbm_ref, chk_ref, atlas_ref,
            out_ref, iters_ref,
            sf, si, acc,
            feat_scr, rays_scr, wl_vmem, wl_smem, sup_vmem, sup_smem,
            slice_vmem, dma_sem, fetch_sems, stream_vmem, stream_sems,
            exp_rays_t, exp_rid_planes, exp_meta_v, exp_vis_v, exp_res_v,
            exp_resrow_v, exp_dst, exp_best_v, exp_ovf_v,
            exp_meta_s, exp_vis_s, exp_res_s, exp_best_s,
        ) = refs
        table_ref = None
    else:
        (
            pf_ref, pi_ref, sph_ref, tri_ref, table_ref, atlas_ref,
            out_ref, iters_ref, sf, si, acc,
        ) = refs
    R = lanes
    SUB = sub
    G = R // SUB
    NP = tile_pixels
    NQ = NP // 256
    NQP = max(-(-NQ // 8) * 8, 8)  # Mosaic block rows must divide by 8
    log2np = int(np.log2(NP))
    assert 1 << log2np == NP
    assert SUB * G == R
    total_work = NP * spp
    f32 = jnp.float32

    tile = pl.program_id(0)
    seed = pi_ref[0, _PI_SEED].astype(jnp.uint32)
    sample_off = pi_ref[0, _PI_SAMPLE_OFF]
    pix_base = pi_ref[0, _PI_PIX_BASE] + tile * NP

    # --- loop-invariant matrices -------------------------------------------
    # Lane order for work claims is s*G + g (row-major over the SUB state
    # rows).  The prefix sum over lanes is hierarchical: a [G,G] matmul
    # scans within each row, an [SUB,SUB] strict-lower matmul adds the
    # preceding rows' totals — this replaces round-1's [R,R] matrix, whose
    # O(R^2) MACs and VMEM footprint (4 MB at R=1024) were what made large
    # pools regress.
    ltg = (
        jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    ).astype(f32)  # LTG[l, j] = l <= j : row @ LTG = inclusive prefix
    lt_sub = (
        jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    ).astype(f32)  # strict lower: row s sums rows < s
    er_iota = jax.lax.broadcasted_iota(jnp.int32, (256, G), 0)
    eq_iota = jax.lax.broadcasted_iota(jnp.int32, (NQP, G), 0)
    if clustered:
        # [p_pad, G] one-hots are impossible at clustered slot counts; the
        # shade fetch DMAs winner clusters instead (see _winner_fetch).
        cid_iota = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_SLOTS, G), 0)
    else:
        oh_iota = jax.lax.broadcasted_iota(jnp.int32, (p_pad, G), 0)
        sid_iota = jax.lax.broadcasted_iota(jnp.int32, (SPHERE_CHUNK, G), 0)
        tid_iota = jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, G), 0)
    if has_images:
        ah_iota = jax.lax.broadcasted_iota(jnp.int32, (atlas_h, G), 0)
        aw_iota = jax.lax.broadcasted_iota(
            jnp.int32, (atlas_ref.shape[1] // 3, G), 0
        )

    id_bits = max(int(np.ceil(np.log2(max(p_pad, 2)))), 1)
    id_mask = (1 << id_bits) - 1
    big_key = (int(np.float32(BIG).view(np.int32)) & ~id_mask) if True else 0

    # Per-lane state lives as (SUB, G) blocks — with SUB=8, G>=128 every
    # elementwise op runs on fully packed (8,128) vregs instead of round
    # 1's (1,R) rows that used 1 of 8 sublanes (an 8x VPU waste across the
    # shade/camera/RNG/sky sections).
    def SF(r):
        return sf[r * SUB : (r + 1) * SUB, :]

    def SI(r):
        return si[r * SUB : (r + 1) * SUB, :]

    # --- state init --------------------------------------------------------
    sf[:, :] = jnp.zeros((16 * SUB, G), f32)
    sf[3 * SUB : 6 * SUB, :] = jnp.ones((3 * SUB, G), f32)  # dirs: 1/a finite
    si[:, :] = jnp.zeros((8 * SUB, G), jnp.int32)
    acc[:, :] = jnp.zeros((3 * NQP, 256), f32)

    # --- camera / sky scalars ---------------------------------------------
    p00x, p00y, p00z = pf_ref[0, _P_PIX00], pf_ref[0, _P_PIX00 + 1], pf_ref[0, _P_PIX00 + 2]
    dux, duy, duz = pf_ref[0, _P_DU], pf_ref[0, _P_DU + 1], pf_ref[0, _P_DU + 2]
    dvx, dvy, dvz = pf_ref[0, _P_DV], pf_ref[0, _P_DV + 1], pf_ref[0, _P_DV + 2]
    dkux, dkuy, dkuz = pf_ref[0, _P_DKU], pf_ref[0, _P_DKU + 1], pf_ref[0, _P_DKU + 2]
    dkvx, dkvy, dkvz = pf_ref[0, _P_DKV], pf_ref[0, _P_DKV + 1], pf_ref[0, _P_DKV + 2]
    cx_, cy_, cz_ = pf_ref[0, _P_CENTER], pf_ref[0, _P_CENTER + 1], pf_ref[0, _P_CENTER + 2]
    sunx, suny, sunz = pf_ref[0, _P_SUN], pf_ref[0, _P_SUN + 1], pf_ref[0, _P_SUN + 2]
    zy, zx, zyc = pf_ref[0, _P_ZY], pf_ref[0, _P_ZX], pf_ref[0, _P_ZYC]

    def make_div_mod(d):
        """(v // d, v % d) via exact-f32 division + correction."""
        inv_d = np.float32(1.0 / d)

        def div_mod(v):
            vf = v.astype(f32)
            q = jnp.floor(vf * inv_d).astype(jnp.int32)
            r = v - q * d
            under = r < 0
            q = jnp.where(under, q - 1, q)
            r = jnp.where(under, r + d, r)
            over = r >= d
            q = jnp.where(over, q + 1, q)
            r = jnp.where(over, r - d, r)
            return q, r

        return div_mod

    div_mod_width = make_div_mod(width)
    div_mod_spp = make_div_mod(spp)

    def body(carry):
        next_work, _, it = carry

        # ---- claims -------------------------------------------------------
        active = SI(2) > 0
        idle = ~active
        if "noclaims" in ablate:  # timing ablation: skip the rank scan
            # (wrong ranks — lane iota stands in for the idle prefix count)
            incl = (
                jax.lax.broadcasted_iota(jnp.int32, (SUB, G), 0) * G
                + jax.lax.broadcasted_iota(jnp.int32, (SUB, G), 1)
            ).astype(f32) + 1.0
        else:
            # Default precision is fine HERE: operands are exact small ints
            # (bf16 representable) and the MXU accumulates in f32.
            incl_row = jnp.dot(
                jnp.where(idle, 1.0, 0.0), ltg, preferred_element_type=f32
            )  # (SUB,G) inclusive idle count within each state row
            row_tot = incl_row[:, G - 1 : G]  # (SUB,1) per-row totals
            row_off = jnp.dot(
                lt_sub, row_tot, preferred_element_type=f32
            )  # (SUB,1) totals of preceding rows
            incl = incl_row + row_off
        claim_id = next_work + incl.astype(jnp.int32) - 1
        claim = idle & (claim_id < total_work)
        n_claimed = jnp.sum(jnp.where(claim, 1, 0))
        cw = jnp.maximum(claim_id, 0)

        if spp_major:
            # Sample-major work order: a pool refill claims ~R/spp
            # CONTIGUOUS PIXELS x all their samples instead of R pixels of
            # one sample — a 4x tighter primary footprint for the
            # clustered mode's entered-cluster culling.  gwork (the RNG
            # key) is unchanged, so images agree up to f32 sum order.
            pix_l, samp_l = div_mod_spp(cw)
            samp = samp_l + sample_off
        else:
            pix_l = cw & (NP - 1)
            samp = (cw >> log2np) + sample_off
        pix = pix_base + pix_l
        gwork = samp * n_global + pix

        # Halton jitter (sampling.halton_pair parity: 1-based position).
        posu = (samp + 1).astype(jnp.uint32)
        if "nocamera" in ablate:  # timing ablation: constant jitter/sample
            off_u = jnp.full((SUB, G), 0.25, f32)
            off_v = jnp.full((SUB, G), 0.75, f32)
        else:
            off_u = _radical2(posu)
            off_v = _radical3(posu)
        if "nocamera" in ablate:
            pass
        elif not shared_halton_jitter:
            su = _uniform(seed, pix, jnp.zeros_like(pix), 5)
            sv = _uniform(seed, pix, jnp.zeros_like(pix), 6)
            off_u = off_u + su
            off_u = off_u - jnp.floor(off_u)
            off_v = off_v + sv
            off_v = off_v - jnp.floor(off_v)

        py_i, px_i = div_mod_width(pix)
        fx = px_i.astype(f32) + off_u
        fy = py_i.astype(f32) + off_v
        sx = p00x + fx * dux + fy * dvx
        sy = p00y + fx * duy + fy * dvy
        sz = p00z + fx * duz + fy * dvz
        if use_defocus:
            r_d = jnp.sqrt(_uniform(seed, gwork, jnp.zeros_like(pix), 21))
            th = _uniform(seed, gwork, jnp.zeros_like(pix), 22) * np.float32(2.0 * np.pi)
            sth, cth = _sincos(th)
            dskx = r_d * cth
            dsky = r_d * sth
            nox = cx_ + dskx * dkux + dsky * dkvx
            noy = cy_ + dskx * dkuy + dsky * dkvy
            noz = cz_ + dskx * dkuz + dsky * dkvz
        else:
            nox = jnp.full_like(sx, 0.0) + cx_
            noy = jnp.full_like(sx, 0.0) + cy_
            noz = jnp.full_like(sx, 0.0) + cz_

        cm = claim
        ox = jnp.where(cm, nox, SF(0))
        oy = jnp.where(cm, noy, SF(1))
        oz = jnp.where(cm, noz, SF(2))
        dx = jnp.where(cm, sx - nox, SF(3))
        dy = jnp.where(cm, sy - noy, SF(4))
        dz = jnp.where(cm, sz - noz, SF(5))
        tpr = jnp.where(cm, 1.0, SF(8))
        tpg = jnp.where(cm, 1.0, SF(9))
        tpb = jnp.where(cm, 1.0, SF(10))
        gid = jnp.where(cm, gwork, SI(0))
        depth = jnp.where(cm, 0, SI(1))
        active = active | claim
        pixl_s = jnp.where(cm, pix_l, SI(3))

        # ---- lane binning (clustered mode) ---------------------------------
        # Counting-sort the pool by direction octant x origin cell each
        # iteration.  Bounce rays are per-LANE incoherent on closed meshes
        # (the pool's entered-cluster union covers ~90% of a blob after one
        # bounce, ROADMAP), and lane-row GROUPING only helps if rows are
        # internally coherent.  Sorting makes every state row a bundle of
        # same-direction, same-region rays, which is what the reference's
        # per-ray BVH walk (hittable.rs:135-149) gets for free.
        #
        # All-matmul, no gathers: (1) stable rank via per-row bin one-hots
        # + the claim scan's prefix matrices; (2) the permutation applied
        # as SUB dot_generals [V, SUB*G] @ [G, SUB*G]^T against dst-row
        # one-hot blocks.  State crosses the MXU as 16-bit integer halves:
        # a HIGHEST one-hot matmul carries ints < 2^16 to within +-0.25
        # (see winner_fetch), so the permutation is BIT-exact and images
        # are unchanged up to the f32 deposit summation order.
        if clustered and bin_lanes and "nobin" not in ablate:
            # Spatial key: the lane's LAST WINNER SUPER (carried in si row
            # 4) — true geometric locality that no origin-bbox quantization
            # gets (a huge ground plane swamps pool min/max bounds; the
            # midpoint-cell variant measured NO union reduction on blobs).
            # Fresh camera lanes (depth 0) key by screen block instead —
            # primary rays are coherent in pixel order.
            NBC = 16  # spatial buckets
            NB = NBC * 8  # x 8 direction octants
            ms_pad_b = scl_ref.shape[0]
            mt_pad_b = tcl_ref.shape[0]
            ns_tot_b = max((ms_pad_b + mt_pad_b) // SUPER_SLOTS, 1)
            oct_b = (
                jnp.where(dx < 0.0, 4, 0)
                + jnp.where(dy < 0.0, 2, 0)
                + jnp.where(dz < 0.0, 1, 0)
            )
            last_sup = SI(4)
            sup_bucket = jnp.floor(
                last_sup.astype(f32) * np.float32(NBC / ns_tot_b)
            ).astype(jnp.int32)
            pix_bucket = pixl_s >> max(log2np - 4, 0)
            cell_b = jnp.clip(
                jnp.where(depth == 0, pix_bucket, sup_bucket), 0, NBC - 1
            )
            bin_b = jnp.where(active, cell_b * 8 + oct_b, NB - 1)

            # Stable rank: C_less(bin) + same-bin count in earlier rows +
            # inclusive same-bin prefix within the row - 1.
            nb_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, G), 0)
            lt_nb = (
                jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
                < jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
            ).astype(f32)
            hp = jax.lax.Precision.HIGHEST
            ddc = (((0,), (0,)), ((), ()))
            ohs_b, owns_b, cnts_b = [], [], []
            for s in range(SUB):
                oh = (nb_iota == bin_b[s : s + 1, :]).astype(f32)  # [NB,G]
                incl = jnp.dot(oh, ltg, preferred_element_type=f32)
                ohs_b.append(oh)
                owns_b.append(jnp.sum(oh * incl, axis=0, keepdims=True))
                cnts_b.append(incl[:, G - 1 : G])  # [NB,1] row totals
            cnt_all = cnts_b[0]
            for c in cnts_b[1:]:
                cnt_all = cnt_all + c
            # counts reach R > 2^8: HIGHEST keeps them exact on the MXU
            run = jnp.dot(
                lt_nb, cnt_all, preferred_element_type=f32, precision=hp
            )  # [NB,1] = C_less
            rank_rows = []
            for s in range(SUB):
                off_lane = jax.lax.dot_general(
                    run, ohs_b[s], ddc, preferred_element_type=f32,
                    precision=hp,
                )  # [1,G] per-lane base offset
                rank_rows.append(off_lane + owns_b[s] - 1.0)
                run = run + cnts_b[s]
            # State -> 16-bit halves (f32-encoded).
            def split16(x):
                u = pltpu.bitcast(x, jnp.uint32)
                return (
                    _u2f(u >> jnp.uint32(16)),
                    _u2f(u & jnp.uint32(0xFFFF)),
                )

            rows_b = []
            for v in (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, gid):
                hi_h, lo_h = split16(v)
                rows_b.append(hi_h)
                rows_b.append(lo_h)
            rows_b.append(depth.astype(f32))
            rows_b.append(jnp.where(active, 1.0, 0.0))
            rows_b.append(pixl_s.astype(f32))
            rows_b.append(last_sup.astype(f32))
            nv = len(rows_b)  # 24

            # Scatter each SRC row's values to their dst lanes with ONE
            # wide dot: [nv, G] @ ([R, G] one-hot)^T -> [nv, R], summed
            # over src rows.  (A lane-axis concat of per-row slices would
            # be the natural [nv, R] build, but Mosaic can't concatenate
            # vectors whose sublane offsets differ on the non-concat dim.)
            gdst_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB * G, G), 0)
            ddp = (((1,), (1,)), ((), ()))
            out_all = None
            for s in range(SUB):
                rank_si = jnp.floor(rank_rows[s] + 0.5).astype(jnp.int32)
                pmat = (gdst_iota == rank_si).astype(f32)  # [R, G]
                vals_s = jnp.concatenate(
                    [r[s : s + 1, :] for r in rows_b], axis=0
                )  # [nv, G]
                part = jax.lax.dot_general(
                    vals_s, pmat, ddp, preferred_element_type=f32,
                    precision=hp,
                )  # [nv, R]
                out_all = part if out_all is None else out_all + part

            def permuted(vi):
                col = [
                    out_all[vi : vi + 1, sp * G : (sp + 1) * G]
                    for sp in range(SUB)
                ]
                return col[0] if SUB == 1 else jnp.concatenate(col, axis=0)

            def join16(vi):
                hi_h = jnp.floor(permuted(vi) + 0.5).astype(jnp.int32)
                lo_h = jnp.floor(permuted(vi + 1) + 0.5).astype(jnp.int32)
                return (hi_h << 16) | lo_h

            ox = pltpu.bitcast(join16(0), f32)
            oy = pltpu.bitcast(join16(2), f32)
            oz = pltpu.bitcast(join16(4), f32)
            dx = pltpu.bitcast(join16(6), f32)
            dy = pltpu.bitcast(join16(8), f32)
            dz = pltpu.bitcast(join16(10), f32)
            tpr = pltpu.bitcast(join16(12), f32)
            tpg = pltpu.bitcast(join16(14), f32)
            tpb = pltpu.bitcast(join16(16), f32)
            gid = join16(18)
            depth = jnp.floor(permuted(20) + 0.5).astype(jnp.int32)
            active = permuted(21) > 0.5
            pixl_s = jnp.floor(permuted(22) + 0.5).astype(jnp.int32)
            last_sup = jnp.floor(permuted(23) + 0.5).astype(jnp.int32)
            del rows_b, out_all, nv

            if "bincheck" in ablate:  # debug: count sort-order violations
                # recompute bins from the permuted state and count
                # descents in pool order.
                oct2 = (
                    jnp.where(dx < 0.0, 4, 0)
                    + jnp.where(dy < 0.0, 2, 0)
                    + jnp.where(dz < 0.0, 1, 0)
                )
                sup_b2 = jnp.floor(
                    last_sup.astype(f32) * np.float32(NBC / ns_tot_b)
                ).astype(jnp.int32)
                pix_b2 = pixl_s >> max(log2np - 4, 0)
                cell2 = jnp.clip(
                    jnp.where(depth == 0, pix_b2, sup_b2), 0, NBC - 1
                )
                bin2 = jnp.where(active, cell2 * 8 + oct2, NB - 1)
                nxt = pltpu.roll(bin2, G - 1, 1)  # lane g+1 (wraps)
                lane_g = jax.lax.broadcasted_iota(jnp.int32, (SUB, G), 1)
                within = (nxt < bin2) & (lane_g < G - 1)
                viol = jnp.sum(jnp.where(within, 1, 0))
                # row boundaries: last lane of row s vs first of row s+1
                lastc = bin2[:, G - 1 : G]  # [SUB,1]
                firstc = bin2[:, 0:1]
                sub_i = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
                bviol = jnp.sum(
                    jnp.where(
                        (sub_i < SUB - 1)
                        & (pltpu.roll(firstc, SUB - 1, 0) < lastc),
                        1,
                        0,
                    )
                )
                acc[0:1, 8:9] += (viol + bviol).astype(f32)

        # ---- intersect ----------------------------------------------------
        # Dots stay on the VPU: an MXU [C,3]@[3,G] contraction at f32
        # precision is pipeline-latency-bound (HIGHEST = 6-9 passes of a
        # K=3 matmul) and measured SLOWER than the broadcast form, while
        # bf16 inputs (the TPU dot default) corrupt the geometry.
        # The sweep runs once per state row s: chunk math on (C, G) blocks
        # carries the same element count as a single (C, R) pass, and the
        # per-row (1, G) ray slices broadcast against the (C, 1) columns.
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        def chunk_sweep(plan, n_chunks, fn, carry):
            """Static python unroll over the chunk plan (full-size chunks
            plus an 8-multiple tail trimmed to the real prim count — the
            463-prim bench scene otherwise sweeps 512 padded slots);
            fall back to a uniform-chunk fori_loop only when unrolling
            would bloat the program."""
            if not n_chunks:
                return carry
            if len(plan) <= 16:
                for base, size in plan:
                    carry = fn(base, size, carry)
                return carry
            step = plan[0][1]
            return jax.lax.fori_loop(
                0, n_chunks, lambda ci, c: fn(ci * step, step, c), carry
            )

        def lane_group_intersect(oxs, oys, ozs, dxs, dys, dzs, a_s, inv_a_s):
            def sph_chunk_at(base, size, best):
                sph = sph_ref[pl.ds(base, size), :]  # [C,4]
                s_iota = jax.lax.broadcasted_iota(jnp.int32, (size, G), 0)
                cx = sph[:, 0:1]
                cy = sph[:, 1:2]
                cz = sph[:, 2:3]
                rad = sph[:, 3:4]
                ocx = cx - oxs  # [C,G] broadcast
                ocy = cy - oys
                ocz = cz - ozs
                h = dxs * ocx + dys * ocy + dzs * ocz
                c_ = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                disc = h * h - a_s * c_
                sd = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = (h - sd) * inv_a_s
                t1 = (h + sd) * inv_a_s
                t_cand = jnp.where(t0 >= t_min, t0, t1)
                valid = (
                    (disc >= 0.0) & (rad > 0.0) & (t_cand >= t_min) & (t_cand < t_max)
                )
                t_cand = jnp.where(valid, t_cand, BIG)
                if packed_select:
                    key = (pltpu.bitcast(t_cand, jnp.int32) & ~id_mask) | (
                        s_iota + base
                    )
                    return jnp.minimum(best, jnp.min(key, axis=0, keepdims=True))
                bt, bi = best
                cmin = jnp.min(t_cand, axis=0, keepdims=True)
                ids = s_iota + base
                sel = jnp.min(
                    jnp.where(t_cand == cmin, ids, jnp.int32(2**30)),
                    axis=0,
                    keepdims=True,
                )
                better = cmin < bt
                return (jnp.where(better, cmin, bt), jnp.where(better, sel, bi))

            def tri_chunk_at(base, size, best):
                tri = tri_ref[pl.ds(base, size), :]  # [C,12]
                t_iota = jax.lax.broadcasted_iota(jnp.int32, (size, G), 0)
                ax_, ay_, az_ = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
                e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
                e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
                live = tri[:, 9:10]
                uvx = dys * e2z - dzs * e2y
                uvy = dzs * e2x - dxs * e2z
                uvz = dxs * e2y - dys * e2x
                det = e1x * uvx + e1y * uvy + e1z * uvz
                if backface_cull:
                    det_ok = det > 1e-7
                else:
                    det_ok = jnp.abs(det) > 1e-7
                inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                aox = oxs - ax_
                aoy = oys - ay_
                aoz = ozs - az_
                u = (aox * uvx + aoy * uvy + aoz * uvz) * inv_det
                vvx = aoy * e1z - aoz * e1y
                vvy = aoz * e1x - aox * e1z
                vvz = aox * e1y - aoy * e1x
                v = (dxs * vvx + dys * vvy + dzs * vvz) * inv_det
                tt = (e2x * vvx + e2y * vvy + e2z * vvz) * inv_det
                ok = (
                    det_ok
                    & (live > 0.5)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (tt >= t_min)
                    & (tt < t_max)
                    & (tt > 1e-7)
                )
                t_cand = jnp.where(ok, tt, BIG)
                ids = t_iota + base + n_spheres
                if packed_select:
                    key = (pltpu.bitcast(t_cand, jnp.int32) & ~id_mask) | ids
                    return jnp.minimum(best, jnp.min(key, axis=0, keepdims=True))
                bt, bi = best
                cmin = jnp.min(t_cand, axis=0, keepdims=True)
                sel = jnp.min(
                    jnp.where(t_cand == cmin, ids, jnp.int32(2**30)),
                    axis=0,
                    keepdims=True,
                )
                better = cmin < bt
                return (jnp.where(better, cmin, bt), jnp.where(better, sel, bi))

            sph_plan = _chunk_plan(
                n_spheres, n_sph_chunks * SPHERE_CHUNK, SPHERE_CHUNK
            )
            tri_plan = _chunk_plan(n_tris, n_tri_chunks * TRI_CHUNK, TRI_CHUNK)
            if packed_select:
                best = jnp.full((1, G), big_key | id_mask, jnp.int32)
                best = chunk_sweep(sph_plan, n_sph_chunks, sph_chunk_at, best)
                best = chunk_sweep(tri_plan, n_tri_chunks, tri_chunk_at, best)
                return best
            carry2 = (jnp.full((1, G), BIG, f32), jnp.full((1, G), -1, jnp.int32))
            carry2 = chunk_sweep(sph_plan, n_sph_chunks, sph_chunk_at, carry2)
            carry2 = chunk_sweep(tri_plan, n_tri_chunks, tri_chunk_at, carry2)
            return carry2

        def vstack(rows):
            return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)

        # ---- clustered intersect (hierarchical worklist; large scenes) ----
        # The same two-level machinery as pallas_ops._worklist_kernel, run
        # against the persistent pool: slab-test the super AABBs, compact
        # entered supers to SMEM, slab-test their member clusters, compact
        # per-super cluster segments to SMEM, then one flattened while loop
        # intersects ONLY the entered 128-slot chunks.  No vector-unit
        # branches anywhere (pl.when measured ~10 us of pipeline drain).
        if clustered:
            F = f_rows
            ms_pad = scl_ref.shape[0]  # sphere clusters (64-multiple)
            mt_pad = tcl_ref.shape[0]
            n_sph_slots = ms_pad * CLUSTER_SLOTS
            ns_tot = (ms_pad + mt_pad) // SUPER_SLOTS  # global super count
            ns_pad = max(-(-ns_tot // 8) * 8, 8)
            # Winner-fetch lane-row groups: with the pool SORTED (bin_lanes)
            # winners are group-local, so the fetch one-hot dot shrinks its
            # N axis from SUB*G to RPGF*G — the fetch dot was ~85% of a
            # closed-blob iteration at N = SUB*G (round-4 probes).  Worklist
            # regions bound NGF * ns_tot <= _WL_ROWS statically.
            NGF = 1
            ngf_cap = SUB
            if "ngf:" in ablate:  # probe: cap the fetch group count
                ngf_cap = int(ablate.split("ngf:")[1].split()[0])
            if bin_lanes:
                while (
                    NGF * 2 <= min(SUB, ngf_cap)
                    and NGF * 2 * max(ns_tot, 1) <= _WL_ROWS
                ):
                    NGF *= 2
            RPGF = SUB // NGF
            FSTRIDE = _WL_ROWS // NGF
            tiny = np.float32(1.0e-20)
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) > tiny, dx, tiny)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) > tiny, dy, tiny)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) > tiny, dz, tiny)
            live = active
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

            def slab_enter(box, s):
                """AABB slab test of box rows [K, 8] against state row s's
                rays -> bool [K, G] (live lanes only)."""
                lx, ly, lz = box[:, 0:1], box[:, 1:2], box[:, 2:3]
                hx, hy, hz = box[:, 3:4], box[:, 4:5], box[:, 5:6]
                oxr, oyr, ozr = ox[s : s + 1, :], oy[s : s + 1, :], oz[s : s + 1, :]
                idx_ = inv_dx[s : s + 1, :]
                idy_ = inv_dy[s : s + 1, :]
                idz_ = inv_dz[s : s + 1, :]
                t0x = (lx - oxr) * idx_
                t1x = (hx - oxr) * idx_
                t0y = (ly - oyr) * idy_
                t1y = (hy - oyr) * idy_
                t0z = (lz - ozr) * idz_
                t1z = (hz - ozr) * idz_
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                # Robust-traversal pad (Ize 2013): the slab arithmetic can
                # round a silhouette-grazing interval to empty and cull a
                # true hit; scaling tf outward by a few ulps only ever
                # admits extra clusters.
                tf = tf * np.float32(1.0 + 6e-7) + np.float32(1e-6)
                return (tn <= tf) & (tf >= 0.0) & live[s : s + 1, :]

            def pool_enter_mask(box, lane_mask=None):
                """Per-AABB 'any live pool ray enters' flags i32 [K, 1].
                ``lane_mask`` (bool [SUB, G]) restricts entry to those
                lanes — the expansion sweep's overflow-ray fallback."""
                if "nocull" in ablate:  # correctness ablation: enter all
                    return (box[:, 0:1] <= box[:, 3:4]).astype(jnp.int32)
                m = jnp.zeros((box.shape[0], 1), jnp.int32)
                for s in range(SUB):
                    es = slab_enter(box, s)
                    if lane_mask is not None:
                        es = es & lane_mask[s : s + 1, :]
                    m = jnp.maximum(
                        m,
                        jnp.max(es.astype(jnp.int32), axis=1, keepdims=True),
                    )
                return m

            def compact_col(mask):
                """Dense ids [1, K] (-1 padded) of set rows in mask i32[K,1]
                via the MXU rank-match reduction (no scatter, no cumsum)."""
                k = mask.shape[0]
                row_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
                col_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
                tri_ones = (col_i <= row_i).astype(f32)
                rank = (
                    jnp.dot(tri_ones, mask.astype(f32), preferred_element_type=f32)
                    .astype(jnp.int32)
                    - 1
                )  # [k, 1] inclusive prefix sum - 1
                ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
                match = (rank == col_i) & (mask > 0)
                compacted = jnp.sum(jnp.where(match, ids, 0), axis=0, keepdims=True)
                filled = jnp.sum(match.astype(jnp.int32), axis=0, keepdims=True)
                return jnp.where(filled > 0, compacted, -1)

            def dma_to(src, dst):
                cp = pltpu.make_async_copy(src, dst, dma_sem)
                cp.start()
                cp.wait()

            def stage_super_list(mask):
                """Compact a super mask and DMA the id list to SMEM.

                Capacity is _WL_ROWS supers (matches eligible_clustered's
                (ms_pad + mt_pad) // SUPER_SLOTS <= _WL_ROWS bound) — a
                128-entry stage here once silently dropped supers 129+ of
                large streamed scenes (>1M prims per set)."""
                ids = compact_col(mask)
                k = ids.shape[1]
                if k < _WL_ROWS:
                    ids = jnp.concatenate(
                        [ids, jnp.full((1, _WL_ROWS - k), -1, jnp.int32)],
                        axis=1,
                    )
                sup_vmem[0:1, :] = ids[:, :_WL_ROWS]
                dma_to(sup_vmem, sup_smem)
                return jnp.sum(mask)

            NG = row_groups  # static lane-row groups per worklist entry
            RPG = SUB // NG  # state rows per group

            def build_segments_pool(n_ent, member_mask64):
                """Pool-level segment builder (one worklist row per entered
                super, no lane-row groups): used by the winner fetch, whose
                membership is winner identity, not slab entry.  Row layout
                [64 ids | count@64 | group=0@65 | -1 pad]."""

                def seg_body(c):
                    j, tot = c
                    for _u in range(_SEG_UNROLL):
                        jc = jnp.minimum(j, _WL_ROWS - 1)
                        sid = jnp.maximum(sup_smem[0, jc], 0)
                        m64 = member_mask64(sid)
                        seg = compact_col(m64)  # [1, 64] local ids
                        seg = jnp.where(seg >= 0, seg + sid * SUPER_SLOTS, -1)
                        cnt = jnp.sum(m64, axis=0, keepdims=True)  # [1,1]
                        segp = jnp.concatenate(
                            [seg, jnp.full((1, 64), -1, jnp.int32)], axis=1
                        )
                        rowv = jnp.where(
                            lane128 == 64,
                            jnp.broadcast_to(cnt, (1, 128)),
                            segp,
                        )
                        rowv = jnp.where(lane128 == 65, 0, rowv)
                        wl_vmem[pl.ds(jc, 1), :] = rowv
                        valid = (j < n_ent).astype(f32)
                        tot = tot + cnt.astype(f32) * valid
                        j = j + 1
                    return (j, tot)

                _, total = jax.lax.while_loop(
                    lambda c: c[0] < n_ent,
                    seg_body,
                    (jnp.int32(0), jnp.zeros((1, 1), f32)),
                )
                dma_to(wl_vmem, wl_smem)
                return total

            def build_segments(n_ent, cl_ref, lane_mask=None):
                """Per entered super j and lane-row GROUP g: compact the
                group's 64-cluster entered mask into the next worklist row
                [global ids (64) | count@64 | group@65 | -1 pad] (rows with
                zero entered clusters are skipped), then DMA to SMEM.
                Returns (n_rows, total entered clusters [1,1]).

                Row groups are the SIMD granularity fix for mixed pools:
                the sweep then intersects each cluster against only the
                RPG state rows of the group that entered it, cutting the
                per-visit math by the measured U_pool*SUB / sum_g U_group
                ratio (2.8x on the 360k cover at NG=SUB)."""
                n_sup_tab = cl_ref.shape[0] // SUPER_SLOTS

                def seg_body(c):
                    j, p, tot = c
                    for _u in range(_SEG_UNROLL):
                        jc = jnp.minimum(j, _WL_ROWS - 1)
                        sid = jnp.maximum(sup_smem[0, jc], 0)
                        sidc = jnp.minimum(sid, n_sup_tab - 1)
                        base = pl.multiple_of(sidc * SUPER_SLOTS, SUPER_SLOTS)
                        boxes = cl_ref[pl.ds(base, SUPER_SLOTS), :]
                        valid = j < n_ent
                        for g in range(NG):
                            if "nocull" in ablate:
                                m64 = (boxes[:, 0:1] <= boxes[:, 3:4]).astype(
                                    jnp.int32
                                )
                            else:
                                m64 = jnp.zeros((SUPER_SLOTS, 1), jnp.int32)
                                for s in range(g * RPG, (g + 1) * RPG):
                                    es = slab_enter(boxes, s)
                                    if lane_mask is not None:
                                        es = es & lane_mask[s : s + 1, :]
                                    m64 = jnp.maximum(
                                        m64,
                                        jnp.max(
                                            es.astype(jnp.int32),
                                            axis=1,
                                            keepdims=True,
                                        ),
                                    )
                            seg = compact_col(m64)  # [1, 64] local ids
                            seg = jnp.where(seg >= 0, seg + sid * SUPER_SLOTS, -1)
                            cnt = jnp.sum(m64, axis=0, keepdims=True)  # [1,1]
                            segp = jnp.concatenate(
                                [seg, jnp.full((1, 64), -1, jnp.int32)], axis=1
                            )
                            rowv = jnp.where(
                                lane128 == 64,
                                jnp.broadcast_to(cnt, (1, 128)),
                                segp,
                            )
                            rowv = jnp.where(lane128 == 65, g, rowv)
                            keep = valid & (cnt[0, 0] > 0)
                            pc = jnp.minimum(p, _WL_ROWS - 1)
                            old = wl_vmem[pl.ds(pc, 1), :]
                            wl_vmem[pl.ds(pc, 1), :] = jnp.where(keep, rowv, old)
                            p = p + jnp.where(keep, 1, 0)
                            tot = tot + cnt.astype(f32) * jnp.where(valid, 1.0, 0.0)
                        j = j + 1
                    return (j, p, tot)

                _, n_rows, total = jax.lax.while_loop(
                    lambda c: c[0] < n_ent,
                    seg_body,
                    (jnp.int32(0), jnp.int32(0), jnp.zeros((1, 1), f32)),
                )
                dma_to(wl_vmem, wl_smem)
                return n_rows, total

            # Phase C runs in the FLAT kernel's proven orientation — prim
            # fields as [128, 1] columns broadcasting against [1, G] ray
            # rows (2.3 us per chunk measured there).  The lane-major slot
            # tables are transposed per visited cluster ([nrows, 128] ->
            # [128, nrows], one small relayout); the mirrored orientation
            # (rays as [G,1] columns) measured ~15 us per chunk — ~10
            # lane-broadcast ray operands per chunk instead of 4-10 prim
            # columns.
            slot_iota_col = jax.lax.broadcasted_iota(
                jnp.int32, (CLUSTER_SLOTS, G), 0
            )

            def sph_chunk_key(sl_t, rowv):
                """Packed (t | 7-bit local slot) min over a 128-slot sphere
                chunk sl_t [128, nrows] vs ONE state row's rays -> i32
                [1, G].  The 2^-16 relative t truncation is far below the
                scale-aware ray offset (same scheme as the flat path's
                packed_select)."""
                cx, cy, cz, rad = (
                    sl_t[:, 0:1], sl_t[:, 1:2], sl_t[:, 2:3], sl_t[:, 3:4]
                )
                oxs, oys, ozs, dxs, dys, dzs, a_s, inv_a_s = rowv
                ocx = cx - oxs  # [128, G]
                ocy = cy - oys
                ocz = cz - ozs
                h = dxs * ocx + dys * ocy + dzs * ocz
                c_ = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                disc = h * h - a_s * c_
                sd = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = (h - sd) * inv_a_s
                t1 = (h + sd) * inv_a_s
                t_cand = jnp.where(t0 >= t_min, t0, t1)
                valid = (
                    (disc >= 0.0) & (rad > 0.0) & (t_cand >= t_min) & (t_cand < t_max)
                )
                t_cand = jnp.where(valid, t_cand, BIG)
                key = (pltpu.bitcast(t_cand, jnp.int32) & ~127) | slot_iota_col
                return jnp.min(key, axis=0, keepdims=True)

            def tri_chunk_key(sl_t, rowv):
                """Packed Moller-Trumbore min over a 128-slot triangle chunk
                sl_t [128, nrows] vs ONE state row's rays -> i32 [1, G]."""
                ax_, ay_, az_ = sl_t[:, 0:1], sl_t[:, 1:2], sl_t[:, 2:3]
                e1x, e1y, e1z = sl_t[:, 3:4], sl_t[:, 4:5], sl_t[:, 5:6]
                e2x, e2y, e2z = sl_t[:, 6:7], sl_t[:, 7:8], sl_t[:, 8:9]
                live_t = sl_t[:, 9:10]
                oxs, oys, ozs, dxs, dys, dzs, _, _ = rowv
                uvx = dys * e2z - dzs * e2y
                uvy = dzs * e2x - dxs * e2z
                uvz = dxs * e2y - dys * e2x
                det = e1x * uvx + e1y * uvy + e1z * uvz
                if backface_cull:
                    det_ok = det > 1e-7
                else:
                    det_ok = jnp.abs(det) > 1e-7
                inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                aox = oxs - ax_
                aoy = oys - ay_
                aoz = ozs - az_
                u = (aox * uvx + aoy * uvy + aoz * uvz) * inv_det
                vvx = aoy * e1z - aoz * e1y
                vvy = aoz * e1x - aox * e1z
                vvz = aox * e1y - aoy * e1x
                v = (dxs * vvx + dys * vvy + dzs * vvz) * inv_det
                tt = (e2x * vvx + e2y * vvy + e2z * vvz) * inv_det
                ok = (
                    det_ok
                    & (live_t > 0.5)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (tt >= t_min)
                    & (tt < t_max)
                    & (tt > 1e-7)
                )
                t_cand = jnp.where(ok, tt, BIG)
                key = (pltpu.bitcast(t_cand, jnp.int32) & ~127) | slot_iota_col
                return jnp.min(key, axis=0, keepdims=True)

            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, G), 0)

            def sweep_entered(n_rows, slots_ref, chunk_key, shade_base, bt_t, bi_t):
                """Flattened (worklist row e, seg entry k) while loop over
                the entered clusters, _SWEEP_UNROLL chunk visits per step
                (while-loop iterations in this kernel carry real boundary
                overhead; unrolled visits amortize it).  Each worklist row
                is (cluster segment, lane-row GROUP): the chunk math runs
                against only that group's RPG state rows, read from the
                rays_scr staging buffer at a dynamic row offset.  Tail
                visits past the worklist end are validity-masked."""

                n_cl_tab = slots_ref.shape[1] // CLUSTER_SLOTS

                if "countsweep" in ablate:
                    # debug: actual sweep visit count (while steps x unroll)
                    def csteps(c):
                        e, k, n = c
                        for _u in range(_SWEEP_UNROLL):
                            n = n + jnp.where(e < n_rows, 1, 0)
                            k2 = k + 1
                            cnt = wl_smem[jnp.minimum(e, _WL_ROWS - 1), 64]
                            roll = k2 >= cnt
                            e = jnp.where(roll, e + 1, e)
                            k = jnp.where(roll, 0, k2)
                        return (e, k, n)

                    _, _, n_v = jax.lax.while_loop(
                        lambda c: c[0] < n_rows, csteps,
                        (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                    )
                    acc[0:1, 9:10] += n_v.astype(f32)

                def ccond(c):
                    return c[0] < n_rows

                def cbody(c):
                    e, k, bt_c, bi_c = c
                    for _u in range(_SWEEP_UNROLL):
                        ec = jnp.minimum(e, _WL_ROWS - 1)
                        cnt = wl_smem[ec, 64]
                        grp = jnp.clip(wl_smem[ec, 65], 0, NG - 1)
                        row0 = grp * RPG
                        valid = (e < n_rows) & (k < cnt)
                        ci = jnp.clip(
                            wl_smem[ec, jnp.minimum(k, 63)], 0, n_cl_tab - 1
                        )
                        base = pl.multiple_of(ci * CLUSTER_SLOTS, CLUSTER_SLOTS)
                        if "sweepconstsl" in ablate:  # probe: static slice
                            # (loop-invariant slice+transpose get hoisted:
                            # measures the dynamic slice + relayout share)
                            sl_t = slots_ref[:, 0:CLUSTER_SLOTS].T
                        else:
                            sl_t = slots_ref[:, pl.ds(base, CLUSTER_SLOTS)].T
                        if "sweepdup" in ablate:  # probe: + a 2nd dynamic
                            # slice+transpose per visit (results unchanged:
                            # folded in via a never-wins key)
                            base2 = pl.multiple_of(
                                (n_cl_tab - 1 - ci) * CLUSTER_SLOTS,
                                CLUSTER_SLOTS,
                            )
                            sl2 = slots_ref[:, pl.ds(base2, CLUSTER_SLOTS)].T
                            dup_pen = jnp.maximum(
                                pltpu.bitcast(
                                    jnp.sum(sl2, axis=1, keepdims=True)[0:1, :]
                                    * 0.0,
                                    jnp.int32,
                                ),
                                jnp.int32(0x7F000000),
                            )  # [1,1] always-big key
                        else:
                            dup_pen = None
                        rows = [
                            rays_scr[pl.ds(f * SUB + row0, RPG), :]
                            for f in range(8)
                        ]  # ox oy oz dx dy dz a inv_a, each [RPG, G]
                        for r in range(RPG):
                            rowv = tuple(x[r : r + 1, :] for x in rows)
                            if "sweepnomath" in ablate:  # probe: loop +
                                # slice + transpose, no intersect math
                                key = (
                                    pltpu.bitcast(
                                        sl_t[0:1, 0:1] + rowv[0][0:1, 0:1],
                                        jnp.int32,
                                    )
                                    | jnp.zeros((1, G), jnp.int32)
                                )
                            else:
                                key = chunk_key(sl_t, rowv)  # [1, G]
                            if "sweepmathdup" in ablate:  # probe: + a 2nd
                                # full chunk math per row (never wins;
                                # perturbed operands defeat CSE)
                                rowv2 = tuple(
                                    x * np.float32(1.0000001) for x in rowv
                                )
                                key2 = chunk_key(sl_t, rowv2)
                                key = jnp.minimum(
                                    key,
                                    jnp.maximum(key2, jnp.int32(0x7F000000)),
                                )
                            if dup_pen is not None:
                                key = jnp.minimum(key, dup_pen)
                            ct = pltpu.bitcast(key & ~127, f32)
                            is_row = sub_iota == row0 + r
                            ctb = jnp.broadcast_to(ct, (SUB, G))
                            better = is_row & valid & (ctb < bt_c)
                            bt_c = jnp.where(better, ctb, bt_c)
                            bi_c = jnp.where(
                                better,
                                shade_base + base + (key & 127),
                                bi_c,
                            )
                        k2 = k + 1
                        roll = k2 >= cnt
                        e = jnp.where(roll, e + 1, e)
                        k = jnp.where(roll, 0, k2)
                    return (e, k, bt_c, bi_c)

                _, _, bt_t, bi_t = jax.lax.while_loop(
                    ccond, cbody, (jnp.int32(0), jnp.int32(0), bt_t, bi_t)
                )
                return bt_t, bi_t

            def sweep_entered_streamed(
                n_rows, slots_hbm, nrows_set, chunk_key, shade_base, bt_t, bi_t
            ):
                """Streamed variant of sweep_entered for slot tables past
                the VMEM budget: worklist entries are processed in chunks
                of _STREAM_RING visits through sem/vector-segregated loops
                (the fetch_chunk lesson: mixing DMA sem ops with vector
                work in one while body serializes ~43 us/step), DOUBLE-
                BUFFERED so chunk N+1's HBM DMAs fly during chunk N's math
                — per chunk: (1) start the NEXT chunk's DMAs into the
                other ring half, (2) wait the current chunk's, (3) run the
                current chunk's math from the VMEM ring."""
                n_cl_tab = slots_hbm.shape[1] // CLUSTER_SLOTS

                def advance2(e, k):
                    cnt = wl_smem[jnp.minimum(e, _WL_ROWS - 1), 64]
                    k2 = k + 1
                    roll = k2 >= cnt
                    return jnp.where(roll, e + 1, e), jnp.where(roll, 0, k2)

                def entry_ci(e, k):
                    ec = jnp.minimum(e, _WL_ROWS - 1)
                    return jnp.clip(
                        wl_smem[ec, jnp.minimum(k, 63)], 0, n_cl_tab - 1
                    )

                def slot_dma(e, k, i, buf):
                    ci = entry_ci(e, k)
                    slot = buf * _STREAM_RING + i
                    return pltpu.make_async_copy(
                        slots_hbm.at[
                            :, pl.ds(ci * CLUSTER_SLOTS, CLUSTER_SLOTS)
                        ],
                        stream_vmem.at[
                            0:nrows_set,
                            pl.ds(slot * CLUSTER_SLOTS, CLUSTER_SLOTS),
                        ],
                        stream_sems.at[slot],
                    )

                def start_chunk(e, k, buf):
                    def s_body(c2):
                        i, e2, k2 = c2
                        slot_dma(e2, k2, i, buf).start()
                        e3, k3 = advance2(e2, k2)
                        return (i + 1, e3, k3)

                    return jax.lax.while_loop(
                        lambda c2: (c2[0] < _STREAM_RING) & (c2[1] < n_rows),
                        s_body,
                        (jnp.int32(0), e, k),
                    )

                def chunk(c):
                    # (cursor of the in-flight chunk, its length, its ring
                    # half, cursor PAST it, best-so-far)
                    e0, k0, n_cur, buf, e1, k1, bt_c, bi_c = c

                    # (1) start the NEXT chunk's DMAs into the other half
                    n_next, e2, k2 = start_chunk(e1, k1, 1 - buf)

                    # (2) wait the current chunk's DMAs
                    def w_body(c2):
                        i, e, k = c2
                        slot_dma(e, k, i, buf).wait()
                        e3, k3 = advance2(e, k)
                        return (i + 1, e3, k3)

                    jax.lax.while_loop(
                        lambda c2: c2[0] < n_cur,
                        w_body,
                        (jnp.int32(0), e0, k0),
                    )

                    # (3) math on the current chunk from the VMEM ring
                    def v_body(c3):
                        i, e, k, bt_v, bi_v = c3
                        ec = jnp.minimum(e, _WL_ROWS - 1)
                        grp = jnp.clip(wl_smem[ec, 65], 0, NG - 1)
                        row0 = grp * RPG
                        ci = entry_ci(e, k)
                        base = pl.multiple_of(ci * CLUSTER_SLOTS, CLUSTER_SLOTS)
                        slot = buf * _STREAM_RING + i
                        sl_t = stream_vmem[
                            0:nrows_set,
                            pl.ds(slot * CLUSTER_SLOTS, CLUSTER_SLOTS),
                        ].T
                        rows = [
                            rays_scr[pl.ds(f * SUB + row0, RPG), :]
                            for f in range(8)
                        ]
                        for r in range(RPG):
                            rowv = tuple(x[r : r + 1, :] for x in rows)
                            key = chunk_key(sl_t, rowv)  # [1, G]
                            ct = pltpu.bitcast(key & ~127, f32)
                            is_row = sub_iota == row0 + r
                            ctb = jnp.broadcast_to(ct, (SUB, G))
                            better = is_row & (ctb < bt_v)
                            bt_v = jnp.where(better, ctb, bt_v)
                            bi_v = jnp.where(
                                better,
                                shade_base + base + (key & 127),
                                bi_v,
                            )
                        e2_, k2_ = advance2(e, k)
                        return (i + 1, e2_, k2_, bt_v, bi_v)

                    _, _, _, bt_c, bi_c = jax.lax.while_loop(
                        lambda c3: c3[0] < n_cur,
                        v_body,
                        (jnp.int32(0), e0, k0, bt_c, bi_c),
                    )
                    return (e1, k1, n_next, 1 - buf, e2, k2, bt_c, bi_c)

                # Prologue: fill ring half 0 with the first chunk, then
                # pipeline until the in-flight chunk is empty.
                n0, e1_0, k1_0 = start_chunk(jnp.int32(0), jnp.int32(0), 0)
                out = jax.lax.while_loop(
                    lambda c: c[2] > 0,
                    chunk,
                    (
                        jnp.int32(0), jnp.int32(0), n0, jnp.int32(0),
                        e1_0, k1_0, bt_t, bi_t,
                    ),
                )
                return out[6], out[7]

            # ---- expansion sweep (round 5) --------------------------------
            # The row-granular sweep pays [128 slots x 128 lanes] per visit
            # at ~1.3 beneficiary lanes on closed meshes (~1% occupancy,
            # ROADMAP round-4 decomposition; the per-ray BVH walk being
            # matched is hittable.rs:135-149).  The expansion unit is the
            # (8, 128) vreg FLIPPED: 8 (ray, entered-cluster) work items on
            # sublanes x one cluster's 128 slots on lanes (~74% potential
            # occupancy at the measured ~5.9 rays/cluster).  Pipeline:
            #   1. [M, G] slab masks per state row; hierarchical prefix
            #      over clusters -> per-ray entered list; per-ray cap
            #      _EXP_K (overflow rays fall back to the row sweep).
            #   2. Items land DENSE and cluster-grouped: dst = B[cluster]
            #      + within-cluster rank (all-matmul prefix machinery).
            #      Ray ids scatter as DEFAULT-precision byte planes with
            #      one OR-ed pmat per state row (K dsts share a source
            #      value) — measured ~0.6 us per 512-item chunk.
            #   3. Visits walk per-cluster runs in 8-item windows that
            #      OVERLAP at run boundaries: a window is intersected
            #      against its cluster's slots, the next cluster's first
            #      window overwrites any cross-boundary garbage (visits
            #      execute in cluster order), so items stay dense.  Ray
            #      state is self-gathered from a transposed (ray-on-
            #      sublane) pool copy via 8 sublane-dynamic (1, 8) slices
            #      (measured free under the visit's ~35 vector ops).
            #   4. Item -> ray winner reduction runs on the SCALAR core
            #      over SMEM (~10 ns/item measured; every matmul gather
            #      alternative is MXU-starved by M/N-thin operands).
            # Bit-compatibility: every (ray, cluster, slot) candidate is
            # tested with the identical FP expressions as the row sweep,
            # and overflow/fallback only ever ADDS candidates a ray
            # legitimately entered, so the reduced min matches the row
            # sweep's up to equal-key ties across clusters.
            if expand_sweep:
                EK, ENI, ENV, ECH = _EXP_K, _EXP_NI, _EXP_NV, _EXP_CH
                NIQ = ENI // ECH
                ENIB = ENI // 8  # dense-block width (item j at [j>>.., j&..])
                ENVB = ENV // 8
                log2enib = int(np.log2(ENIB))
                log2envb = int(np.log2(ENVB))
                log2g = int(np.log2(G))
                assert (1 << log2g) == G, "expansion needs pow2 lanes/sub"
                assert (1 << log2enib) == ENIB and (1 << log2envb) == ENVB
                hp = jax.lax.Precision.HIGHEST
                ddp2 = (((1,), (1,)), ((), ()))
                exp_lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                t64_incl = (
                    jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
                    <= jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
                ).astype(f32)
                ch_iota = jax.lax.broadcasted_iota(jnp.int32, (ECH, G), 0)
                g_iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

                def cl_prefix(m):
                    """Inclusive prefix along the cluster axis of m [M, G]
                    (hierarchical: per-64 block dots + running offsets;
                    0/1 operands make DEFAULT precision exact)."""
                    mb = m.shape[0] // 64
                    blocks = []
                    off = jnp.zeros((1, m.shape[1]), f32)
                    for b in range(mb):
                        pb = (
                            jnp.dot(
                                t64_incl,
                                m[b * 64 : (b + 1) * 64, :],
                                preferred_element_type=f32,
                            )
                            + off
                        )
                        blocks.append(pb)
                        off = pb[63:64, :]
                    return jnp.concatenate(blocks, axis=0)

                def sph_visit_key(sl, itm):
                    """(8,1) packed (t|slot) keys: 8 items vs one sphere
                    cluster's 128 slots — sph_chunk_key's exact FP ops in
                    the flipped orientation."""
                    cx, cy, cz, rad = (
                        sl[0:1, :], sl[1:2, :], sl[2:3, :], sl[3:4, :]
                    )
                    oxs, oys, ozs = itm[:, 0:1], itm[:, 1:2], itm[:, 2:3]
                    dxs, dys, dzs = itm[:, 3:4], itm[:, 4:5], itm[:, 5:6]
                    a_s, inv_a_s = itm[:, 6:7], itm[:, 7:8]
                    ocx = cx - oxs  # (8, 128)
                    ocy = cy - oys
                    ocz = cz - ozs
                    h = dxs * ocx + dys * ocy + dzs * ocz
                    c_ = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                    disc = h * h - a_s * c_
                    sd = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0 = (h - sd) * inv_a_s
                    t1 = (h + sd) * inv_a_s
                    t_cand = jnp.where(t0 >= t_min, t0, t1)
                    valid = (
                        (disc >= 0.0)
                        & (rad > 0.0)
                        & (t_cand >= t_min)
                        & (t_cand < t_max)
                    )
                    t_cand = jnp.where(valid, t_cand, BIG)
                    key = (pltpu.bitcast(t_cand, jnp.int32) & ~127) | exp_lane8
                    return jnp.min(key, axis=1, keepdims=True)

                def tri_visit_key(sl, itm):
                    """(8,1) packed keys vs one triangle cluster
                    (tri_chunk_key's exact FP ops, flipped)."""
                    ax_, ay_, az_ = sl[0:1, :], sl[1:2, :], sl[2:3, :]
                    e1x, e1y, e1z = sl[3:4, :], sl[4:5, :], sl[5:6, :]
                    e2x, e2y, e2z = sl[6:7, :], sl[7:8, :], sl[8:9, :]
                    live_t = sl[9:10, :]
                    oxs, oys, ozs = itm[:, 0:1], itm[:, 1:2], itm[:, 2:3]
                    dxs, dys, dzs = itm[:, 3:4], itm[:, 4:5], itm[:, 5:6]
                    uvx = dys * e2z - dzs * e2y
                    uvy = dzs * e2x - dxs * e2z
                    uvz = dxs * e2y - dys * e2x
                    det = e1x * uvx + e1y * uvy + e1z * uvz
                    if backface_cull:
                        det_ok = det > 1e-7
                    else:
                        det_ok = jnp.abs(det) > 1e-7
                    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                    aox = oxs - ax_
                    aoy = oys - ay_
                    aoz = ozs - az_
                    u = (aox * uvx + aoy * uvy + aoz * uvz) * inv_det
                    vvx = aoy * e1z - aoz * e1y
                    vvy = aoz * e1x - aox * e1z
                    vvz = aox * e1y - aoy * e1x
                    v = (dxs * vvx + dys * vvy + dzs * vvz) * inv_det
                    tt = (e2x * vvx + e2y * vvy + e2z * vvz) * inv_det
                    ok = (
                        det_ok
                        & (live_t > 0.5)
                        & (u >= 0.0)
                        & (u <= 1.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (tt >= t_min)
                        & (tt < t_max)
                        & (tt > 1e-7)
                    )
                    t_cand = jnp.where(ok, tt, BIG)
                    key = (pltpu.bitcast(t_cand, jnp.int32) & ~127) | exp_lane8
                    return jnp.min(key, axis=1, keepdims=True)

                def expansion_set(cl_ref2, slots_ref2, flavor, shade_base, bt_t, bi_t, active_n):
                    """Run the expansion pipeline for one primitive set;
                    returns (bt, bi, overflow lane mask [SUB, G]).

                    DRAIN GATE: on near-empty pools (sweep-end drain
                    tail; ~4x iteration inflation at spp <= 2, ROADMAP)
                    the expansion's fixed machinery (~150 us of mask /
                    dst / table passes) dwarfs the work, so the whole
                    pipeline sits under pl.when(active >= lanes/4) and
                    communicates through refs: exp_ovf_v defaults to
                    all-1 (every lane goes to the row-sweep fallback)
                    and exp_best_v's INT_MAX init makes the merge a
                    no-op when skipped."""
                    M = cl_ref2.shape[0]
                    n_cl_tab = slots_ref2.shape[1] // CLUSTER_SLOTS
                    exp_ovf_v[:, :] = jnp.ones((SUB, G), jnp.int32)
                    exp_best_v[:, :] = jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (2 * SUB, G), 0)
                        < SUB,
                        jnp.int32(0x7FFFFFFF),
                        0,
                    )
                    run_gate = active_n >= np.int32(max(R // 4, 1))

                    @pl.when(run_gate)
                    def _run_expansion():
                        # (1) counting pass: per-cluster capped item counts
                        # (and the per-row overflow masks, reused below)
                        pc = jnp.zeros((M, 1), f32)
                        ovf_rows = []
                        for s in range(SUB):
                            m_s = jnp.where(slab_enter(cl_ref2[:, :], s), 1.0, 0.0)
                            csum = cl_prefix(m_s)  # (M, G) inclusive
                            ovf_s = csum[M - 1 : M, :] > np.float32(EK)
                            ovf_rows.append(ovf_s)
                            capped = m_s * jnp.where(
                                (csum <= np.float32(EK)) & ~ovf_s, 1.0, 0.0
                            )
                            pc = pc + jnp.sum(capped, axis=1, keepdims=True)

                        # (2) cluster prefixes, capacity check, per-(s,k) dsts
                        tm_excl = (
                            jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
                            < jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
                        ).astype(f32)
                        bb_ = jnp.dot(
                            tm_excl, pc, preferred_element_type=f32, precision=hp
                        )  # (M, 1) exclusive item prefix
                        nvis_c = jnp.ceil(pc * np.float32(0.125))
                        bv_ = jnp.dot(
                            tm_excl, nvis_c, preferred_element_type=f32,
                            precision=hp,
                        )
                        ni_f = bb_[M - 1 : M, :] + pc[M - 1 : M, :]  # (1, 1)
                        nv_f = bv_[M - 1 : M, :] + nvis_c[M - 1 : M, :]
                        bail = (ni_f > np.float32(ENI)) | (nv_f > np.float32(ENV))
                        bail_row = jnp.broadcast_to(bail, (1, G))
                        # concat in i32: Mosaic cannot concatenate i1 vregs
                        ovf_full = (
                            vstack(
                                [
                                    jnp.where(o | bail_row, 1, 0)
                                    for o in ovf_rows
                                ]
                            )
                            > 0
                        )  # (SUB, G) bool
                        exp_ovf_v[:, :] = jnp.where(ovf_full, 1, 0)
                        ni_s = jnp.where(bail, 0.0, ni_f)[0, 0].astype(jnp.int32)
                        nv_s = jnp.where(bail, 0.0, nv_f)[0, 0].astype(jnp.int32)
                        if "countexp" in ablate:
                            acc[0:1, 10:11] += ni_f
                            acc[0:1, 11:12] += nv_f
                            acc[0:1, 12:13] += jnp.sum(
                                jnp.where(ovf_full, 1.0, 0.0)
                            )
                        # (2b) dst pass: recompute the masks (cheaper than
                        # holding K*SUB (M,G) selectors across the B dot) and
                        # emit per-(s,k) dsts in ONE weighted reduce each:
                        # dst = Sigma_m sel * (B[m] + rank) - 1, which fuses
                        # the old rank reduce + cluster-id extraction +
                        # one-hot B gather into a single pass.
                        rowoff = jnp.zeros((M, 1), f32)
                        for s in range(SUB):
                            m_s = jnp.where(slab_enter(cl_ref2[:, :], s), 1.0, 0.0)
                            csum = cl_prefix(m_s)
                            capped = m_s * jnp.where(
                                (csum <= np.float32(EK)) & ~ovf_rows[s], 1.0, 0.0
                            )
                            lp = jnp.dot(
                                capped, ltg, preferred_element_type=f32
                            )  # lane-inclusive rank within row
                            wgt = lp + rowoff + bb_  # (M, G): global rank + base
                            for k in range(EK):
                                sel = capped * jnp.where(
                                    csum == np.float32(k + 1), 1.0, 0.0
                                )
                                dst = (
                                    jnp.sum(sel * wgt, axis=0, keepdims=True)
                                    - 1.0
                                )  # -1 when the ray has no k-th cluster
                                exp_dst[s * EK + k : s * EK + k + 1, :] = (
                                    dst.astype(jnp.int32)
                                )
                            rowoff = rowoff + lp[:, G - 1 : G]

                        # (3) scatter ray-id byte planes to dense item slots
                        def sc_body(c):
                            base = c * ECH
                            tot = None
                            for s in range(SUB):
                                pm = jnp.zeros((ECH, G), f32)
                                for k in range(EK):
                                    d = exp_dst[s * EK + k : s * EK + k + 1, :] - base
                                    pm = jnp.maximum(
                                        pm, jnp.where(ch_iota == d, 1.0, 0.0)
                                    )
                                lane_lin = s * G + g_iota_row  # (1, G)
                                vals = jnp.concatenate(
                                    [
                                        (lane_lin >> 8).astype(f32),
                                        (lane_lin & 255).astype(f32),
                                    ],
                                    axis=0,
                                )  # (2, G) byte planes, bf16-exact
                                part = jax.lax.dot_general(
                                    vals, pm, ddp2, preferred_element_type=f32
                                )  # (2, ECH)
                                tot = part if tot is None else tot + part
                            cc = jnp.minimum(c, NIQ - 1)
                            exp_rid_planes[
                                0:2, pl.ds(pl.multiple_of(cc * ECH, ECH), ECH)
                            ] = tot
                            return c + 1

                        jax.lax.while_loop(
                            lambda c: c * ECH < ni_s, sc_body, jnp.int32(0)
                        )
                        rid_all = jnp.clip(
                            (
                                jnp.floor(exp_rid_planes[0:1, :] + 0.5).astype(
                                    jnp.int32
                                )
                                << 8
                            )
                            | jnp.floor(exp_rid_planes[1:2, :] + 0.5).astype(
                                jnp.int32
                            ),
                            0,
                            R - 1,
                        )  # (1, ENI)

                        # (4) item -> cluster (searchsorted over bb_), packed
                        # with the scattered ray id into the dense meta rows,
                        # and the visit tables (cluster + start item per visit)
                        for b in range(8):
                            ii = (
                                jax.lax.broadcasted_iota(jnp.int32, (M, ENIB), 1)
                                + b * ENIB
                            ).astype(f32)
                            cnt = jnp.sum(
                                jnp.where(ii >= bb_, 1.0, 0.0),
                                axis=0,
                                keepdims=True,
                            )
                            icl_b = (cnt - 1.0).astype(jnp.int32)
                            rid_b = rid_all[0:1, b * ENIB : (b + 1) * ENIB]
                            exp_meta_v[b : b + 1, :] = (icl_b << 12) | rid_b
                        shift1 = jnp.where(
                            jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
                            == jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) - 1,
                            1.0,
                            0.0,
                        )  # S @ x = x shifted down one (row 0 -> 0)
                        db_ = bb_ - jnp.dot(
                            shift1, bb_, preferred_element_type=f32, precision=hp
                        )
                        dbv = bv_ - jnp.dot(
                            shift1, bv_, preferred_element_type=f32, precision=hp
                        )
                        for b in range(8):
                            vv = (
                                jax.lax.broadcasted_iota(jnp.int32, (M, ENVB), 1)
                                + b * ENVB
                            ).astype(f32)
                            cmp = jnp.where(vv >= bv_, 1.0, 0.0)
                            vc = jnp.sum(cmp, axis=0, keepdims=True) - 1.0
                            bd_at = jnp.sum(cmp * db_, axis=0, keepdims=True)
                            bv_at = jnp.sum(cmp * dbv, axis=0, keepdims=True)
                            vst = bd_at + 8.0 * (vv[0:1, :] - bv_at)
                            exp_vis_v[b : b + 1, :] = (
                                jnp.clip(vc, 0, n_cl_tab - 1).astype(jnp.int32)
                                << 14
                            ) | jnp.clip(vst, 0, ENI - 8).astype(jnp.int32)
                        dma_to(exp_meta_v, exp_meta_s)
                        dma_to(exp_vis_v, exp_vis_s)

                        # (5) visits: 8-item windows vs one cluster's slots
                        def vis_body(c):
                            v = c
                            for _u in range(_EXP_UNROLL):
                                vc2 = jnp.minimum(v, ENV - 1)
                                ev = exp_vis_s[vc2 >> log2envb, vc2 & (ENVB - 1)]
                                cic = ev >> 14
                                stc = ev & 16383
                                sl = slots_ref2[
                                    :,
                                    pl.ds(
                                        pl.multiple_of(
                                            cic * CLUSTER_SLOTS, CLUSTER_SLOTS
                                        ),
                                        CLUSTER_SLOTS,
                                    ),
                                ]
                                its = []
                                for j in range(8):
                                    ix = stc + j
                                    rj = (
                                        exp_meta_s[ix >> log2enib, ix & (ENIB - 1)]
                                        & 4095
                                    )
                                    its.append(exp_rays_t[pl.ds(rj, 1), :])
                                itm = jnp.concatenate(its, axis=0)  # (8, 8)
                                exp_res_v[pl.ds(stc, 8), 0:1] = flavor(sl, itm)
                                v = v + 1
                            return v

                        jax.lax.while_loop(
                            lambda v: v < nv_s, vis_body, jnp.int32(0)
                        )

                        # (6) lane-major key copy (SMEM is (8,128)-tiled: the
                        # (ENI, 1) layout the visits need would pad 8x past
                        # the budget) then the scalar item -> ray reduction
                        resf = pltpu.bitcast(exp_res_v[:, :], f32)  # exact move
                        for b in range(8):
                            row = jnp.concatenate(
                                [
                                    resf[
                                        b * ENIB + q * 128 : b * ENIB
                                        + (q + 1) * 128,
                                        0:1,
                                    ].T
                                    for q in range(ENIB // 128)
                                ],
                                axis=1,
                            )  # (1, ENIB)
                            exp_resrow_v[b : b + 1, :] = pltpu.bitcast(
                                row, jnp.int32
                            )
                        dma_to(exp_best_v, exp_best_s)
                        dma_to(exp_resrow_v, exp_res_s)

                        def red_body(c):
                            j = c
                            for _u in range(_EXP_RED_UNROLL):
                                jc = jnp.minimum(j, ENI - 1)
                                jr = jc >> log2enib
                                jl = jc & (ENIB - 1)
                                em = exp_meta_s[jr, jl]
                                r = em & 4095
                                ic = em >> 12
                                key = exp_res_s[jr, jl]
                                row = r >> log2g
                                lane = r & (G - 1)
                                b = exp_best_s[row, lane]
                                # Strict < on the TRUNCATED t (slot bits
                                # masked): items arrive in ascending-cluster
                                # order, so cross-cluster truncated-t ties
                                # resolve to the earlier cluster — exactly the
                                # row sweep's visit-order tie-break.  (Within
                                # a cluster the visit's packed min already
                                # picked the lowest slot, as the sweep does.)
                                bet = (key & ~127) < b
                                exp_best_s[row, lane] = jnp.where(
                                    bet, key & ~127, b
                                )
                                cs = ic * CLUSTER_SLOTS + (key & 127)
                                exp_best_s[SUB + row, lane] = jnp.where(
                                    bet, cs, exp_best_s[SUB + row, lane]
                                )
                                j = j + 1
                            return j

                        jax.lax.while_loop(
                            lambda j: j < ni_s, red_body, jnp.int32(0)
                        )
                        if "expdump:" in ablate and shade_base != 0:
                            # debug: 128 packed meta/key words from item
                            # offset lo (row-aligned) -> acc
                            lo_d = int(ablate.split("expdump:")[1].split()[0])
                            br, bl = lo_d // ENIB, lo_d % ENIB
                            acc[0:1, 128:256] += exp_meta_v[
                                br : br + 1, bl : bl + 128
                            ].astype(f32)  # (icl << 12) | rid
                            acc[8:9, 128:256] += pltpu.bitcast(
                                exp_resrow_v[br : br + 1, bl : bl + 128], f32
                            )  # keys as f32 t
                        dma_to(exp_best_s, exp_best_v)
                    ovf_full = exp_ovf_v[:, :] > 0
                    keyv = exp_best_v[0:SUB, :]
                    csv = exp_best_v[SUB : 2 * SUB, :]
                    btv = pltpu.bitcast(keyv & ~127, f32)
                    bb2 = btv < bt_t  # false for the INT_MAX/NaN no-winner
                    bt_t = jnp.where(bb2, btv, bt_t)
                    bi_t = jnp.where(bb2, shade_base + csv, bi_t)
                    return bt_t, bi_t, ovf_full

            def cluster_nearest():
                bt_t = jnp.full((SUB, G), BIG_TRUNC, f32)
                bi_t = jnp.zeros((SUB, G), jnp.int32)
                # Stage the (possibly just-claimed) ray rows so the sweep
                # can read any lane-row group at a dynamic offset.
                for f_i, val in enumerate((ox, oy, oz, dx, dy, dz, a, inv_a)):
                    rays_scr[f_i * SUB : (f_i + 1) * SUB, :] = val
                if expand_sweep:
                    n_act_cl = jnp.sum(jnp.where(active, 1, 0))
                    # Ray-on-sublane transposed pool copy: visits gather
                    # their 8 items' state as sublane-dynamic (1, 8)
                    # slices (exact data movement, no matmul round trip).
                    for s in range(SUB):
                        rows8 = jnp.concatenate(
                            [
                                x[s : s + 1, :]
                                for x in (ox, oy, oz, dx, dy, dz, a, inv_a)
                            ],
                            axis=0,
                        )  # (8, G)
                        exp_rays_t[s * G : (s + 1) * G, :] = rows8.T
                # n_sph_chunks / n_tri_chunks double as set-present flags in
                # clustered mode (host sets them to 1 when the set is live).
                if n_sph_chunks:
                    lane_mask = None
                    if expand_sweep:
                        bt_t, bi_t, lane_mask = expansion_set(
                            scl_ref, sslots_ref, sph_visit_key, 0, bt_t,
                            bi_t, n_act_cl,
                        )
                    mask = pool_enter_mask(ssup_ref[:, :], lane_mask)
                    n_ent = stage_super_list(mask)
                    n_rows, cl_mask_total = build_segments(
                        n_ent, scl_ref, lane_mask
                    )
                    if "countent" in ablate:  # debug: entered supers /
                        # clusters per frame via the image accumulator
                        acc[0:1, 2:3] += n_ent.astype(f32)
                        acc[0:1, 3:4] += cl_mask_total
                    if stream_slots:
                        bt_t, bi_t = sweep_entered_streamed(
                            n_rows, sslots_ref, sslots_ref.shape[0],
                            sph_chunk_key, 0, bt_t, bi_t,
                        )
                    else:
                        bt_t, bi_t = sweep_entered(
                            n_rows, sslots_ref, sph_chunk_key, 0, bt_t, bi_t
                        )
                if n_tri_chunks:
                    lane_mask = None
                    if expand_sweep:
                        bt_pre = bt_t
                        bt_t, bi_t, lane_mask = expansion_set(
                            tcl_ref, tslots_ref, tri_visit_key, n_sph_slots,
                            bt_t, bi_t, n_act_cl,
                        )
                        if "expcheck" in ablate:
                            # debug: full row sweep from the same pre
                            # state; non-overflow lanes MUST agree.
                            n_ent_d = stage_super_list(
                                pool_enter_mask(tsup_ref[:, :])
                            )
                            n_rows_d, _ = build_segments(n_ent_d, tcl_ref)
                            bt_f, bi_f = sweep_entered(
                                n_rows_d, tslots_ref, tri_chunk_key,
                                n_sph_slots, bt_pre,
                                jnp.zeros((SUB, G), jnp.int32),
                            )
                            mism = (
                                ~lane_mask & active & (bt_t != bt_f)
                            )
                            acc[0:1, 13:14] += jnp.sum(
                                jnp.where(mism, 1.0, 0.0)
                            )
                            mism_bi = (
                                ~lane_mask
                                & active
                                & (bt_f < bt_pre)
                                & (bi_t != bi_f)
                            )
                            acc[0:1, 14:15] += jnp.sum(
                                jnp.where(mism_bi, 1.0, 0.0)
                            )
                            acc[0:1, 15:16] += jnp.sum(
                                jnp.where(~lane_mask & active, 1.0, 0.0)
                            )  # checked-lane denominator
                            # bi can legitimately differ on equal-TRUNCATED-t
                            # ties at shared triangle edges: the row sweep
                            # tests clusters entered by ANY ray of the
                            # row-group, so a tie candidate whose AABB the
                            # ray's own slab test culled (grazing-interval
                            # rounding) can win there.  bt equality is the
                            # hard invariant; mism_bi is reported separately.
                            mism = mism | mism_bi
                            mism_f = jnp.where(mism, 1.0, 0.0)
                            acc[0:1, 64 : 64 + G] += jnp.sum(
                                mism_f, axis=0, keepdims=True
                            )
                            for s_d in range(SUB):
                                acc[0:1, 96 + s_d : 97 + s_d] += jnp.sum(
                                    mism_f[s_d : s_d + 1, :],
                                    axis=1,
                                    keepdims=True,
                                )
                    n_ent = stage_super_list(
                        pool_enter_mask(tsup_ref[:, :], lane_mask)
                    )
                    n_rows, tri_cl_total = build_segments(
                        n_ent, tcl_ref, lane_mask
                    )
                    if "countent" in ablate:  # debug: tri-set sweep visits
                        acc[0:1, 7:8] += tri_cl_total
                    if stream_slots:
                        bt_t, bi_t = sweep_entered_streamed(
                            n_rows, tslots_ref, tslots_ref.shape[0],
                            tri_chunk_key, n_sph_slots, bt_t, bi_t,
                        )
                    else:
                        bt_t, bi_t = sweep_entered(
                            n_rows, tslots_ref, tri_chunk_key, n_sph_slots,
                            bt_t, bi_t,
                        )
                if "countrow" in ablate:
                    # Design probe: per-row vs pool entered-CLUSTER unions
                    # (brute slab over the full cluster tables; debug only).
                    for cl_ref_dbg, flag in (
                        (scl_ref, n_sph_chunks),
                        (tcl_ref, n_tri_chunks),
                    ):
                        if not flag:
                            continue
                        pool_m = jnp.zeros((cl_ref_dbg.shape[0], 1), jnp.int32)
                        row_tot = jnp.zeros((), f32)
                        for s in range(SUB):
                            ms = jnp.max(
                                slab_enter(cl_ref_dbg[:, :], s).astype(jnp.int32),
                                axis=1,
                                keepdims=True,
                            )
                            row_tot = row_tot + jnp.sum(ms).astype(f32)
                            pool_m = jnp.maximum(pool_m, ms)
                        acc[0:1, 4:5] += jnp.sum(pool_m).astype(f32)  # U_pool
                        acc[0:1, 5:6] += row_tot  # sum_s U_row
                return bt_t < BIG_TRUNC, bt_t, bi_t

            def winner_fetch(hit_m, bi_m):
                """Gather winners' shade features: every lane's final winner
                lives in some cluster that improved it during the sweep, so
                the set of winner clusters is small (<= distinct winners).
                Build per-super winner segments (global cluster numbering:
                shade slot == global_cluster * 128 + local), DMA each winner
                cluster's [128, 2F] shade slice from HBM, and accumulate the
                one-hot feature matmul into feat_scr."""
                win_cl = jnp.where(hit_m, bi_m >> 7, -1)
                win_sup = jnp.where(hit_m, bi_m >> 13, -1)
                sup_iota = jax.lax.broadcasted_iota(jnp.int32, (ns_pad, G), 0)
                m = jnp.zeros((ns_pad, 1), jnp.int32)
                for s in range(SUB):
                    eq = win_sup[s : s + 1, :] == sup_iota
                    m = jnp.maximum(
                        m, jnp.max(eq.astype(jnp.int32), axis=1, keepdims=True)
                    )
                # compact_col preserves ascending ids, so the staged list
                # holds sphere winner supers first (global super ids order
                # spheres before triangles) — the inline fetch walks the
                # two ranges against their own slot tables.
                n_sph_went = jnp.sum(m[: ms_pad // SUPER_SLOTS])
                n_went = stage_super_list(m)

                cl_iota = jax.lax.broadcasted_iota(jnp.int32, (SUPER_SLOTS, G), 0)

                def winner_members(gsid):
                    m64 = jnp.zeros((SUPER_SLOTS, 1), jnp.int32)
                    base = gsid * SUPER_SLOTS
                    for s in range(SUB):
                        eq = win_cl[s : s + 1, :] == (cl_iota + base)
                        m64 = jnp.maximum(
                            m64,
                            jnp.max(eq.astype(jnp.int32), axis=1, keepdims=True),
                        )
                    return m64

                def winner_members_g(gsid, g):
                    """Winner-membership restricted to fetch group g's
                    state rows (the pool is bin-sorted, so a cluster's
                    winners concentrate in one group)."""
                    m64 = jnp.zeros((SUPER_SLOTS, 1), jnp.int32)
                    base = gsid * SUPER_SLOTS
                    for s in range(g * RPGF, (g + 1) * RPGF):
                        eq = win_cl[s : s + 1, :] == (cl_iota + base)
                        m64 = jnp.maximum(
                            m64,
                            jnp.max(eq.astype(jnp.int32), axis=1, keepdims=True),
                        )
                    return m64

                def build_segments_grouped(n_ent):
                    """Per (winner super, fetch group) segment rows, written
                    compactly into per-group worklist REGIONS (region g =
                    rows [g*FSTRIDE, g*FSTRIDE + p_g)), plus the per-LANE
                    VISIT ORDINAL ``ordv`` [SUB, G]: the position of each
                    lane's winner cluster in its region's fetch sequence
                    (-1 for misses).  The fetch loop then matches lanes
                    with a PURE-VECTOR compare (ordv == running counter) —
                    every per-visit scalar->vector broadcast alternative
                    (splat, roll+[1,1] bcast, M=1 one-hot dot) measured
                    ~1.1 us/visit on v5e, which WAS the entire blob fetch
                    cost.  Returns (per-group counts, per-group sph/tri
                    boundaries, total clusters, ordv)."""
                    ord_sub_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (SUB, G), 0
                    )

                    def seg_body(c):
                        j = c[0]
                        ps = list(c[1 : 1 + NGF])
                        sphc = list(c[1 + NGF : 1 + 2 * NGF])
                        ebs = list(c[1 + 2 * NGF : 1 + 3 * NGF])
                        tot = c[1 + 3 * NGF]
                        ordv_c = c[2 + 3 * NGF]
                        for _u in range(_SEG_UNROLL):
                            jc = jnp.minimum(j, _WL_ROWS - 1)
                            sid = jnp.maximum(sup_smem[0, jc], 0)
                            valid = j < n_ent
                            base = sid * SUPER_SLOTS
                            for g in range(NGF):
                                eqs = []
                                m64 = jnp.zeros((SUPER_SLOTS, 1), jnp.int32)
                                for s in range(g * RPGF, (g + 1) * RPGF):
                                    eq = win_cl[s : s + 1, :] == (
                                        cl_iota + base
                                    )
                                    eqs.append(eq)
                                    m64 = jnp.maximum(
                                        m64,
                                        jnp.max(
                                            eq.astype(jnp.int32),
                                            axis=1,
                                            keepdims=True,
                                        ),
                                    )
                                seg = compact_col(m64)
                                seg = jnp.where(
                                    seg >= 0, seg + sid * SUPER_SLOTS, -1
                                )
                                cnt = jnp.sum(m64, axis=0, keepdims=True)
                                # rank of each member cluster within the
                                # segment (same prefix the fetch walks)
                                k64 = m64.shape[0]
                                tri_lo = (
                                    jax.lax.broadcasted_iota(
                                        jnp.int32, (k64, k64), 1
                                    )
                                    <= jax.lax.broadcasted_iota(
                                        jnp.int32, (k64, k64), 0
                                    )
                                ).astype(f32)
                                rank64 = (
                                    jnp.dot(
                                        tri_lo,
                                        m64.astype(f32),
                                        preferred_element_type=f32,
                                    )
                                    - 1.0
                                )  # [64, 1]
                                vf = jnp.where(valid, 1.0, 0.0)
                                for ri, s in enumerate(
                                    range(g * RPGF, (g + 1) * RPGF)
                                ):
                                    contrib = jnp.sum(
                                        jnp.where(eqs[ri], 1.0, 0.0)
                                        * (rank64 + ebs[g] + 1.0),
                                        axis=0,
                                        keepdims=True,
                                    )  # [1, G]: ordinal + 1 (0 if none)
                                    ordv_c = ordv_c + jnp.where(
                                        ord_sub_iota == s,
                                        jnp.broadcast_to(
                                            contrib * vf, (SUB, G)
                                        ),
                                        0.0,
                                    )
                                segp = jnp.concatenate(
                                    [seg, jnp.full((1, 64), -1, jnp.int32)],
                                    axis=1,
                                )
                                rowv = jnp.where(
                                    lane128 == 64,
                                    jnp.broadcast_to(cnt, (1, 128)),
                                    segp,
                                )
                                keep = valid & (cnt[0, 0] > 0)
                                pc = jnp.minimum(
                                    g * FSTRIDE + ps[g], _WL_ROWS - 1
                                )
                                old = wl_vmem[pl.ds(pc, 1), :]
                                wl_vmem[pl.ds(pc, 1), :] = jnp.where(
                                    keep, rowv, old
                                )
                                ps[g] = ps[g] + jnp.where(keep, 1, 0)
                                ebs[g] = ebs[g] + cnt[0, 0].astype(
                                    f32
                                ) * jnp.where(valid, 1.0, 0.0)
                                tot = tot + cnt.astype(f32) * jnp.where(
                                    valid, 1.0, 0.0
                                )
                            j = j + 1
                            at_b = j == n_sph_went
                            sphc = [
                                jnp.where(at_b, ps[g], sphc[g])
                                for g in range(NGF)
                            ]
                        return tuple(
                            [j] + ps + sphc + ebs + [tot, ordv_c]
                        )

                    z = jnp.int32(0)
                    zf = jnp.zeros((), f32)
                    init = tuple(
                        [z]
                        + [z] * (2 * NGF)
                        + [zf] * NGF
                        + [
                            jnp.zeros((1, 1), f32),
                            jnp.full((SUB, G), -1.0, f32),
                        ]
                    )
                    out = jax.lax.while_loop(
                        lambda c: c[0] < n_ent, seg_body, init
                    )
                    dma_to(wl_vmem, wl_smem)
                    return (
                        list(out[1 : 1 + NGF]),
                        list(out[1 + NGF : 1 + 2 * NGF]),
                        out[1 + 3 * NGF],
                        out[2 + 3 * NGF],
                    )

                if "fetchnoseg" in ablate:
                    return
                grouped = NGF > 1 and inline_shade
                if grouped:
                    ps_g, sphc_g, win_total, ordv = build_segments_grouped(
                        n_went
                    )
                else:
                    win_total = build_segments_pool(n_went, winner_members)
                if "countfetch" in ablate:  # debug: winner cluster visits
                    acc[0:1, 6:7] += win_total

                feat_scr[:, :] = jnp.zeros(feat_scr.shape, f32)
                # Winner (cluster, local-slot) ids as f32 vectors, computed
                # ONCE per bounce: the in-loop one-hot is then a loop-
                # invariant-iota compare AND a [1,G] cluster-id compare —
                # an iota+scalar-offset construction inside the while loop
                # measured ~12 us per one-hot (92% of the fetch pass).
                bi_loc = (bi_m & 127).astype(f32)  # [SUB, G]
                bi_cl = jnp.where(hit_m, bi_m >> 7, -1).astype(f32)
                loc_iota_col = jax.lax.broadcasted_iota(
                    jnp.int32, (CLUSTER_SLOTS, 1), 0
                ).astype(f32)

                # Ring fetch in THREE sem/vector-segregated loops: mixing
                # semaphore ops (DMA start/wait) with vector work in one
                # nested-while body measured ~43 us/step of serialization
                # (the whole fetch was 85% of a 160k-scene frame), while
                # each loop kind alone runs at sub-us/step.  So per chunk
                # of up to _FETCH_RING winners: (1) a scalar-only loop
                # starts every DMA, (2) a scalar-only loop waits them,
                # (3) a sem-free vector loop does the one-hot matmuls.
                def entry_gci(j, k):
                    jc = jnp.minimum(j, _WL_ROWS - 1)
                    return jnp.maximum(wl_smem[jc, jnp.minimum(k, 63)], 0)

                k_sel_iota = jax.lax.broadcasted_iota(jnp.int32, (128, G), 0)

                def entry_gci_vec(jc, kc):
                    """Worklist id at (row jc, lane kc) broadcast across
                    lanes as a VECTOR [1, G] f32 — via a vector row load +
                    an MXU one-hot broadcast.  A general i32/f32
                    scalar->vector splat inside these while loops measures
                    ~1.1 us per visit on v5e (the entire closed-blob fetch
                    cost, round-4 bisect), and a dynamic-shift roll +
                    [1,1] lane-broadcast costs the same; iota-vs-scalar
                    compares and scalar ADDRESSING are cheap, so the
                    broadcast rides a [1,128] @ [128,G] dot instead."""
                    rowi = wl_vmem[pl.ds(jc, 1), :]  # [1, 128] i32
                    rowf = jnp.maximum(rowi, 0).astype(f32)
                    sel = (k_sel_iota == kc).astype(f32)  # iota cmp: cheap
                    if "fetchnogvdot" in ablate:  # probe: skip the M=1 dot
                        return rowf * sel[0:1, :128]
                    if "fetchnorow" in ablate:  # probe: skip the row load
                        return jnp.sum(sel[0:1, :], axis=0, keepdims=True)
                    gv = jnp.dot(
                        rowf, sel, preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [1, G]; ids < 2^22 round back exactly
                    return jnp.floor(gv + 0.5)

                def fetch_dma(j, k, slot):
                    gci = entry_gci(j, k)
                    return pltpu.make_async_copy(
                        shade_hbm_ref.at[
                            pl.ds(pl.multiple_of(gci * 2 * F, 8), 2 * F), :
                        ],
                        slice_vmem.at[
                            pl.ds(pl.multiple_of(slot * 2 * F, 8), 2 * F), :
                        ],
                        fetch_sems.at[slot],
                    )

                def advance(j, k):
                    cnt = wl_smem[jnp.minimum(j, _WL_ROWS - 1), 64]
                    k2 = k + 1
                    roll = k2 >= cnt
                    return jnp.where(roll, j + 1, j), jnp.where(roll, 0, k2)

                if inline_shade:
                    # INLINE fetch (the default): winners' geometry and
                    # shade essentials live in the VMEM slot tables
                    # (cluster.build_essentials fills the sublane-pad
                    # rows), so the fetch is a sem-free while loop of
                    # one-hot matmuls — no HBM DMA at all.  Per-winner HBM
                    # block DMAs measured ~42 us each on this platform
                    # (85% of a 160k-scene frame) regardless of buffering
                    # structure.  HIGHEST precision reproduces the float
                    # VALUES to ~2^-22 rel and the e3 int row (< 2^22) to
                    # within +-0.25, which rounds back exactly.
                    def inline_fetch(lo, hi, slots_ref, nrows, cl_off):
                        # Accumulate into a WHILE CARRY (not scratch) and
                        # visit _FETCH_UNROLL * _FETCH_KB winners per step
                        # — while-loop iterations in this kernel carry
                        # ~15 us of boundary overhead (see sweep_entered),
                        # and per-visit dots serialize on the fc chain +
                        # small-matmul latency (75% of a 360k iter, ~99%
                        # of a closed-blob iter, round-4 probes).  So each
                        # dot now covers _FETCH_KB clusters K-stacked
                        # ([nrows, KB*128] @ [KB*128, SUB*G]): same MACs,
                        # KB-fold fewer chain links.  Masked tail visits
                        # use gci_f = -2, which matches no lane's winner
                        # cluster (bi_cl is >= 0 or -1).
                        n_cl_tab = slots_ref.shape[1] // CLUSTER_SLOTS
                        KB = _FETCH_KB

                        def icond(c):
                            return c[0] < hi

                        def ibody(c):
                            j, k, fc = c
                            for _u in range(_FETCH_UNROLL):
                                sls, ohbs = [], []
                                for _b in range(KB):
                                    valid = j < hi
                                    gci = entry_gci(j, k)  # addressing only
                                    gv = entry_gci_vec(
                                        jnp.minimum(j, _WL_ROWS - 1),
                                        jnp.minimum(k, 63),
                                    )
                                    gci_f = jnp.where(valid, gv, -2.0)
                                    ci = jnp.clip(gci - cl_off, 0, n_cl_tab - 1)
                                    base = pl.multiple_of(
                                        ci * CLUSTER_SLOTS, CLUSTER_SLOTS
                                    )
                                    sls.append(
                                        slots_ref[:, pl.ds(base, CLUSTER_SLOTS)]
                                    )
                                    ohs = [
                                        jnp.where(
                                            (loc_iota_col == bi_loc[s : s + 1, :])
                                            & (bi_cl[s : s + 1, :] == gci_f),
                                            1.0,
                                            0.0,
                                        )
                                        for s in range(SUB)
                                    ]
                                    ohbs.append(jnp.concatenate(ohs, axis=1))
                                    j, k = advance(j, k)
                                sl = (
                                    jnp.concatenate(sls, axis=1)
                                    if KB > 1
                                    else sls[0]
                                )  # [nrows, KB*128]
                                oh_all = (
                                    jnp.concatenate(ohbs, axis=0)
                                    if KB > 1
                                    else ohbs[0]
                                )  # [KB*128, SUB*G]
                                if "fetchnodot" in ablate:
                                    # probe: loop + slices + oh, no matmul
                                    fc = fc + jnp.sum(
                                        sl, axis=1, keepdims=True
                                    ) + jnp.sum(oh_all[0:1, :], axis=0,
                                                keepdims=True)
                                    continue
                                if "fetchconstoh" in ablate:
                                    # probe: loop + slices + matmul with a
                                    # loop-invariant one-hot (oh build cost
                                    # excluded)
                                    oh_all = jnp.full(
                                        (KB * CLUSTER_SLOTS, SUB * G),
                                        0.001,
                                        f32,
                                    )
                                fc = fc + jnp.dot(
                                    sl,
                                    oh_all,
                                    preferred_element_type=f32,
                                    precision=jax.lax.Precision.HIGHEST,
                                )  # [nrows, SUB*G], exact f32
                            return (j, k, fc)

                        feat0 = jnp.zeros((nrows, SUB * G), f32)
                        _, _, feat = jax.lax.while_loop(
                            icond, ibody, (lo, jnp.int32(0), feat0)
                        )
                        return feat

                    def inline_fetch_ord(lo, hi, slots_ref, nrows, cl_off, g, nvec0):
                        """Group-g inline fetch over region g's worklist
                        rows, ORDINAL-MATCHED: per visit the dot is
                        sl @ locmatch with a LOOP-INVARIANT B operand
                        (sl @ (locmatch*clmask) == (sl @ locmatch)*clmask),
                        and lanes select their visit with a pure-vector
                        compare ordv == nvec.  Rationale (round-4 bisect,
                        v5e): a per-visit-varying MXU B operand or ANY
                        scalar->vector broadcast costs ~1.1 us/visit —
                        that was 99% of a closed-blob iteration; with
                        const-B dots + vector ordinals the same loop runs
                        at sweep-like ~20 ns/visit.  Returns (features
                        [nrows, RPGF*G], nvec after the range) — the
                        caller chains nvec from the sphere range into the
                        triangle range of the same region."""
                        n_cl_tab = slots_ref.shape[1] // CLUSTER_SLOTS
                        base_row = g * FSTRIDE
                        ov = ordv[g * RPGF : (g + 1) * RPGF, :]
                        locm = [
                            (loc_iota_col == bi_loc[s : s + 1, :]).astype(f32)
                            for s in range(g * RPGF, (g + 1) * RPGF)
                        ]  # loop-invariant [128, G] one-hots

                        def egci(j, k):
                            jc = jnp.minimum(base_row + j, _WL_ROWS - 1)
                            return jnp.maximum(
                                wl_smem[jc, jnp.minimum(k, 63)], 0
                            )

                        def adv(j, k):
                            cnt = wl_smem[
                                jnp.minimum(base_row + j, _WL_ROWS - 1), 64
                            ]
                            k2 = k + 1
                            roll = k2 >= cnt
                            return (
                                jnp.where(roll, j + 1, j),
                                jnp.where(roll, 0, k2),
                            )

                        def icond(c):
                            return c[0] < hi

                        def ibody(c):
                            j, k, nvec = c[0], c[1], c[2]
                            fcs = list(c[3:])
                            for _u in range(_FETCH_UNROLL * _FETCH_KB):
                                valid = j < hi
                                gci = egci(j, k)  # scalar: addressing only
                                ci = jnp.clip(gci - cl_off, 0, n_cl_tab - 1)
                                base = pl.multiple_of(
                                    ci * CLUSTER_SLOTS, CLUSTER_SLOTS
                                )
                                if "fconstsl" in ablate:  # probe: static slice
                                    sl = slots_ref[:, 0:CLUSTER_SLOTS]
                                else:
                                    sl = slots_ref[:, pl.ds(base, CLUSTER_SLOTS)]
                                for r in range(RPGF):
                                    clm = (ov[r : r + 1, :] == nvec) & valid
                                    if "fnodot2" in ablate:  # probe: no dot
                                        pd = sl[:, 0:G] if G <= 128 else None
                                    else:
                                        pd = jnp.dot(
                                            sl,
                                            locm[r],
                                            preferred_element_type=f32,
                                            precision=jax.lax.Precision.HIGHEST,
                                        )  # [nrows, G], B loop-invariant
                                    if "fdotdup" in ablate:  # probe: + a
                                        # 2nd per-visit fetch dot+slice
                                        # (results unchanged: zero-masked;
                                        # scaled B defeats CSE)
                                        pd2 = jnp.dot(
                                            sl,
                                            locm[r] * np.float32(0.5),
                                            preferred_element_type=f32,
                                            precision=jax.lax.Precision.HIGHEST,
                                        )
                                        pd = pd + jnp.where(
                                            clm & (nvec < -1.0), pd2, 0.0
                                        )
                                    if "fnoclm" in ablate:  # probe: no select
                                        fcs[r] = fcs[r] + pd
                                    else:
                                        fcs[r] = fcs[r] + jnp.where(
                                            clm, pd, 0.0
                                        )
                                nvec = nvec + jnp.where(valid, 1.0, 0.0)
                                j, k = adv(j, k)
                            return tuple([j, k, nvec] + fcs)

                        init = tuple(
                            [lo, jnp.int32(0), nvec0]
                            + [jnp.zeros((nrows, G), f32)] * RPGF
                        )
                        out = jax.lax.while_loop(icond, ibody, init)
                        feat = (
                            jnp.concatenate(out[3:], axis=1)
                            if RPGF > 1
                            else out[3]
                        )
                        return feat, out[2]

                    tri_rows = tslots_ref.shape[0]  # 16, or 24 with UVs
                    feat_s = jnp.zeros((8, SUB * G), f32)
                    feat_t = jnp.zeros((tri_rows, SUB * G), f32)
                    if "fetchnoloop" not in ablate and grouped:
                        fs_blocks, ft_blocks = [], []
                        for g in range(NGF):
                            nv = jnp.zeros((1, G), f32)
                            if n_sph_chunks:
                                f_g, nv = inline_fetch_ord(
                                    jnp.int32(0), sphc_g[g],
                                    sslots_ref, 8, 0, g, nv,
                                )
                                fs_blocks.append(f_g)
                            if n_tri_chunks:
                                f_g, nv = inline_fetch_ord(
                                    sphc_g[g], ps_g[g],
                                    tslots_ref, tri_rows, ms_pad, g, nv,
                                )
                                ft_blocks.append(f_g)
                        if fs_blocks:
                            feat_s = jnp.concatenate(fs_blocks, axis=1)
                        if ft_blocks:
                            feat_t = jnp.concatenate(ft_blocks, axis=1)
                    elif "fetchnoloop" not in ablate:
                        if n_sph_chunks:
                            feat_s = inline_fetch(
                                jnp.int32(0), n_sph_went, sslots_ref, 8, 0
                            )
                        if n_tri_chunks:
                            feat_t = inline_fetch(
                                n_sph_went, n_went, tslots_ref, tri_rows, ms_pad
                            )

                    # Unpack the raw fetched rows into the standard shade
                    # features (see cluster.build_essentials layout).
                    # Sphere and triangle contributions live on disjoint
                    # lanes, so row r < 8 is simply their sum.
                    def RW(r):
                        def per_s(x):
                            return [
                                x[r : r + 1, s * G : (s + 1) * G]
                                for s in range(SUB)
                            ]

                        rows_t = per_s(feat_t)
                        if r < 8:
                            rows_s = per_s(feat_s)
                            return vstack(
                                [a + b for a, b in zip(rows_s, rows_t)]
                            )
                        return vstack(rows_t)

                    FS_ = fast_shade
                    is_sph_lane = (bi_m < n_sph_slots) & hit_m
                    ev = [
                        jnp.where(is_sph_lane, RW(4 + q), RW(10 + q))
                        for q in range(4)
                    ]
                    e3i = jnp.floor(ev[3] + 0.5).astype(jnp.int32)
                    kind_i = (e3i >> 20) & 3
                    texk_i = (e3i >> 18) & 3
                    chk_i = (e3i >> 12) & 63
                    fuzz = (e3i & 0xFFF).astype(f32) * np.float32(1 / 4095)
                    is_d = kind_i == 2
                    ior = jnp.where(is_d, ev[0], 1.0)
                    ce_r = jnp.where(is_d, 1.0, ev[0])

                    # Checker side table: one stacked one-hot dot over the
                    # <= 64 deduplicated checkers of the scene.
                    chk_f = chk_i.astype(f32)
                    chk_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (128, 1), 0
                    ).astype(f32)
                    chk_ohs = [
                        jnp.where(chk_iota == chk_f[s : s + 1, :], 1.0, 0.0)
                        for s in range(SUB)
                    ]
                    chk_res = jnp.dot(
                        chk_ref[:, :],
                        jnp.concatenate(chk_ohs, axis=1),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [8, SUB*G]: inv_scale, even rgb, odd rgb, pad

                    def CRW(r):
                        return vstack(
                            [
                                chk_res[r : r + 1, s * G : (s + 1) * G]
                                for s in range(SUB)
                            ]
                        )

                    is_chk = texk_i == 1
                    is_img = texk_i == 2  # image prims are spheres (the
                    # inline_ok gate excludes image-textured triangles)
                    tnx_r, tny_r, tnz_r = RW(3), RW(4), RW(5)  # tri e1
                    t2x, t2y, t2z = RW(6), RW(7), RW(8)  # tri e2
                    cnx = tny_r * t2z - tnz_r * t2y
                    cny = tnz_r * t2x - tnx_r * t2z
                    cnz = tnx_r * t2y - tny_r * t2x
                    inv_cn = 1.0 / jnp.sqrt(
                        jnp.maximum(cnx * cnx + cny * cny + cnz * cnz, 1e-20)
                    )
                    computed = {
                        FS_.F_IS_SPHERE: jnp.where(is_sph_lane, 1.0, 0.0),
                        FS_.F_AX: RW(0),
                        FS_.F_AY: RW(1),
                        FS_.F_AZ: RW(2),
                        FS_.F_RADIUS: RW(3),
                        # tri flat normal; image SPHERES' facing dir rides
                        # the side table (entry rows 0-2; image triangles
                        # keep the derived normal).
                        FS_.F_NX: jnp.where(
                            is_img & is_sph_lane, CRW(0), cnx * inv_cn
                        ),
                        FS_.F_NY: jnp.where(
                            is_img & is_sph_lane, CRW(1), cny * inv_cn
                        ),
                        FS_.F_NZ: jnp.where(
                            is_img & is_sph_lane, CRW(2), cnz * inv_cn
                        ),
                        FS_.F_MAT_KIND: kind_i.astype(f32),
                        FS_.F_FUZZ: fuzz,
                        FS_.F_IOR: ior,
                        FS_.F_TEX_KIND: texk_i.astype(f32),
                        FS_.F_INV_SCALE: CRW(0),
                        FS_.F_CE + 0: jnp.where(is_chk, CRW(1), ce_r),
                        FS_.F_CE + 1: jnp.where(is_chk, CRW(2), ev[1]),
                        FS_.F_CE + 2: jnp.where(is_chk, CRW(3), ev[2]),
                        FS_.F_CO + 0: CRW(4),
                        FS_.F_CO + 1: CRW(5),
                        FS_.F_CO + 2: CRW(6),
                    }
                    if has_images:
                        zero = jnp.zeros((SUB, G), f32)
                        computed.update(
                            {
                                # image entry rows 3-6 = atlas rect.
                                FS_.F_RECT + 0: CRW(3),
                                FS_.F_RECT + 1: CRW(4),
                                FS_.F_RECT + 2: CRW(5),
                                FS_.F_RECT + 3: CRW(6),
                                # tri b/c verts for the barycentric UV
                                # block (a + e1 / a + e2); sphere lanes'
                                # values are garbage but is_sphere-gated.
                                FS_.F_BX: RW(0) + RW(3),
                                FS_.F_BY: RW(1) + RW(4),
                                FS_.F_BZ: RW(2) + RW(5),
                                FS_.F_CX: RW(0) + RW(6),
                                FS_.F_CY: RW(1) + RW(7),
                                FS_.F_CZ: RW(2) + RW(8),
                                # per-vertex UVs: tri-table rows 16-21
                                # when the scene has image triangles.
                                FS_.F_UVA + 0: RW(16) if tri_rows >= 22 else zero,
                                FS_.F_UVA + 1: RW(17) if tri_rows >= 22 else zero,
                                FS_.F_UVA + 2: RW(18) if tri_rows >= 22 else zero,
                                FS_.F_UVA + 3: RW(19) if tri_rows >= 22 else zero,
                                FS_.F_UVA + 4: RW(20) if tri_rows >= 22 else zero,
                                FS_.F_UVA + 5: RW(21) if tri_rows >= 22 else zero,
                            }
                        )
                    return computed

                # DOUBLE-BUFFERED ring halves (round 5, the
                # sweep_entered_streamed pattern): the next half's HBM
                # DMAs start BEFORE the current half's wait + matmuls, so
                # winner-block copies overlap the one-hot dots — the 1.7M
                # streamed row's bottleneck was this fetch running
                # start/wait/math strictly in sequence (round-4 ROADMAP).
                FHALF = _FETCH_RING // 2

                def start_half(j, k, buf):
                    def s_body(c2):
                        i, j2, k2 = c2
                        if "fetchnodma" not in ablate:
                            fetch_dma(j2, k2, buf * FHALF + i).start()
                        j3, k3 = advance(j2, k2)
                        return (i + 1, j3, k3)

                    return jax.lax.while_loop(
                        lambda c2: (c2[0] < FHALF) & (c2[1] < n_went),
                        s_body,
                        (jnp.int32(0), j, k),
                    )

                def fetch_pipe(c):
                    # (cursor of the in-flight half, its length, its ring
                    # half, cursor PAST it)
                    j0, k0, n_cur, buf, j1, k1 = c

                    # (1) start the NEXT half's DMAs into the other half
                    n_next, j2, k2 = start_half(j1, k1, 1 - buf)

                    # (2) wait the current half's DMAs
                    if "fetchnodma" not in ablate:

                        def w_body(c2):
                            i, j, k = c2
                            fetch_dma(j, k, buf * FHALF + i).wait()
                            j3, k3 = advance(j, k)
                            return (i + 1, j3, k3)

                        jax.lax.while_loop(
                            lambda c2: c2[0] < n_cur,
                            w_body,
                            (jnp.int32(0), j0, k0),
                        )

                    # (3) one-hot feature matmuls from the VMEM ring
                    def v_body(c3):
                        i, j, k = c3
                        gci_f = entry_gci_vec(
                            jnp.minimum(j, _WL_ROWS - 1), jnp.minimum(k, 63)
                        )  # vector id — no per-visit scalar splat
                        slot = buf * FHALF + i
                        sl = slice_vmem[
                            pl.ds(pl.multiple_of(slot * 2 * F, 8), 2 * F), :
                        ]  # [2F, 128] hi|lo feature rows
                        # NOTE: a winner-super's every segment entry has
                        # >= 1 winner by construction, so no step is
                        # invalid and no validity masking is needed.
                        if "fetchnomm" not in ablate:
                            # ONE stacked [2F,128] @ [128, SUB*G] dot.
                            ohs = [
                                jnp.where(
                                    (loc_iota_col == bi_loc[s : s + 1, :])
                                    & (bi_cl[s : s + 1, :] == gci_f),
                                    1.0,
                                    0.0,
                                )
                                for s in range(SUB)
                            ]
                            oh_all = jnp.concatenate(ohs, axis=1)
                            res = jnp.dot(
                                sl, oh_all, preferred_element_type=f32
                            )  # [2F, SUB*G]
                            for s in range(SUB):
                                r = res[:, s * G : (s + 1) * G]
                                feat_scr[pl.ds(s * F, F), :] += (
                                    r[:F] + r[F : 2 * F]
                                )
                        j2_, k2_ = advance(j, k)
                        return (i + 1, j2_, k2_)

                    jax.lax.while_loop(
                        lambda c3: c3[0] < n_cur,
                        v_body,
                        (jnp.int32(0), j0, k0),
                    )
                    return (j1, k1, n_next, 1 - buf, j2, k2)

                if "fetchnoloop" not in ablate:
                    n0, j1_0, k1_0 = start_half(jnp.int32(0), jnp.int32(0), 0)
                    jax.lax.while_loop(
                        lambda c: c[2] > 0,
                        fetch_pipe,
                        (
                            jnp.int32(0), jnp.int32(0), n0, jnp.int32(0),
                            j1_0, k1_0,
                        ),
                    )
                    if "countfetch" in ablate:  # debug: winner supers,
                        # recovered from the image accumulator.
                        acc[0:1, 1:2] += n_went.astype(f32)

        if "nointersect" in ablate:  # timing ablation: constant near hit
            hit = jnp.full((SUB, G), True)
            t = jnp.full((SUB, G), 1.0, f32)
            prim = jnp.zeros((SUB, G), jnp.int32)
        elif clustered:
            hit, t, prim = cluster_nearest()
        else:
            groups = [
                lane_group_intersect(
                    ox[s : s + 1, :], oy[s : s + 1, :], oz[s : s + 1, :],
                    dx[s : s + 1, :], dy[s : s + 1, :], dz[s : s + 1, :],
                    a[s : s + 1, :], inv_a[s : s + 1, :],
                )
                for s in range(SUB)
            ]
            if packed_select:
                best = vstack(groups)
                hit = best < big_key
                t = pltpu.bitcast(best & ~id_mask, f32)
                prim = best & id_mask
            else:
                t = vstack([g[0] for g in groups])
                prim = vstack([g[1] for g in groups])
                hit = t < BIG
                prim = jnp.where(hit, prim, 0)

        # ---- shade-table fetch -------------------------------------------
        _row_cache = {}
        if clustered:
            # Winner-cluster fetch (see winner_fetch): inline mode returns
            # the unpacked feature dict; the image-scene DMA mode fills
            # feat_scr with full-precision feature columns.  Missed lanes
            # keep zeros (every downstream consumer is hit/cont-masked).
            computed = None
            if "nofetch" not in ablate:
                computed = winner_fetch(hit, prim)
            else:
                feat_scr[:, :] = jnp.zeros(feat_scr.shape, f32)

            if computed is not None:

                def row(i):
                    return computed[i]

            else:

                def row(i):
                    r = _row_cache.get(i)
                    if r is None:
                        r = vstack(
                            [
                                feat_scr[s * F + i : s * F + i + 1, :]
                                for s in range(SUB)
                            ]
                        )
                        _row_cache[i] = r
                    return r

        else:
            # One-hot MXU matmuls, one per state row.
            n_f = table_ref.shape[0] // 2
            safe_prim = jnp.where(hit, prim, 0)
            if "nofetch" in ablate:  # perf ablation: constant material
                f_groups = [
                    jnp.broadcast_to(table_ref[:n_f, 0:1], (n_f, G))
                ] * SUB
            else:
                # table_ref rows are a bf16 hi/lo split (built host-side), so
                # the DEFAULT-precision matmul (bf16 inputs, 1 MXU pass) is
                # exact on hi and captures the next 8 mantissa bits via lo —
                # ~2^-16 relative overall at 1/9th the cost of a HIGHEST dot.
                f_groups = []
                for s in range(SUB):
                    onehot = (oh_iota == safe_prim[s : s + 1, :]).astype(f32)  # [P,G]
                    f2 = jnp.dot(table_ref[:, :], onehot, preferred_element_type=f32)
                    f_groups.append(f2[:n_f] + f2[n_f:])  # [F,G]

            def row(i):
                """Shade-table feature i gathered back into the packed
                (SUB, G) lane layout; cached so repeated features assemble
                once."""
                r = _row_cache.get(i)
                if r is None:
                    r = vstack([fg[i : i + 1, :] for fg in f_groups])
                    _row_cache[i] = r
                return r

        FS = fast_shade
        ts = jnp.where(hit, t, 0.0)
        px = ox + ts * dx
        py = oy + ts * dy
        pz = oz + ts * dz

        is_sphere = row(FS.F_IS_SPHERE) > 0.5
        inv_r = 1.0 / jnp.maximum(row(FS.F_RADIUS), 1e-20)
        snx = (px - row(FS.F_AX)) * inv_r
        sny = (py - row(FS.F_AY)) * inv_r
        snz = (pz - row(FS.F_AZ)) * inv_r
        d_dot_sn = dx * snx + dy * sny + dz * snz
        s_front = d_dot_sn < 0.0
        sgn = jnp.where(s_front, 1.0, -1.0)
        snx, sny, snz = snx * sgn, sny * sgn, snz * sgn

        tnx, tny, tnz = row(FS.F_NX), row(FS.F_NY), row(FS.F_NZ)
        t_front = dx * tnx + dy * tny + dz * tnz <= 0.0

        nx = jnp.where(is_sphere, snx, tnx)
        ny = jnp.where(is_sphere, sny, tny)
        nz = jnp.where(is_sphere, snz, tnz)
        # Boolean select spelled as mask algebra: Mosaic can't lower a
        # select_n over i1 vectors ("unsupported target bitwidth").
        front = (is_sphere & s_front) | (~is_sphere & t_front)

        # Texture: solid/checker only (image atlases are gated off in the
        # megakernel eligibility check; texture.rs:44-74 parity).
        tex_kind = row(FS.F_TEX_KIND)
        inv_scale = row(FS.F_INV_SCALE)
        cells = (
            jnp.floor(inv_scale * px).astype(jnp.int32)
            + jnp.floor(inv_scale * py).astype(jnp.int32)
            + jnp.floor(inv_scale * pz).astype(jnp.int32)
        )
        is_even = (cells & 1) == 0
        use_even = (tex_kind < 0.5) | is_even
        tr = jnp.where(use_even, row(FS.F_CE + 0), row(FS.F_CO + 0))
        tg = jnp.where(use_even, row(FS.F_CE + 1), row(FS.F_CO + 1))
        tb = jnp.where(use_even, row(FS.F_CE + 2), row(FS.F_CO + 2))

        if has_images and "noimg" not in ablate:
            # UV (sphere: hittable.rs:367-406 via fast_shade's scalarized
            # form; triangle barycentric recompute hittable.rs:433-452).
            if not clustered:
                # Flat mode: the facing rotation's trig is per-primitive
                # and precomputed in the shade table (fast_shade.F_CYW..).
                cyw, syw = row(FS.F_CYW), row(FS.F_SYW)
                cp_, sp_ = row(FS.F_CP), row(FS.F_SP)
            else:
                fx_, fy_, fz_ = row(FS.F_NX), row(FS.F_NY), row(FS.F_NZ)
                pitch = _atan2(fz_, jnp.sqrt(fx_ * fx_ + fy_ * fy_ + 1e-20))
                yaw = _atan2(fy_, fx_)
                syw, cyw = _sincos(
                    jnp.where(yaw < 0.0, yaw + np.float32(2.0 * np.pi), yaw)
                )
                sp_, cp_ = _sincos(
                    jnp.where(pitch < 0.0, pitch + np.float32(2.0 * np.pi), pitch)
                )
            qx = cyw * snx + syw * sny
            qy = -syw * snx + cyw * sny
            rx = cp_ * qx + sp_ * snz
            ry = qy
            rz = -sp_ * qx + cp_ * snz
            at_pole = rx * rx + ry * ry < 1e-12
            rx = jnp.where(at_pole, 1.0, rx)
            theta = _acos(jnp.clip(-rz, -1.0 + 1e-7, 1.0 - 1e-7))
            phi = _atan2(ry, rx) + np.float32(np.pi)
            two_pi = np.float32(2.0 * np.pi)
            phi_m = phi - jnp.floor(phi / two_pi) * two_pi
            s_u = phi_m * np.float32(0.5 / np.pi)
            s_v = theta * np.float32(1.0 / np.pi)

            e1x_ = row(FS.F_BX) - row(FS.F_AX)
            e1y_ = row(FS.F_BY) - row(FS.F_AY)
            e1z_ = row(FS.F_BZ) - row(FS.F_AZ)
            e2x_ = row(FS.F_CX) - row(FS.F_AX)
            e2y_ = row(FS.F_CY) - row(FS.F_AY)
            e2z_ = row(FS.F_CZ) - row(FS.F_AZ)
            uvx_ = dy * e2z_ - dz * e2y_
            uvy_ = dz * e2x_ - dx * e2z_
            uvz_ = dx * e2y_ - dy * e2x_
            det_ = e1x_ * uvx_ + e1y_ * uvy_ + e1z_ * uvz_
            inv_det_ = 1.0 / jnp.where(jnp.abs(det_) > 1e-20, det_, 1.0)
            aox_ = ox - row(FS.F_AX)
            aoy_ = oy - row(FS.F_AY)
            aoz_ = oz - row(FS.F_AZ)
            bu = (aox_ * uvx_ + aoy_ * uvy_ + aoz_ * uvz_) * inv_det_
            vvx_ = aoy_ * e1z_ - aoz_ * e1y_
            vvy_ = aoz_ * e1x_ - aox_ * e1z_
            vvz_ = aox_ * e1y_ - aoy_ * e1x_
            bv = (dx * vvx_ + dy * vvy_ + dz * vvz_) * inv_det_
            ua_u, ua_v = row(FS.F_UVA + 0), row(FS.F_UVA + 1)
            ub_u, ub_v = row(FS.F_UVA + 2), row(FS.F_UVA + 3)
            uc_u, uc_v = row(FS.F_UVA + 4), row(FS.F_UVA + 5)
            if uv_bbox_remap:
                lo_u = jnp.minimum(jnp.minimum(ua_u, ub_u), uc_u)
                hi_u = jnp.maximum(jnp.maximum(ua_u, ub_u), uc_u)
                lo_v = jnp.minimum(jnp.minimum(ua_v, ub_v), uc_v)
                hi_v = jnp.maximum(jnp.maximum(ua_v, ub_v), uc_v)
                t_u = lo_u + (hi_u - lo_u) * bu
                t_v = lo_v + (hi_v - lo_v) * bv
            else:
                w0 = 1.0 - bu - bv
                t_u = w0 * ua_u + bu * ub_u + bv * uc_u
                t_v = w0 * ua_v + bu * ub_v + bv * uc_v

            u_ = jnp.where(is_sphere, s_u, t_u)
            v_ = jnp.where(is_sphere, s_v, t_v)

            # Atlas texel fetch: ONE row one-hot matmul per state row
            # selects all 3 channel planes' columns at once (the atlas is
            # laid out [AH, 3*2AWp], channels side by side), then a column
            # mask-reduce per channel picks the lane's texel
            # (texture.rs:107-117 nearest + clamp semantics via the
            # shade-table rect).
            w_img = jnp.maximum(row(FS.F_RECT + 2), 1.0)
            h_img = jnp.maximum(row(FS.F_RECT + 3), 1.0)
            ix = (jnp.clip(u_, 0.0, 1.0) * (w_img - 1.0)).astype(jnp.int32)
            iy = (jnp.clip(v_, 0.0, 1.0) * (h_img - 1.0)).astype(jnp.int32)
            aw_pad = atlas_ref.shape[1] // 6  # per-channel cols: hi | lo
            ax2 = jnp.clip(row(FS.F_RECT + 0).astype(jnp.int32) + ix, 0, aw_pad - 1)
            ay2 = jnp.clip(row(FS.F_RECT + 1).astype(jnp.int32) + iy, 0, atlas_h - 1)
            ddr = (((0,), (0,)), ((), ()))
            is_image = tex_kind > 1.5
            texels = [[], [], []]  # per-channel lists of (1, G) rows
            for s in range(SUB):
                rowsel = (ah_iota == ay2[s : s + 1, :]).astype(f32)  # [AH, G]
                # The column mask hits BOTH the hi half (at ax) and the lo
                # half (at ax + aw_pad), so the final reduce sums hi + lo
                # texels — DEFAULT-precision matmuls, ~16 mantissa bits.
                colmask = (
                    (aw_iota == ax2[s : s + 1, :])
                    | (aw_iota == ax2[s : s + 1, :] + aw_pad)
                ).astype(f32)
                sel = jax.lax.dot_general(
                    atlas_ref[:, :], rowsel, ddr, preferred_element_type=f32
                )  # [3*2AWp, G] (atlas rows = AH, contracted)
                for ch in range(3):
                    part = sel[ch * 2 * aw_pad : (ch + 1) * 2 * aw_pad, :]
                    texels[ch].append(jnp.sum(colmask * part, axis=0, keepdims=True))
            tr = jnp.where(is_image, vstack(texels[0]), tr)
            tg = jnp.where(is_image, vstack(texels[1]), tg)
            tb = jnp.where(is_image, vstack(texels[2]), tb)

        # Scatter draws (rng purposes 3..10, fast_shade parity).
        z = jnp.zeros_like(gid)
        if "norng" in ablate:  # timing ablation: constant draws
            c3 = jnp.full((SUB, G), 0.577, f32)
            r1x = r1y = r1z = r2x = r2y = r2z = c3
            noise = jnp.full((SUB, G), 0.4, f32)
        else:
            ux3 = _uniform(seed, gid, depth, 3) * 2.0 - 1.0
            uy3 = _uniform(seed, gid, depth, 4) * 2.0 - 1.0
            uz3 = _uniform(seed, gid, depth, 5) * 2.0 - 1.0
            inv_n1 = 1.0 / jnp.maximum(
                jnp.sqrt(ux3 * ux3 + uy3 * uy3 + uz3 * uz3), 1e-12
            )
            r1x, r1y, r1z = ux3 * inv_n1, uy3 * inv_n1, uz3 * inv_n1
            vx3 = _uniform(seed, gid, depth, 6) * 2.0 - 1.0
            vy3 = _uniform(seed, gid, depth, 7) * 2.0 - 1.0
            vz3 = _uniform(seed, gid, depth, 8) * 2.0 - 1.0
            inv_n2 = 1.0 / jnp.maximum(
                jnp.sqrt(vx3 * vx3 + vy3 * vy3 + vz3 * vz3), 1e-12
            )
            r2x, r2y, r2z = vx3 * inv_n2, vy3 * inv_n2, vz3 * inv_n2
            noise = _uniform(seed, gid, depth, 9)

        lx, ly, lz = nx + r1x, ny + r1y, nz + r1z
        near_zero = (
            (jnp.abs(lx) < 3.45e-4) & (jnp.abs(ly) < 3.45e-4) & (jnp.abs(lz) < 3.45e-4)
        )
        lx = jnp.where(near_zero, nx, lx)
        ly = jnp.where(near_zero, ny, ly)
        lz = jnp.where(near_zero, nz, lz)

        d_dot_n = dx * nx + dy * ny + dz * nz
        fuzz = row(FS.F_FUZZ)
        mx = dx - 2.0 * d_dot_n * nx + fuzz * r2x
        my = dy - 2.0 * d_dot_n * ny + fuzz * r2y
        mz = dz - 2.0 * d_dot_n * nz + fuzz * r2z

        inv_dn = 1.0 / jnp.maximum(jnp.sqrt(a), 1e-20)
        udx, udy, udz = dx * inv_dn, dy * inv_dn, dz * inv_dn
        ior = row(FS.F_IOR)
        ri = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        cannot = ri * sin_t > 1.0
        r0 = (1.0 - ri) / (1.0 + ri)
        r0 = r0 * r0
        omc = 1.0 - cos_t
        omc2 = omc * omc
        reflectance = r0 + (1.0 - r0) * omc2 * omc2 * omc
        choose_reflect = cannot | (reflectance > noise)
        rpx = (udx + nx * cos_t) * ri
        rpy = (udy + ny * cos_t) * ri
        rpz = (udz + nz * cos_t) * ri
        perp_sq = rpx * rpx + rpy * rpy + rpz * rpz
        par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - perp_sq), 1e-12))
        fzx = rpx + par * nx + fuzz * r2x
        fzy = rpy + par * ny + fuzz * r2y
        fzz = rpz + par * nz + fuzz * r2z
        ud_dot_n = udx * nx + udy * ny + udz * nz
        rfx = udx - 2.0 * ud_dot_n * nx
        rfy = udy - 2.0 * ud_dot_n * ny
        rfz = udz - 2.0 * ud_dot_n * nz
        ddx = jnp.where(choose_reflect, rfx, fzx)
        ddy = jnp.where(choose_reflect, rfy, fzy)
        ddz = jnp.where(choose_reflect, rfz, fzz)
        inv_dd = 1.0 / jnp.maximum(jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz), 1e-20)
        ddx, ddy, ddz = ddx * inv_dd, ddy * inv_dd, ddz * inv_dd

        kind = row(FS.F_MAT_KIND)
        is_lam = kind < 0.5
        is_metal = (kind > 0.5) & (kind < 1.5)
        is_diel = (kind > 1.5) & (kind < 2.5)
        is_emissive = kind > 2.5
        new_dx = jnp.where(is_lam, lx, jnp.where(is_metal, mx, ddx))
        new_dy = jnp.where(is_lam, ly, jnp.where(is_metal, my, ddy))
        new_dz = jnp.where(is_lam, lz, jnp.where(is_metal, mz, ddz))
        att_r = jnp.where(is_diel, 1.0, tr)
        att_g = jnp.where(is_diel, 1.0, tg)
        att_b = jnp.where(is_diel, 1.0, tb)
        if "noshade" in ablate:  # timing ablation: the whole material /
            # texture / scatter block above goes dead and DCEs away.
            c5 = jnp.full((SUB, G), 0.5, f32)
            nx = ny = jnp.zeros((SUB, G), f32)
            nz = jnp.ones((SUB, G), f32)
            front = jnp.full((SUB, G), True)
            tr = tg = tb = c5
            new_dx, new_dy, new_dz = -dx, -dy, -dz
            att_r = att_g = att_b = c5
            is_emissive = jnp.full((SUB, G), False)

        p_rr = jnp.clip(jnp.maximum(jnp.maximum(att_r, att_g), att_b), 0.0, rr_clamp)
        survive = _uniform(seed, gid, depth, 10) < p_rr
        inv_p = 1.0 / jnp.maximum(p_rr, 1e-12)

        scale = jnp.maximum(
            jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz))), 1.0
        )
        side = jnp.sign(new_dx * nx + new_dy * ny + new_dz * nz)
        off = origin_offset * scale * side

        # ---- sky (Perez; sky.py parity incl. the cos-as-angle quirk) -----
        sdx, sdy, sdz = udx, udy, udz
        if "nosky" in ablate:  # perf ablation: constant sky
            sky_r = sky_g = sky_b = jnp.full((SUB, G), 0.5, f32)
        else:
            cos_theta = jnp.clip(sdz, 0.01, 1.0)
            cos_gamma = jnp.clip(sdx * sunx + sdy * suny + sdz * sunz, -1.0, 1.0)
            if cos_gamma_as_angle:
                gamma = cos_gamma
                _, cg2 = _sincos(
                    jnp.where(gamma < 0.0, gamma + np.float32(2.0 * np.pi), gamma)
                )
                cos_gamma = cg2
            else:
                gamma = _acos(jnp.clip(cos_gamma, -1.0 + 1e-6, 1.0 - 1e-6))
            if sky_model == "hosek":
                # H-W 2012 distribution (sky.hosek_radiance_rgb parity);
                # per-channel (A..I, scale*exposure) from SMEM rows.
                sq_ct = jnp.sqrt(jnp.maximum(cos_theta, 0.0))
                hw_rgb = []
                for ch in range(3):
                    base = _P_HW + 10 * ch
                    a_ = pf_ref[0, base + 0]
                    b_ = pf_ref[0, base + 1]
                    c_ = pf_ref[0, base + 2]
                    d_ = pf_ref[0, base + 3]
                    e_ = pf_ref[0, base + 4]
                    f_ = pf_ref[0, base + 5]
                    g_ = pf_ref[0, base + 6]
                    h_ = pf_ref[0, base + 7]
                    i_ = pf_ref[0, base + 8]
                    sc_ = pf_ref[0, base + 9]
                    den = jnp.maximum(1.0 + h_ * h_ - 2.0 * h_ * cos_gamma, 1e-6)
                    chi = (1.0 + cos_gamma * cos_gamma) / (den * jnp.sqrt(den))
                    val = (1.0 + a_ * jnp.exp(b_ / jnp.maximum(cos_theta, 0.01))) * (
                        c_ + d_ * jnp.exp(e_ * gamma) + f_ * cos_gamma * cos_gamma
                        + g_ * chi + i_ * sq_ct
                    )
                    hw_rgb.append(jnp.maximum(val * sc_, 0.0))
                ws = np.float32(_WHITE_SCALE)
                tm = lambda v: jnp.maximum(ws * _u2(1.1 * v), 0.0)
                sky_r, sky_g, sky_b = tm(hw_rgb[0]), tm(hw_rgb[1]), tm(hw_rgb[2])
                y_lum = None
            if sky_model != "hosek":
                y_lum = jnp.maximum(
                    _perez(pf_ref, _P_COEF_Y, cos_theta, gamma, cos_gamma) * zy, 0.0
                )
                x_c = _perez(pf_ref, _P_COEF_X, cos_theta, gamma, cos_gamma) * zx
                y_c = jnp.maximum(
                    _perez(pf_ref, _P_COEF_YC, cos_theta, gamma, cos_gamma) * zyc, 1e-6
                )
                big_x = x_c / y_c * y_lum
                big_z = (1.0 - x_c - y_c) / y_c * y_lum
                m = sky_mod._XYZ_TO_SRGB
                sky_r = jnp.maximum(m[0, 0] * big_x + m[0, 1] * y_lum + m[0, 2] * big_z, 0.0)
                sky_g = jnp.maximum(m[1, 0] * big_x + m[1, 1] * y_lum + m[1, 2] * big_z, 0.0)
                sky_b = jnp.maximum(m[2, 0] * big_x + m[2, 1] * y_lum + m[2, 2] * big_z, 0.0)
                ws = np.float32(_WHITE_SCALE)
                tm = lambda v: jnp.maximum(ws * _u2(1.1 * v), 0.0)
                sky_r, sky_g, sky_b = tm(sky_r), tm(sky_g), tm(sky_b)

        # ---- classify + deposit ------------------------------------------
        miss = active & ~hit
        emis = active & hit & is_emissive
        cont = active & hit & survive & (depth < max_depth) & ~is_emissive

        dep = miss | emis
        dep_r = jnp.where(dep, tpr * jnp.where(miss, sky_r, tr), 0.0)
        dep_g = jnp.where(dep, tpg * jnp.where(miss, sky_g, tg), 0.0)
        dep_b = jnp.where(dep, tpb * jnp.where(miss, sky_b, tb), 0.0)

        q = pixl_s >> 8
        r_ = pixl_s & 255
        if "nodeposit" not in ablate:
            # One DEFAULT-precision matmul per state row for all 3 channels
            # x (hi, lo): channel rows stacked on the M axis, deposit values
            # split into exact-bf16 hi + bf16(lo) so each MXU pass keeps
            # ~16 mantissa bits.
            ddn = (((1,), (1,)), ((), ()))
            delta_acc = None
            for s in range(SUB):
                e_q = (eq_iota == q[s : s + 1, :]).astype(f32)  # [NQP, G]
                e_rt = (er_iota == r_[s : s + 1, :]).astype(f32)  # [256, G]
                eqd = jnp.concatenate(
                    [
                        e_q * dep_r[s : s + 1, :],
                        e_q * dep_g[s : s + 1, :],
                        e_q * dep_b[s : s + 1, :],
                    ],
                    axis=0,
                )  # [3*NQP, G]
                eqd_hi = eqd.astype(jnp.bfloat16).astype(f32)
                eqd_lo = eqd - eqd_hi
                stacked = jnp.concatenate([eqd_hi, eqd_lo], axis=0)  # [6*NQP, G]
                delta = jax.lax.dot_general(
                    stacked, e_rt, ddn, preferred_element_type=f32
                )  # [6*NQP, 256]
                d3 = delta[: 3 * NQP] + delta[3 * NQP :]
                delta_acc = d3 if delta_acc is None else delta_acc + d3
            acc[:, :] += delta_acc

        # ---- advance state ------------------------------------------------
        sf[0 * SUB : 1 * SUB, :] = jnp.where(cont, px + off * nx, ox)
        sf[1 * SUB : 2 * SUB, :] = jnp.where(cont, py + off * ny, oy)
        sf[2 * SUB : 3 * SUB, :] = jnp.where(cont, pz + off * nz, oz)
        sf[3 * SUB : 4 * SUB, :] = jnp.where(cont, new_dx, dx)
        sf[4 * SUB : 5 * SUB, :] = jnp.where(cont, new_dy, dy)
        sf[5 * SUB : 6 * SUB, :] = jnp.where(cont, new_dz, dz)
        sf[8 * SUB : 9 * SUB, :] = jnp.where(cont, tpr * att_r * inv_p, tpr)
        sf[9 * SUB : 10 * SUB, :] = jnp.where(cont, tpg * att_g * inv_p, tpg)
        sf[10 * SUB : 11 * SUB, :] = jnp.where(cont, tpb * att_b * inv_p, tpb)
        si[0 * SUB : 1 * SUB, :] = gid
        si[1 * SUB : 2 * SUB, :] = depth + 1
        si[2 * SUB : 3 * SUB, :] = jnp.where(cont, 1, 0)
        si[3 * SUB : 4 * SUB, :] = pixl_s
        if clustered:
            # Last winner SUPER per lane — the lane-binning spatial key.
            si[4 * SUB : 5 * SUB, :] = jnp.where(
                cont & hit, prim >> 13, SI(4)
            )

        n_active = jnp.sum(jnp.where(cont, 1, 0))
        return (next_work + n_claimed, n_active, it + 1)

    def cond(carry):
        next_work, n_active, it = carry
        if "fixiters:" in ablate:  # timing instrument: exact trip count
            n = int(ablate.split("fixiters:")[1].split()[0])
            return it < n
        return (next_work < total_work) | (n_active > 0)

    _, _, n_iters = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )
    iters_ref[tile, 0] = n_iters
    out_ref[:, :] = acc[:, :]


def _hilo_rows(x):
    """Exact bf16 high part + f32 residual (DEFAULT-precision matmul fuel)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


@functools.partial(jax.jit, static_argnames=("has_images", "sky_model"))
def _mega_prep(shade_table_raw, atlas, camera, sky, *, has_images, sky_model):
    """Sweep-invariant device prep: camera/sky scalar packing + hi/lo
    splits of the shade table and image atlas.  Split from _mega_exec so
    sweep loops (bench/progressive bursts) hoist it out of the loop body
    via ``prepare()`` — re-running it per sweep measured ~2.7 ms on the
    bench scene (2026-08-17), a quarter of the kernel's own sweep time."""
    sun = sky.sun_direction / jnp.linalg.norm(sky.sun_direction)
    theta_s = sky_mod._safe_arccos(jnp.clip(sun[2], 0.0, 1.0))
    cos_theta_s = jnp.cos(theta_s)
    coef_y, coef_x, coef_yc = sky_mod.perez_coefficients(sky.turbidity)
    yz, xz, yzc = sky_mod.zenith_values(sky.turbidity, theta_s)
    one = jnp.asarray(1.0, jnp.float32)
    den_y = sky_mod._perez(coef_y, one, theta_s, cos_theta_s)
    den_x = sky_mod._perez(coef_x, one, theta_s, cos_theta_s)
    den_yc = sky_mod._perez(coef_yc, one, theta_s, cos_theta_s)

    pf = jnp.zeros((1, _P_F32_LEN), jnp.float32)
    pf = pf.at[0, _P_PIX00 : _P_PIX00 + 3].set(camera.pixel00_loc)
    pf = pf.at[0, _P_DU : _P_DU + 3].set(camera.pixel_du)
    pf = pf.at[0, _P_DV : _P_DV + 3].set(camera.pixel_dv)
    pf = pf.at[0, _P_DKU : _P_DKU + 3].set(camera.defocus_disk_u)
    pf = pf.at[0, _P_DKV : _P_DKV + 3].set(camera.defocus_disk_v)
    pf = pf.at[0, _P_CENTER : _P_CENTER + 3].set(camera.center)
    pf = pf.at[0, _P_SUN : _P_SUN + 3].set(sun)
    pf = pf.at[0, _P_COEF_Y : _P_COEF_Y + 5].set(coef_y)
    pf = pf.at[0, _P_COEF_X : _P_COEF_X + 5].set(coef_x)
    pf = pf.at[0, _P_COEF_YC : _P_COEF_YC + 5].set(coef_yc)
    pf = pf.at[0, _P_ZY].set(yz / den_y * sky.exposure)
    pf = pf.at[0, _P_ZX].set(xz / den_x)
    pf = pf.at[0, _P_ZYC].set(yzc / den_yc)
    if sky_model == "hosek":
        hw = jnp.asarray(sky.hw_params, jnp.float32)
        hw = hw.at[:, 9].set(hw[:, 9] * sky.exposure)  # premultiply exposure
        pf = pf.at[0, _P_HW : _P_HW + 30].set(hw.reshape(-1))

    # Channel-side-by-side atlas [AH, 3 * 2*AW_pad] (per channel: hi | lo
    # bf16 split along the column axis) so the in-kernel fetch needs ONE
    # row-select matmul per state row for all 3 channels, at DEFAULT
    # precision.
    if has_images:
        ah, aw = atlas.shape[0], atlas.shape[1]
        aw_pad = max(-(-aw // 128) * 128, 128)
        hi, lo = _hilo_rows(atlas)  # [AH, AW, 3] each
        atlas_planar = jnp.zeros((ah, 6 * aw_pad), jnp.float32)
        for ch in range(3):
            base = ch * 2 * aw_pad
            atlas_planar = atlas_planar.at[:, base : base + aw].set(hi[:, :, ch])
            atlas_planar = atlas_planar.at[
                :, base + aw_pad : base + aw_pad + aw
            ].set(lo[:, :, ch])
    else:
        atlas_planar = jnp.zeros((8, 6 * 128), jnp.float32)

    # Shade table rows stacked hi | lo for the single DEFAULT-precision
    # parameter-fetch matmul (see _mega_kernel).
    t_hi, t_lo = _hilo_rows(shade_table_raw)
    shade_table = jnp.concatenate([t_hi, t_lo], axis=0)
    return pf, shade_table, atlas_planar


def _nan_dummies(box):
    """Inverted (dummy) AABBs -> NaN AABBs.

    cluster.py marks dummy clusters/supers with lo=+inf, hi=-inf, but the
    branchless slab test still 'enters' such boxes (min/max over +-inf give
    tn=0 <= tf=+inf).  NaN boxes compare false everywhere, so dummies are
    skipped for free."""
    bad = box[:, 0:1] > box[:, 3:4]
    return jnp.where(bad, jnp.nan, box)


def _pad_rows_nan(box, multiple=8):
    """Pad an AABB table's rows to a sublane multiple with NaN boxes."""
    k = box.shape[0]
    kp = max(-(-k // multiple) * multiple, multiple)
    if kp == k:
        return box
    return jnp.concatenate(
        [box, jnp.full((kp - k, box.shape[1]), jnp.nan, jnp.float32)], axis=0
    )


def _mega_prep_clustered(cl_arrays, atlas, camera, sky, *, has_images, sky_model):
    """Sweep-invariant packing for the clustered megakernel: camera/sky
    scalars (shared with _mega_prep), NaN-dummy AABB tables, lane-major
    slot tables passed through, and the slot-ordered shade table as
    HBM-resident [slots_pad, 128] columns (hi | lo | pad) for the
    winner-cluster DMA fetch."""
    from rt_tpu.fast_shade import F_ROWS

    (
        sph_super, sph_cluster, sph_slots,
        tri_super, tri_cluster, tri_slots,
        shade, checker_table,
    ) = cl_arrays
    pf, _, atlas_planar = _mega_prep(
        jnp.zeros((F_ROWS, 128), jnp.float32), atlas, camera, sky,
        has_images=has_images, sky_model=sky_model,
    )
    ssup = _pad_rows_nan(_nan_dummies(sph_super))
    tsup = _pad_rows_nan(_nan_dummies(tri_super))
    scl = _nan_dummies(sph_cluster)
    tcl = _nan_dummies(tri_cluster)
    t_hi, t_lo = _hilo_rows(shade)  # [F, slots_pad] each
    # CLUSTER-BLOCKED feature-major layout [M_tot * 2F, 128]: cluster ci's
    # [2F, 128] hi|lo slice lives at rows [ci*2F, +2F).  The winner DMA
    # reads ONE contiguous 40 KB block (a flat [2F, slots] table makes the
    # same slice 2F strided 512 B reads, measured ~33 us/DMA), and the
    # slice feeds the fetch as a NATIVE [2F,128] @ [128,G] MXU dot (the
    # slot-major alternative needs a per-step Mosaic transpose, ~11 us).
    shade_cols = jnp.concatenate([t_hi, t_lo], axis=0)  # [2F, slots_pad]
    f2 = shade_cols.shape[0]
    m_tot = shade_cols.shape[1] // CLUSTER_SLOTS
    shade_blocks = (
        shade_cols.reshape(f2, m_tot, CLUSTER_SLOTS)
        .transpose(1, 0, 2)
        .reshape(m_tot * f2, CLUSTER_SLOTS)
    )
    chk = (
        checker_table
        if checker_table is not None
        else jnp.zeros((8, 128), jnp.float32)
    )
    return (
        pf, shade_blocks, atlas_planar,
        ssup, scl, sph_slots, tsup, tcl, tri_slots, chk,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "spp",
        "width",
        "n_global",
        "n_spheres",
        "n_sph_chunks",
        "n_tri_chunks",
        "n_tris",
        "max_depth",
        "t_min",
        "t_max",
        "origin_offset",
        "rr_clamp",
        "backface_cull",
        "shared_halton_jitter",
        "use_defocus",
        "cos_gamma_as_angle",
        "packed_select",
        "has_images",
        "uv_bbox_remap",
        "lanes",
        "sub",
        "tile_pixels",
        "n_tiles",
        "n_pixels",
        "interpret",
        "sky_model",
        "ablate",
    ),
)
def _mega_exec(
    pf,
    shade_table,
    atlas_planar,
    sph_packed,
    tri_packed,
    key,
    sample_offset,
    pixel_base,
    *,
    spp,
    width,
    n_global,
    n_spheres,
    n_sph_chunks,
    n_tri_chunks,
    n_tris,
    max_depth,
    t_min,
    t_max,
    origin_offset,
    rr_clamp,
    backface_cull,
    shared_halton_jitter,
    use_defocus,
    cos_gamma_as_angle,
    packed_select,
    has_images,
    uv_bbox_remap,
    lanes,
    sub,
    tile_pixels,
    n_tiles,
    n_pixels,
    interpret,
    sky_model,
    ablate,
):
    """The pallas dispatch given sweep-invariant prepped inputs."""
    from rt_tpu.wavefront import _seed_from_key

    seed = _seed_from_key(key)
    pi = jnp.zeros((1, _PI_I32_LEN), jnp.int32)
    pi = pi.at[0, _PI_SEED].set(seed.astype(jnp.int32))
    pi = pi.at[0, _PI_SAMPLE_OFF].set(jnp.asarray(sample_offset, jnp.int32))
    pi = pi.at[0, _PI_PIX_BASE].set(jnp.asarray(pixel_base, jnp.int32))

    nq = tile_pixels // 256
    nqp = max(-(-nq // 8) * 8, 8)  # padded per-channel rows (see _mega_kernel)
    atlas_h = atlas_planar.shape[0]
    kernel = functools.partial(
        _mega_kernel,
        lanes=lanes,
        sub=sub,
        tile_pixels=tile_pixels,
        spp=spp,
        width=width,
        n_global=n_global,
        n_spheres=n_spheres,
        n_sph_chunks=n_sph_chunks,
        n_tri_chunks=n_tri_chunks,
        n_tris=n_tris,
        p_pad=shade_table.shape[1],
        max_depth=max_depth,
        t_min=t_min,
        t_max=t_max,
        origin_offset=origin_offset,
        rr_clamp=rr_clamp,
        backface_cull=backface_cull,
        shared_halton_jitter=shared_halton_jitter,
        use_defocus=use_defocus,
        cos_gamma_as_angle=cos_gamma_as_angle,
        packed_select=packed_select,
        has_images=has_images,
        atlas_h=atlas_h,
        uv_bbox_remap=uv_bbox_remap,
        sky_model=sky_model,
        ablate=ablate,
    )
    out, iters = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, _P_F32_LEN), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _PI_I32_LEN), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(sph_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(shade_table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(atlas_planar.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3 * nqp, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 3 * nqp, 256), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16 * sub, lanes // sub), jnp.float32),
            pltpu.VMEM((8 * sub, lanes // sub), jnp.int32),
            pltpu.VMEM((3 * nqp, 256), jnp.float32),
        ],
        interpret=interpret,
    )(pf, pi, sph_packed, tri_packed, shade_table, atlas_planar)
    # [tiles*3NQP, 256] -> drop channel pad rows -> [3, tiles*NP] ->
    # slice off the tail-tile padding and mean over spp, all in-trace.
    out = out.reshape(n_tiles, 3, nqp, 256)[:, :, :nq, :]
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(3, n_tiles * tile_pixels)
    img = out.T[:n_pixels] * jnp.float32(1.0 / spp)
    return img, iters


@functools.partial(
    jax.jit,
    static_argnames=(
        "spp",
        "width",
        "n_global",
        "n_spheres",
        "n_sph_chunks",
        "n_tri_chunks",
        "n_tris",
        "max_depth",
        "t_min",
        "t_max",
        "origin_offset",
        "rr_clamp",
        "backface_cull",
        "shared_halton_jitter",
        "use_defocus",
        "cos_gamma_as_angle",
        "packed_select",
        "has_images",
        "uv_bbox_remap",
        "lanes",
        "sub",
        "tile_pixels",
        "n_tiles",
        "n_pixels",
        "interpret",
        "sky_model",
        "ablate",
    ),
)
def _mega_call(
    sph_packed,
    tri_packed,
    shade_table_raw,  # f32[F, P_pad] (un-split; hi/lo built in-trace)
    atlas,  # f32[AH, AW, 3] image atlas or None
    camera,
    sky,
    key,
    sample_offset,
    pixel_base,
    *,
    spp,
    width,
    n_global,
    n_spheres,
    n_sph_chunks,
    n_tri_chunks,
    n_tris,
    max_depth,
    t_min,
    t_max,
    origin_offset,
    rr_clamp,
    backface_cull,
    shared_halton_jitter,
    use_defocus,
    cos_gamma_as_angle,
    packed_select,
    has_images,
    uv_bbox_remap,
    lanes,
    sub,
    tile_pixels,
    n_tiles,
    n_pixels,
    interpret,
    sky_model,
    ablate,
):
    """One fused device program: scalar-param packing, hi/lo table splits,
    AND the megakernel itself — the single-frame path.  Everything before
    the ``pallas_call`` used to run eagerly in ``render_megakernel`` — ~40
    tiny dispatches costing ~97 ms/frame through the axon tunnel (measured
    2026-08-17), swamping the kernel 3:1 on the bench scene.  Inside one
    jit they compile to microseconds.  Sweep loops should instead call
    ``prepare()`` once and pass ``prepared=`` to render_megakernel."""
    pf, shade_table, atlas_planar = _mega_prep(
        shade_table_raw, atlas, camera, sky,
        has_images=has_images, sky_model=sky_model,
    )
    return _mega_exec(
        pf, shade_table, atlas_planar, sph_packed, tri_packed,
        key, sample_offset, pixel_base,
        spp=spp,
        width=width,
        n_global=n_global,
        n_spheres=n_spheres,
        n_sph_chunks=n_sph_chunks,
        n_tri_chunks=n_tri_chunks,
        n_tris=n_tris,
        max_depth=max_depth,
        t_min=t_min,
        t_max=t_max,
        origin_offset=origin_offset,
        rr_clamp=rr_clamp,
        backface_cull=backface_cull,
        shared_halton_jitter=shared_halton_jitter,
        use_defocus=use_defocus,
        cos_gamma_as_angle=cos_gamma_as_angle,
        packed_select=packed_select,
        has_images=has_images,
        uv_bbox_remap=uv_bbox_remap,
        lanes=lanes,
        sub=sub,
        tile_pixels=tile_pixels,
        n_tiles=n_tiles,
        n_pixels=n_pixels,
        interpret=interpret,
        sky_model=sky_model,
        ablate=ablate,
    )


_CL_STATICS = (
    "spp",
    "width",
    "n_global",
    "n_spheres",
    "n_sph_chunks",
    "n_tri_chunks",
    "max_depth",
    "t_min",
    "t_max",
    "origin_offset",
    "rr_clamp",
    "backface_cull",
    "shared_halton_jitter",
    "use_defocus",
    "cos_gamma_as_angle",
    "has_images",
    "uv_bbox_remap",
    "lanes",
    "sub",
    "tile_pixels",
    "n_tiles",
    "n_pixels",
    "interpret",
    "sky_model",
    "ablate",
    "f_rows",
    "inline_shade",
    "stream_slots",
    "bin_lanes",
    "expand_sweep",
)

_WL_ROWS = 256  # worklist rows (>= row_groups * supers per set, statically)
_FETCH_RING = 32  # winner shade blocks DMA'd per fetch chunk
_STREAM_RING = 16  # slot blocks in flight per streamed-sweep chunk
_STREAM_VMEM_BUDGET = 48 << 20  # resident slot-table budget (bytes)
_SWEEP_UNROLL = 4  # phase-C chunk visits per while step
_SEG_UNROLL = 2  # segment builds per while step
_FETCH_UNROLL = 2  # inline-fetch dots per while step
_FETCH_KB = 4  # winner clusters K-stacked per inline-fetch dot

# Expansion sweep (round 5; see _mega_kernel's expansion section).
_EXP_K = 16  # per-ray entered-cluster cap (overflow rays -> row sweep;
# measured blob overflow at K=16: ~2 lanes/iter -> the fallback sweep is
# ~38 visits/iter; K=8 left 96 overflow lanes and a 836-visit fallback)
_EXP_NI = 8192  # dense (ray, cluster) item capacity per set
_EXP_NV = 2048  # visit capacity (NV can exceed NI/8: 1-item clusters)
_EXP_CH = 512  # items per scatter-chunk step
_EXP_MAX_CL = 2048  # per-set cluster bound for the [M, R] mask matmuls
_EXP_MIN_CHORD = 3.5  # chord-incoherence threshold for expand_sweep=auto
# (blob 4.2 / armor 3.8 / car 4.7 in; heightfield 2.5 out; a borderline
# 4.6k-sphere shell at 3.1 measured 36% SLOWER with expansion on the
# real chip, so the cut sits above it)
_EXP_UNROLL = 8  # visits per while step (274.7 vs 286 us/iter at 4)
_EXP_RED_UNROLL = 8  # reduction items per while step


def _row_group_count(sub, ns_sph, ns_tri):
    """Lane-row group count NG for the clustered worklists.

    The sweep intersects each entered cluster against only the group's
    rows, so finer groups cut per-visit math — bounded by the worklist
    capacity (every group can enter every super in the worst case, and
    dropping segments would be wrong, so NG * n_supers <= _WL_ROWS must
    hold STATICALLY) and by the pool's sub rows.  Shared by
    _mega_exec_clustered and the bin_lanes="auto" decision so the sort
    can never be enabled in a configuration where NG degrades to 1."""
    ns_max = max(ns_sph, ns_tri, 1)
    row_groups = 1
    while row_groups * 2 <= sub and row_groups * 2 * ns_max <= _WL_ROWS:
        row_groups *= 2
    return row_groups


@functools.partial(jax.jit, static_argnames=_CL_STATICS)
def _mega_exec_clustered(
    pf,
    shade_cols,  # f32[M_tot*2F, 128] HBM-resident cluster-blocked hi/lo
    atlas_planar,
    ssup, scl, sslots, tsup, tcl, tslots, chk,
    key,
    sample_offset,
    pixel_base,
    *,
    f_rows,
    **statics,
):
    """The clustered-mode pallas dispatch (see _mega_kernel's clustered ref
    layout).  Geometry/AABB tables are VMEM-resident; the slot-ordered
    shade table stays in HBM and winner clusters' [128, 2F] slices are
    DMA'd on demand."""
    from rt_tpu.wavefront import _seed_from_key

    lanes = statics["lanes"]
    sub = statics["sub"]
    tile_pixels = statics["tile_pixels"]
    n_tiles = statics["n_tiles"]
    interpret = statics["interpret"]

    seed = _seed_from_key(key)
    pi = jnp.zeros((1, _PI_I32_LEN), jnp.int32)
    pi = pi.at[0, _PI_SEED].set(seed.astype(jnp.int32))
    pi = pi.at[0, _PI_SAMPLE_OFF].set(jnp.asarray(sample_offset, jnp.int32))
    pi = pi.at[0, _PI_PIX_BASE].set(jnp.asarray(pixel_base, jnp.int32))

    nq = tile_pixels // 256
    nqp = max(-(-nq // 8) * 8, 8)
    atlas_h = atlas_planar.shape[0]
    kernel_kw = {
        k: v
        for k, v in statics.items()
        if k not in ("n_tiles", "n_pixels", "interpret")
    }
    ns_sph = scl.shape[0] // SUPER_SLOTS if statics["n_sph_chunks"] else 0
    ns_tri = tcl.shape[0] // SUPER_SLOTS if statics["n_tri_chunks"] else 0
    row_groups = _row_group_count(sub, ns_sph, ns_tri)
    kernel = functools.partial(
        _mega_kernel,
        p_pad=shade_cols.shape[1],
        packed_select=False,
        atlas_h=atlas_h,
        clustered=True,
        f_rows=f_rows,
        row_groups=row_groups,
        # Sample-major claims shrink the refill footprint ~spp-fold; the
        # win beats the reordering cost from ~8 spp up (40k scene @16spp
        # 5.5 -> 6.1 Mray/s; the 160k @4spp measured 3.8 -> 3.1).
        spp_major=statics["spp"] >= 8,
        **kernel_kw,
    )
    g = lanes // sub
    exp_on = statics["expand_sweep"]
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    # The DMA fetch ring (2.6 MB) only exists in the image fallback
    # mode; inline mode reclaims it for scene tables (the 360k-sphere
    # scene is within ~1 MB of the 16 MB scoped-vmem limit).
    ring_rows = 8 if statics["inline_shade"] else _FETCH_RING * 2 * f_rows
    out, iters = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, _P_F32_LEN), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _PI_I32_LEN), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full(ssup),
            full(scl),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            if statics["stream_slots"]
            else full(sslots),
            full(tsup),
            full(tcl),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            if statics["stream_slots"]
            else full(tslots),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # shade_cols stays in HBM
            full(chk),
            full(atlas_planar),
        ],
        out_specs=[
            pl.BlockSpec((3 * nqp, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 3 * nqp, 256), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16 * sub, g), jnp.float32),
            pltpu.VMEM((8 * sub, g), jnp.int32),
            pltpu.VMEM((3 * nqp, 256), jnp.float32),
            pltpu.VMEM((sub * f_rows, g), jnp.float32),  # feat_scr
            pltpu.VMEM((8 * sub, g), jnp.float32),  # rays_scr
            pltpu.VMEM((_WL_ROWS, 128), jnp.int32),  # wl_vmem
            pltpu.SMEM((_WL_ROWS, 128), jnp.int32),  # wl_smem
            pltpu.VMEM((1, _WL_ROWS), jnp.int32),  # sup_vmem
            pltpu.SMEM((1, _WL_ROWS), jnp.int32),  # sup_smem
            pltpu.VMEM((ring_rows, CLUSTER_SLOTS), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((_FETCH_RING,)),  # fetch ring semaphores
            pltpu.VMEM(
                (
                    max(sslots.shape[0], tslots.shape[0])
                    if statics["stream_slots"]
                    else 8,
                    (2 * _STREAM_RING if statics["stream_slots"] else 1)
                    * CLUSTER_SLOTS,
                ),
                jnp.float32,
            ),  # streamed-slot ring (double-buffered halves)
            pltpu.SemaphoreType.DMA((2 * _STREAM_RING,)),  # stream sems
            # Expansion-sweep scratch (minimal dummies when disabled).
            pltpu.VMEM(
                (lanes, 8) if exp_on else (8, 128), jnp.float32
            ),  # exp_rays_t: ray state transposed (ray on sublane)
            pltpu.VMEM(
                (8, _EXP_NI) if exp_on else (8, 128), jnp.float32
            ),  # exp_rid_planes: scattered ray-id byte planes
            # Item metadata lives DENSE in (8, N/8) blocks — SMEM is
            # (8,128)-tiled like VMEM, so (N, 1) or (1, N) shapes pad
            # 8x (a round-5 compile fault: s32[8192,1] = 4 MB vs the
            # 1 MB SMEM budget).  Item j indexes [j >> 10, j & 1023].
            pltpu.VMEM(
                (8, _EXP_NI // 8) if exp_on else (8, 128), jnp.int32
            ),  # exp_meta_v: packed (item_cl << 12) | ray_id
            pltpu.VMEM(
                (8, _EXP_NV // 8) if exp_on else (8, 128), jnp.int32
            ),  # exp_vis_v: packed (visit_cl << 14) | visit_start
            pltpu.VMEM(
                (_EXP_NI, 1) if exp_on else (8, 1), jnp.int32
            ),  # exp_res_v: per-item packed (t | slot) keys (visit writes)
            pltpu.VMEM(
                (8, _EXP_NI // 8) if exp_on else (8, 128), jnp.int32
            ),  # exp_resrow_v: lane-major copy of exp_res_v for the DMA
            pltpu.VMEM(
                (_EXP_K * sub, g) if exp_on else (8, 128), jnp.int32
            ),  # exp_dst: per-(s, k) item destinations
            pltpu.VMEM(
                (2 * sub, g) if exp_on else (8, 128), jnp.int32
            ),  # exp_best_v: reduced per-ray [key | cluster*128+slot]
            pltpu.VMEM(
                (sub, g) if exp_on else (8, 128), jnp.int32
            ),  # exp_ovf_v: overflow lanes (1 = row-sweep fallback);
            #    defaults to all-1 when the drain gate skips expansion
            pltpu.SMEM(
                (8, _EXP_NI // 8) if exp_on else (8, 128), jnp.int32
            ),  # exp_meta_s
            pltpu.SMEM(
                (8, _EXP_NV // 8) if exp_on else (8, 128), jnp.int32
            ),  # exp_vis_s
            pltpu.SMEM(
                (8, _EXP_NI // 8) if exp_on else (8, 128), jnp.int32
            ),  # exp_res_s
            pltpu.SMEM(
                (2 * sub, g) if exp_on else (8, 128), jnp.int32
            ),  # exp_best_s
        ],
        # v5e has far more physical VMEM than the 16 MB default scoped
        # limit; large slot tables + the unrolled loops' temporaries need
        # the headroom (360k spheres = 11.5 MB of tables alone).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(pf, pi, ssup, scl, sslots, tsup, tcl, tslots, shade_cols, chk, atlas_planar)
    n_pixels = statics["n_pixels"]
    spp = statics["spp"]
    out = out.reshape(n_tiles, 3, nqp, 256)[:, :, :nq, :]
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(3, n_tiles * tile_pixels)
    img = out.T[:n_pixels] * jnp.float32(1.0 / spp)
    return img, iters


@functools.partial(jax.jit, static_argnames=_CL_STATICS)
def _mega_call_clustered(
    cl_arrays,  # (sph_super, sph_cluster, sph_slots, tri_super,
    #              tri_cluster, tri_slots, shade_table) from ClusterData
    atlas,
    camera,
    sky,
    key,
    sample_offset,
    pixel_base,
    *,
    f_rows,
    **statics,
):
    """Single-dispatch clustered frame: prep + kernel in one jit."""
    (
        pf, shade_cols, atlas_planar,
        ssup, scl, sslots, tsup, tcl, tslots, chk,
    ) = _mega_prep_clustered(
        cl_arrays, atlas, camera, sky,
        has_images=statics["has_images"], sky_model=statics["sky_model"],
    )
    return _mega_exec_clustered(
        pf, shade_cols, atlas_planar, ssup, scl, sslots, tsup, tcl, tslots,
        chk, key, sample_offset, pixel_base, f_rows=f_rows, **statics,
    )


def _atlas_ok(scene: SceneData) -> bool:
    # Channel-planar atlas must stay VMEM-resident (hi|lo split = 24
    # bytes per texel; vmem_limit_bytes raises the scoped ceiling well
    # past the 16 MB default, so ~24 MB of atlas is affordable).
    return (not scene.has_image_textures) or (
        scene.atlas.shape[0] * max(scene.atlas.shape[1], 128) * 24 <= 24 << 20
    )


def eligible(scene: SceneData, cfg: RenderConfig) -> bool:
    """True when the flat megakernel can render this scene (brute force,
    packed shade table, whole scene VMEM-resident)."""
    from rt_tpu.wavefront import MAX_FAST_TRIANGLES

    return (
        scene.shade_table is not None
        and _atlas_ok(scene)
        and scene.clusters is None
        and scene.num_prims <= 4096
        and scene.num_triangles <= MAX_FAST_TRIANGLES
        and scene.sph_packed is not None
        and scene.tri_packed is not None
    )


def eligible_clustered(scene: SceneData, cfg: RenderConfig) -> bool:
    """True when the clustered megakernel can render this scene: cluster
    tables built (scene.py builds them for >2048 prims / >128 triangles),
    geometry slot tables within the VMEM budget, and the two-level
    hierarchy within the kernel's worklist bounds (the slot-ordered shade
    table itself stays in HBM, so it does not constrain scene size)."""
    cl = scene.clusters
    if cl is None:
        return False
    ms_pad = cl.sph_cluster.shape[0]
    mt_pad = cl.tri_cluster.shape[0]
    # Lane-major slot tables tile as (8, 128) in VMEM; tri tables carry
    # 16 rows (24 with image-triangle UVs).
    geom_bytes = (
        ms_pad * 128 * cl.sph_slots.shape[0] * 4
        + mt_pad * 128 * cl.tri_slots.shape[0] * 4
    )
    return (
        _atlas_ok(scene)
        and int(cl.n_sph_slots) == ms_pad * CLUSTER_SLOTS
        and (ms_pad + mt_pad) // SUPER_SLOTS <= _WL_ROWS
        # Slot tables within the VMEM residency budget stay resident
        # (fastest); past it the kernel STREAMS visited clusters' slot
        # blocks from HBM through a DMA ring (see _STREAM_VMEM_BUDGET /
        # sweep_entered_streamed), so scene size is bounded only by HBM.
        and geom_bytes <= 2 << 30
    )


def prepare(scene: SceneData, camera: Camera, cfg: RenderConfig):
    """Sweep-invariant device packing for ``render_megakernel(prepared=)``.

    Compute once per (scene, camera, sky) and reuse across progressive
    sweeps/bursts — skips ~2.7 ms/sweep of atlas/table re-splitting on the
    bench scene."""
    sky = scene.sky
    sky_model = "perez" if sky.hw_params is None else "hosek"
    has_images = bool(scene.has_image_textures)
    return _mega_prep(
        scene.shade_table,
        scene.atlas if has_images else None,
        camera,
        sky,
        has_images=has_images,
        sky_model=sky_model,
    )


def render_megakernel(
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    spp: int,
    sample_offset,
    key: jax.Array,
    *,
    pixel_base: int = 0,
    n_pixels: int | None = None,
    lanes: int = LANES,
    sub: int = SUBROWS,
    tile_pixels: int = TILE_PIXELS,
    packed_select: bool | None = None,
    interpret: bool = False,
    ablate: str = "",
    return_iters: bool = False,
    prepared=None,
) -> jnp.ndarray:
    """Mean radiance f32[n_pixels, 3] for the contiguous pixel range
    [pixel_base, pixel_base + n_pixels) — megakernel analog of
    wavefront.render_wavefront for contiguous pixel sets.

    The only eager work here is reading the static flags (one
    ``defocus_angle`` device read); every array op lives inside the
    single-dispatch ``_mega_call`` jit (or ``_mega_exec`` when a
    ``prepare()`` result is passed via ``prepared=``).
    """
    n_pixels = (
        camera.image_width * camera.image_height if n_pixels is None else n_pixels
    )
    n_global = camera.image_width * camera.image_height
    if not eligible(scene, cfg) and eligible_clustered(scene, cfg):
        # Smaller pools win in clustered mode: a 1024-lane pool claims a
        # ~256-pixel footprint whose entered-cluster union is much
        # smaller per sweep (4.7 vs 3.8 Mray/s on the 160k cover scene).
        return _render_clustered(
            scene, camera, cfg, spp, sample_offset, key,
            pixel_base=pixel_base, n_pixels=n_pixels,
            lanes=CLUSTER_LANES if lanes == LANES else lanes, sub=sub,
            tile_pixels=tile_pixels, interpret=interpret, ablate=ablate,
            return_iters=return_iters,
        )
    p_pad = scene.shade_table.shape[1]
    if packed_select is None:
        packed_select = p_pad <= 1024  # id-in-mantissa t truncation budget
    # Small renders: shrink the tile so the grid still covers >= 1 tile.
    while tile_pixels > 256 and tile_pixels // 2 >= n_pixels:
        tile_pixels //= 2
    n_tiles = -(-n_pixels // tile_pixels)
    while sub > 1 and lanes % sub:
        sub //= 2

    sky = scene.sky
    sky_model = "perez" if sky.hw_params is None else "hosek"
    use_defocus = (
        camera.defocus_on
        if camera.defocus_on is not None
        else bool(np.asarray(camera.defocus_angle) > 0.0)
    )
    has_images = bool(scene.has_image_textures)
    s_pad = scene.sph_packed.shape[0]
    t_pad = scene.tri_packed.shape[0]

    statics = dict(
        spp=int(spp),
        width=camera.image_width,
        n_global=n_global,
        n_spheres=scene.num_spheres,
        n_sph_chunks=s_pad // SPHERE_CHUNK if scene.num_spheres else 0,
        n_tri_chunks=-(-t_pad // TRI_CHUNK) if scene.num_triangles else 0,
        n_tris=scene.num_triangles,
        max_depth=cfg.max_depth,
        t_min=float(cfg.t_min),
        t_max=float(cfg.t_max),
        origin_offset=float(cfg.origin_offset),
        rr_clamp=float(cfg.compat.rr_clamp),
        backface_cull=bool(cfg.compat.triangle_backface_cull),
        shared_halton_jitter=bool(cfg.compat.shared_halton_jitter),
        use_defocus=use_defocus,
        cos_gamma_as_angle=bool(sky.cos_gamma_as_angle),
        packed_select=bool(packed_select),
        has_images=has_images,
        uv_bbox_remap=bool(cfg.compat.triangle_uv_bbox_remap),
        lanes=lanes,
        sub=sub,
        tile_pixels=tile_pixels,
        n_tiles=n_tiles,
        n_pixels=n_pixels,
        interpret=interpret,
        sky_model=sky_model,
        ablate=ablate,
    )
    if prepared is not None:
        pf, shade_table, atlas_planar = prepared
        img, iters = _mega_exec(
            pf, shade_table, atlas_planar,
            scene.sph_packed, scene.tri_packed,
            key, sample_offset, pixel_base,
            **statics,
        )
    else:
        img, iters = _mega_call(
            scene.sph_packed,
            scene.tri_packed,
            scene.shade_table,
            scene.atlas if has_images else None,
            camera,
            sky,
            key,
            sample_offset,
            pixel_base,
            **statics,
        )
    if return_iters:
        return img, iters
    return img


def _render_clustered(
    scene: SceneData,
    camera: Camera,
    cfg: RenderConfig,
    spp: int,
    sample_offset,
    key: jax.Array,
    *,
    pixel_base: int,
    n_pixels: int,
    lanes: int,
    sub: int,
    tile_pixels: int,
    interpret: bool,
    ablate: str,
    return_iters: bool,
):
    """Clustered-megakernel frame (large scenes): same persistent pool, the
    hierarchical worklist intersect of _mega_kernel's clustered mode."""
    from rt_tpu.fast_shade import F_ROWS

    cl = scene.clusters
    n_global = camera.image_width * camera.image_height
    while tile_pixels > 256 and tile_pixels // 2 >= n_pixels:
        tile_pixels //= 2
    n_tiles = -(-n_pixels // tile_pixels)
    while sub > 1 and lanes % sub:
        sub //= 2

    sky = scene.sky
    sky_model = "perez" if sky.hw_params is None else "hosek"
    geom_bytes = (
        cl.sph_cluster.shape[0] * 128 * cl.sph_slots.shape[0] * 4
        + cl.tri_cluster.shape[0] * 128 * cl.tri_slots.shape[0] * 4
    )
    # Past the VMEM residency budget, stream visited clusters' slot
    # blocks from HBM (Sponza-class scenes stay on the fast path instead
    # of falling back to the paged wavefront).  The winner fetch then
    # uses the HBM shade-table DMA path (inline essentials live in the
    # now-HBM slot tables).
    stream_slots = geom_bytes > _STREAM_VMEM_BUDGET
    # Expansion sweep (round 5): hard requirements are VMEM-resident slot
    # tables (visits lane-slice them), per-set cluster counts within the
    # [M, R] mask-matmul budget, and pow2 lanes-per-row (the scalar
    # reduction splits ray ids with shifts).
    exp_cfg = getattr(cfg, "expand_sweep", "auto")
    g_lanes = lanes // max(sub, 1)
    expand = (
        exp_cfg in ("auto", "on")
        and not stream_slots
        and max(
            cl.sph_cluster.shape[0] if scene.num_spheres else 0,
            cl.tri_cluster.shape[0] if scene.num_triangles else 0,
        )
        <= _EXP_MAX_CL
        and g_lanes > 0
        and (g_lanes & (g_lanes - 1)) == 0
        and lanes <= 4096  # ray ids ride a 12-bit packed-meta field
        and "noexp" not in ablate
        # auto: only where bounce rays are cluster-incoherent (closed
        # bodies).  On open/sparse layouts the row-granular sweep's
        # lane-row unions stay tight and expansion's item machinery
        # is pure overhead (heightfield 11.3 -> 3.2, 40k cover
        # 8.3 -> 3.1 Mray/s measured with it forced on).
        and (
            exp_cfg == "on"
            or getattr(cl, "chord_clusters", 0.0) >= _EXP_MIN_CHORD
        )
    )
    use_defocus = (
        camera.defocus_on
        if camera.defocus_on is not None
        else bool(np.asarray(camera.defocus_angle) > 0.0)
    )
    has_images = bool(scene.has_image_textures)

    statics = dict(
        spp=int(spp),
        width=camera.image_width,
        n_global=n_global,
        n_spheres=scene.num_spheres,
        n_sph_chunks=1 if scene.num_spheres else 0,  # set-present flags
        n_tri_chunks=1 if scene.num_triangles else 0,
        max_depth=cfg.max_depth,
        t_min=float(cfg.t_min),
        t_max=float(cfg.t_max),
        origin_offset=float(cfg.origin_offset),
        rr_clamp=float(cfg.compat.rr_clamp),
        backface_cull=bool(cfg.compat.triangle_backface_cull),
        shared_halton_jitter=bool(cfg.compat.shared_halton_jitter),
        use_defocus=use_defocus,
        cos_gamma_as_angle=bool(sky.cos_gamma_as_angle),
        has_images=has_images,
        uv_bbox_remap=bool(cfg.compat.triangle_uv_bbox_remap),
        lanes=lanes,
        sub=sub,
        tile_pixels=tile_pixels,
        n_tiles=n_tiles,
        n_pixels=n_pixels,
        interpret=interpret,
        sky_model=sky_model,
        ablate=ablate,
        inline_shade=bool(cl.inline_ok)
        and cl.checker_table is not None
        and not stream_slots,
        stream_slots=stream_slots,
        expand_sweep=expand,
        # Lane binning (see _mega_kernel): "auto" enables the per-bounce
        # pool sort when lane-row GROUPING can consume the coherence it
        # creates (NG > 1 via the same _row_group_count the kernel uses,
        # so sub degradation can't leave the sort on at NG == 1) — it is
        # what keeps closed-geometry (blob/armor/car class) scenes off
        # the incoherence cliff.  With NG == 1 (e.g. the 1M cover's 200+
        # supers) the sweep is pool-granular and sorting is pure
        # overhead (1M: 6.33 off vs 5.98 on, round 4).
        bin_lanes=(
            getattr(cfg, "bin_lanes", "auto") == "on"
            or (
                getattr(cfg, "bin_lanes", "auto") == "auto"
                and _row_group_count(
                    sub,
                    cl.sph_cluster.shape[0] // SUPER_SLOTS
                    if scene.num_spheres
                    else 0,
                    cl.tri_cluster.shape[0] // SUPER_SLOTS
                    if scene.num_triangles
                    else 0,
                )
                > 1
            )
        ),
    )
    img, iters = _mega_call_clustered(
        (
            cl.sph_super, cl.sph_cluster, cl.sph_slots,
            cl.tri_super, cl.tri_cluster, cl.tri_slots,
            cl.shade_table, cl.checker_table,
        ),
        scene.atlas if has_images else None,
        camera,
        sky,
        key,
        sample_offset,
        pixel_base,
        f_rows=F_ROWS,
        **statics,
    )
    if return_iters:
        return img, iters
    return img
