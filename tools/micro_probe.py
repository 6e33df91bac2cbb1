#!/usr/bin/env python
"""Microbenchmarks for the round-5 expansion-architecture primitives.

The (8,128) flipped-vreg expansion design (ROADMAP round-4 findings)
hinges on three primitive costs that no existing probe measures:

  reduce   per-item cost of a PURE-SCALAR SMEM reduction loop
           (item -> ray winner min; the matmul alternative is provably
           MXU-starved: gathering 4-8 value rows through an
           [items x dsts] one-hot wastes >30x on M/N padding)
  gather   per-visit cost of 8 sublane-dynamic (1,8) ray-state slices
           + concat + the ~35-vector-op flipped intersect on (8,128)
  scatter  per-chunk cost of the DEFAULT-precision byte-plane OR-scatter
           (8 dots [nv,G] @ [CH,G]^T, one per state row, K dsts ORed
           into one pmat column)

Each kernel takes a dynamic rep count from SMEM so one compile serves
all trip counts; cost = slope between two counts (probe_one.py style).

Usage: python tools/micro_probe.py [reduce|gather|scatter] [--reps ...]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NI = 8192  # items
NV = NI // 8  # visits
R = 1024  # rays


def reduce_kernel(ctl_ref, rid_ref, key_ref, out_ref, best_s, bi_s, *, unroll):
    reps = ctl_ref[0, 0]
    ni = ctl_ref[0, 1]

    def rep(rr, acc):
        def ibody(i):
            for _ in range(unroll):
                r = rid_ref[0, i]
                k = key_ref[0, i]
                row = r >> 7
                lane = r & 127
                b = best_s[row, lane]
                better = (k < b) & (r >= 0)
                best_s[row, lane] = jnp.where(better, k, b)
                bi_s[row, lane] = jnp.where(better, i, bi_s[row, lane])
                i = i + 1
            return i

        jax.lax.while_loop(lambda i: i < ni, ibody, jnp.int32(0))
        return acc + best_s[rr & 7, rr & 127]

    acc = jax.lax.fori_loop(0, reps, rep, jnp.int32(0))
    out_ref[:, :] = jnp.full((8, 128), acc.astype(jnp.float32))


def gather_kernel(
    ctl_ref, rays_t_ref, slots_ref, item_ref, vcl_ref, out_ref, res_scr,
    *, unroll, mode
):
    reps = ctl_ref[0, 0]
    nv = ctl_ref[0, 1]
    n_cl = slots_ref.shape[1] // 128
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def rep(rr, acc):
        def vbody(v):
            for _ in range(unroll):
                vc = jnp.minimum(v, NV - 1)
                ci = jnp.minimum(vcl_ref[0, vc], n_cl - 1)
                if mode == "noslot":
                    sl = slots_ref[:, 0:128]
                else:
                    sl = slots_ref[:, pl.ds(pl.multiple_of(ci * 128, 128), 128)]
                if mode == "nogather":
                    itm = sl[0:8, 0:8] * 0.5
                else:
                    its = []
                    for j in range(8):
                        rj = rid = item_ref[0, vc * 8 + j]
                        its.append(rays_t_ref[pl.ds(jnp.maximum(rj, 0), 1), :])
                    itm = jnp.concatenate(its, axis=0)  # (8, 8)
                ox, oy, oz = itm[:, 0:1], itm[:, 1:2], itm[:, 2:3]
                dx, dy, dz = itm[:, 3:4], itm[:, 4:5], itm[:, 5:6]
                if mode == "nomath":
                    kmin = (
                        pltpu.bitcast(ox + dx, jnp.int32)
                        + pltpu.bitcast(oy + dy, jnp.int32)
                    )
                else:
                    cx, cy, cz, rad = sl[0:1, :], sl[1:2, :], sl[2:3, :], sl[3:4, :]
                    a = dx * dx + dy * dy + dz * dz
                    inv_a = 1.0 / a
                    ocx = cx - ox  # (8,128)
                    ocy = cy - oy
                    ocz = cz - oz
                    h = dx * ocx + dy * ocy + dz * ocz
                    c_ = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                    disc = h * h - a * c_
                    sd = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t0 = (h - sd) * inv_a
                    t1 = (h + sd) * inv_a
                    t_cand = jnp.where(t0 >= 1e-3, t0, t1)
                    valid = (disc >= 0.0) & (rad > 0.0) & (t_cand >= 1e-3)
                    t_cand = jnp.where(valid, t_cand, np.float32(3e38))
                    key = (pltpu.bitcast(t_cand, jnp.int32) & ~127) | lane_i
                    kmin = jnp.min(key, axis=1, keepdims=True)  # (8,1)
                if mode == "unaligned":
                    res_scr[pl.ds(vc * 8 - (vc & 7), 8), 0:1] = kmin
                else:
                    res_scr[pl.ds(vc * 8, 8), 0:1] = kmin
                v = v + 1
            return v

        jax.lax.while_loop(lambda v: v < nv, vbody, jnp.int32(0))
        return acc + res_scr[rr & 7, 0]

    acc = jax.lax.fori_loop(0, reps, rep, jnp.int32(0))
    out_ref[:, :] = jnp.full((8, 128), acc.astype(jnp.float32))


def scatter_kernel(ctl_ref, vals_ref, dst_ref, out_ref, scr, *, nvrows, kk, ch):
    """Per chunk: 8 dots [nv, G] @ [CH, G]^T (DEFAULT precision), pmat =
    OR over K dst rows.  dst_ref (8*K, 128) holds per-(s,k) dst ids."""
    reps = ctl_ref[0, 0]
    n_chunks = ctl_ref[0, 1]
    chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, 128), 0)
    ddp = (((1,), (1,)), ((), ()))

    def rep(rr, acc):
        def cbody(c):
            base = c * ch
            tot = None
            for s in range(8):
                pm = jnp.zeros((ch, 128), jnp.float32)
                for k in range(kk):
                    d = dst_ref[s * kk + k : s * kk + k + 1, :] - base
                    pm = jnp.maximum(pm, (chunk_iota == d).astype(jnp.float32))
                part = jax.lax.dot_general(
                    vals_ref[s * nvrows : (s + 1) * nvrows, :],
                    pm,
                    ddp,
                    preferred_element_type=jnp.float32,
                )  # [nv, CH]
                tot = part if tot is None else tot + part
            cc = jnp.minimum(c, (NI // ch) - 1)
            scr[:, pl.ds(pl.multiple_of(cc * ch, ch), ch)] = tot
            return c + 1

        jax.lax.while_loop(lambda c: c < n_chunks, cbody, jnp.int32(0))
        return acc + jnp.sum(scr[0:1, pl.ds(pl.multiple_of((rr & 7) * 128, 128), 128)])

    acc = jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))
    out_ref[:, :] = jnp.full((8, 128), acc)


def run(name, kernel, inputs, scratch, r1, r2, n, trials=3, interpret=False):
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if x.dtype == jnp.int32 and x.shape[0] == 1
            else pl.BlockSpec(memory_space=pltpu.VMEM)
            for x in inputs[1:]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )
    jf = jax.jit(f)

    def t(reps):
        ctl = jnp.asarray([[reps, n]], jnp.int32)
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(jf(ctl, *inputs[1:]))  # device->host forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.perf_counter()
    t(1)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f} s", flush=True)
    b1, b2 = t(r1), t(r2)
    per_unit = (b2 - b1) / (r2 - r1) / n * 1e9
    print(
        f"{name}: {per_unit:8.2f} ns/unit over n={n} "
        f"(r{r1}={b1*1e3:.2f} ms r{r2}={b2*1e3:.2f} ms)",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all")
    ap.add_argument("--r1", type=int, default=8)
    ap.add_argument("--r2", type=int, default=32)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--mode", default="full")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    if args.which in ("reduce", "all"):
        rid = jnp.asarray(rng.integers(0, R, (1, NI)), jnp.int32)
        key = jnp.asarray(rng.integers(0, 1 << 30, (1, NI)), jnp.int32)
        run(
            "reduce",
            functools.partial(reduce_kernel, unroll=args.unroll),
            [None, rid, key],
            [pltpu.SMEM((8, 128), jnp.int32), pltpu.SMEM((8, 128), jnp.int32)],
            args.r1, args.r2, NI, interpret=args.interpret,
        )

    if args.which in ("gather", "all"):
        rays_t = jnp.asarray(rng.standard_normal((R, 8)), jnp.float32)
        n_cl = 832
        slots = jnp.asarray(
            rng.standard_normal((8, n_cl * 128)), jnp.float32
        )
        item = jnp.asarray(rng.integers(0, R, (1, NI)), jnp.int32)
        vcl = jnp.asarray(rng.integers(0, n_cl, (1, NV)), jnp.int32)
        for mode in (
            [args.mode] if args.mode != "sweep"
            else ["full", "nomath", "nogather", "noslot"]
        ):
            run(
                f"gather[{mode}]",
                functools.partial(gather_kernel, unroll=4, mode=mode),
                [None, rays_t, slots, item, vcl],
                [pltpu.VMEM((NI, 1), jnp.int32)],
                args.r1, args.r2, NV, interpret=args.interpret,
            )

    if args.which in ("scatter", "all"):
        nvrows, kk, ch = 8, 4, 512
        vals = jnp.asarray(rng.standard_normal((8 * nvrows, 128)), jnp.float32)
        dst = jnp.asarray(rng.integers(0, NI, (8 * kk, 128)), jnp.int32)
        run(
            f"scatter[nv={nvrows},K={kk},CH={ch}] (per chunk-of-{ch})",
            functools.partial(scatter_kernel, nvrows=nvrows, kk=kk, ch=ch),
            [None, vals, dst],
            [pltpu.VMEM((nvrows, NI), jnp.float32)],
            args.r1, args.r2, NI // ch, interpret=args.interpret,
        )


if __name__ == "__main__":
    main()
