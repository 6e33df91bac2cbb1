#!/usr/bin/env python
"""Commit-time perf gate with recorded per-row SPREADS.

The flat megakernel sits on a Mosaic scheduling cliff (ROADMAP): even
strictly op-reducing edits have measured -13% end to end, so any
megakernel-touching commit must A/B the bench on the real chip.

Two failure tiers per row (round-5, after round-4's drift critique):
  REGRESSION  measured best falls below the hard basin bound
              (baseline best x 0.85) -> exit 1.
  DRIFT       measured best falls outside the baseline's recorded
              3-run spread (but above the hard bound) -> exit 0 with a
              loud marker.  Same-session spreads measure ~1-3%; what
              lands here is cross-day compiler/platform drift (e.g. the
              heightfield row recorded 11.3 one day and 9.5 the next on
              the IDENTICAL commit).  A DRIFT must be explained or
              re-based with --update, not ignored.

Usage:
  python tools/perf_gate.py              # all rows, 3 runs each
  python tools/perf_gate.py --update     # re-record (best, spread)
  python tools/perf_gate.py --flat-only  # quick loop (flat bench only)
  python tools/perf_gate.py --runs 1     # fast check (no spread info)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "PERF_BASELINE.json")
THRESHOLD = 0.85  # hard basin-variance bound (ROADMAP scheduling cliff)


def measure_flat() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return float(json.loads(line)["value"])
    raise RuntimeError(f"bench.py produced no metric:\n{out.stdout}\n{out.stderr}")


def measure_clustered(which) -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cluster_bench.py"), which],
        capture_output=True, text=True, cwd=REPO, timeout=2400,
    )
    for line in out.stdout.splitlines():
        if "Mray/s" in line:
            return float(line.split(":")[1].split("Mray")[0])
    raise RuntimeError(f"cluster_bench produced no metric:\n{out.stdout}\n{out.stderr}")


ROWS = {
    "flat_cover_mray_s": measure_flat,
    "clustered_360k_mray_s": lambda: measure_clustered("360k"),
    "clustered_40k_mray_s": lambda: measure_clustered("40k"),
    "heightfield_mray_s": lambda: measure_clustered("heightfield"),
    "mesh_blob_mray_s": lambda: measure_clustered("mesh"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--flat-only", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--also-clustered", action="store_true")  # legacy alias
    args = ap.parse_args()

    rows = (
        {"flat_cover_mray_s": ROWS["flat_cover_mray_s"]}
        if args.flat_only
        else ROWS
    )
    results = {}
    for name, fn in rows.items():
        runs = sorted(fn() for _ in range(max(args.runs, 1)))
        results[name] = {
            "best": runs[-1],
            "spread_pct": round(
                100.0 * (runs[-1] - runs[0]) / max(runs[-1], 1e-9), 2
            ),
            "runs": runs,
        }
        print(f"measured {name}: {results[name]}", flush=True)

    if args.update or not os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH, "w") as f:
            json.dump(results, f, indent=1)
        print(f"baseline written to {BASELINE_PATH}")
        return 0

    with open(BASELINE_PATH) as f:
        base = json.load(f)
    ok = True
    for k, v in results.items():
        b = base.get(k)
        if b is None:
            print(f"{k}: no baseline row (run --update)")
            continue
        if isinstance(b, dict):
            b_best, b_spread = b["best"], b["spread_pct"] / 100.0
        else:  # legacy scalar baseline
            b_best, b_spread = float(b), 0.03
        ratio = v["best"] / b_best
        if ratio < THRESHOLD:
            status, ok = "REGRESSION", False
        elif ratio < 1.0 - max(b_spread, 0.02):
            status = "DRIFT (outside recorded spread — explain or --update)"
        else:
            status = "OK"
        print(f"{k}: {v['best']:.2f} vs baseline {b_best:.2f} ({ratio:.3f}x) {status}")
    if not ok:
        print(
            f"FAIL: below the {THRESHOLD:.0%} hard basin bound — re-measure "
            "(basin noise) or fix before committing."
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
