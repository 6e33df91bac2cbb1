#!/usr/bin/env python
"""Flat-bench perf gate: catch scheduling-cliff regressions at commit time.

The flat megakernel sits on a Mosaic scheduling cliff (ROADMAP): even
strictly op-reducing edits have measured -13% end to end, so any
megakernel-touching commit must A/B the bench on the real chip.  This
gate runs bench.py (subprocess, current tree) and compares against the
committed baseline with the +-15% basin-variance threshold.

Usage:
  python tools/perf_gate.py            # flat + 360k + blob mesh rows
  python tools/perf_gate.py --update   # record the current numbers
  python tools/perf_gate.py --flat-only  # quick loop (flat bench only)

The clustered (360k) and mesh (config-3 class blob) rows are gated BY
DEFAULT — configs 3-5 live on those paths and a regression there used to
land silently.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "PERF_BASELINE.json")
THRESHOLD = 0.85  # basin-variance bound (ROADMAP scheduling-cliff note)


def measure_flat() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return float(json.loads(line)["value"])
    raise RuntimeError(f"bench.py produced no metric:\n{out.stdout}\n{out.stderr}")


def measure_clustered(which="360k") -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cluster_bench.py"), which],
        capture_output=True, text=True, cwd=REPO, timeout=2400,
    )
    for line in out.stdout.splitlines():
        if "Mray/s" in line:
            return float(line.split(":")[1].split("Mray")[0])
    raise RuntimeError(f"cluster_bench produced no metric:\n{out.stdout}\n{out.stderr}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--flat-only", action="store_true")
    ap.add_argument("--also-clustered", action="store_true")  # legacy alias
    args = ap.parse_args()

    results = {"flat_cover_mray_s": measure_flat()}
    if not args.flat_only:
        results["clustered_360k_mray_s"] = measure_clustered("360k")
        results["mesh_blob_mray_s"] = measure_clustered("mesh")
    print("measured:", json.dumps(results))

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
            continue
        ratio = v / b
        status = "OK" if ratio >= THRESHOLD else "REGRESSION"
        if ratio < THRESHOLD:
            ok = False
        print(f"{k}: {v:.2f} vs baseline {b:.2f} ({ratio:.3f}x) {status}")
    if not ok:
        print(
            f"FAIL: below the {THRESHOLD:.0%} basin-variance threshold — "
            "re-measure (basin noise) or fix before committing."
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
