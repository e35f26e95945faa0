#!/usr/bin/env python3
"""Performance-regression gate: run bench.py and FAIL on >10% slowdown
against the stored baseline.

Reference analog: tests/ci/check_perf.rb + perf_baseline.txt (which only
warns); this gate exits non-zero so CI actually blocks regressions.

Usage:
  check_perf.py            # compare against ci/perf_baseline.json
  check_perf.py --update   # run and store the result as the new baseline
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

BASELINE_PATH = Path(__file__).parent / "perf_baseline.json"
REPO_ROOT = Path(__file__).parent.parent
TOLERANCE = 0.10  # fail when >10% slower (check_perf.rb warns at the same)
# BASELINE.json north star: >=100x the reference binary on DVS detailed.
# Gated on the WORST-of-N repetition (see main) so passing means the bar
# holds under the tunnel link's run-to-run variance.
NORTH_STAR_X = 100.0


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO_ROOT / "bench.py")],
        capture_output=True, text=True, check=True, cwd=REPO_ROOT,
    )
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--update", action="store_true",
                        help="store the measured value as the new baseline")
    args = parser.parse_args(argv)

    result = run_bench()
    value = float(result["value"])
    print(f"measured: {value:,.1f} {result['unit']} "
          f"({result['vs_baseline']}x reference)")

    if args.update or not BASELINE_PATH.exists():
        BASELINE_PATH.write_text(json.dumps(result, indent=2) + "\n")
        print(f"baseline {'updated' if args.update else 'created'}: "
              f"{BASELINE_PATH}")
        return 0

    baseline = json.loads(BASELINE_PATH.read_text())
    failed = False
    base_extra = baseline.get("extra", {})
    if baseline.get("metric") != result.get("metric"):
        print(f"baseline metric '{baseline.get('metric')}' != measured "
              f"'{result.get('metric')}'; refresh with --update")
        return 1
    checks = [(result["metric"], value, float(baseline["value"]))]
    extra = result.get("extra", {})
    for key, measured in extra.items():
        if key.endswith("_worst_ts_per_s"):
            # worst-of-N rates swing with tunnel variance (bench.py: up to
            # +-20% run to run) — the drift gate uses best-of-N; the
            # north-star gate below enforces the absolute bar on worst-of-N
            if key in base_extra:
                print(f"{key}: {float(measured):,.1f} vs baseline "
                      f"{float(base_extra[key]):,.1f} (drift: report-only)")
            continue
        if key.endswith("_ts_per_s") and key in base_extra:
            checks.append((key, float(measured), float(base_extra[key])))
    # North-star gate (BASELINE.json): >=100x the reference binary on DVS
    # detailed, enforced on the WORST repetition so a pass means the bar
    # clears under tunnel variance, not just on a good run.
    worst_x = extra.get("dvs_detailed_worst_vs_baseline")
    if worst_x is not None:
        print(f"dvs_detailed_worst_vs_baseline: {float(worst_x):.1f}x "
              f"(north-star gate: >= {NORTH_STAR_X:.0f}x)")
        if float(worst_x) < NORTH_STAR_X:
            print(f"FAIL: worst-of-N DVS detailed below the {NORTH_STAR_X:.0f}x "
                  "north star")
            failed = True
    if not checks:
        print("FAIL: no comparable metrics between bench output and "
              "baseline; refresh with --update")
        return 1
    for name, measured, base_value in checks:
        ratio = measured / base_value
        print(f"{name}: {measured:,.1f} vs baseline {base_value:,.1f} "
              f"(ratio {ratio:.3f})")
        if ratio < 1.0 - TOLERANCE:
            print(f"FAIL: {name} >{TOLERANCE:.0%} slower than baseline")
            failed = True
        elif ratio > 1.0 + TOLERANCE:
            print(f"note: {name} significantly faster than baseline — "
                  "consider committing a new baseline with --update")
    if failed:
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
