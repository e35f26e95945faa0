#!/usr/bin/env python3
"""CI driver: run every gate and report a combined pass/fail.

Reference analog: tests/ci/run.rb (build, format, tidy, cppcheck, dynamic
tests, perf). The gates here:

1. unit + integration + reference-parity tests (pytest, fast set)
2. native scheduler builds from a clean tree (g++ smoke)
3. memory-safety gate: ASan/UBSan/LSan replay of captured ctypes
   traffic through the native scheduler (ci/sanitize_gate.py — the
   reference's Valgrind memcheck analog)
4. performance-regression gate (ci/check_perf.py, >10% drift FAILS)

Pass --slow to include the long acceptance runs (DVS 1000-step parity,
loihi_large cycle tier). Logs land in ci/logs/<timestamp>/.
"""

from __future__ import annotations

import argparse
import datetime
import shutil
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).parent.parent


def run_gate(name: str, cmd: list[str], log_dir: Path) -> bool:
    print(f"=== {name} ===")
    result = subprocess.run(
        cmd, cwd=REPO_ROOT, capture_output=True, text=True
    )
    (log_dir / f"{name}.log").write_text(result.stdout + result.stderr)
    ok = result.returncode == 0
    print(("PASS" if ok else "FAIL") + f" ({name})")
    if not ok:
        print(result.stdout[-2000:])
        print(result.stderr[-2000:])
    return ok


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--slow", action="store_true",
                        help="include the slow acceptance tests")
    parser.add_argument("--skip-perf", action="store_true",
                        help="skip the perf gate (no TPU available)")
    args = parser.parse_args(argv)

    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    log_dir = REPO_ROOT / "ci" / "logs" / stamp
    log_dir.mkdir(parents=True, exist_ok=True)

    gates: list[tuple[str, list[str]]] = []
    marker = [] if args.slow else ["-m", "not slow"]
    gates.append(
        ("tests", [sys.executable, "-m", "pytest", "tests/", "-q", *marker])
    )
    if shutil.which("g++"):
        gates.append((
            "native-build",
            [
                "g++", "-O3", "-ffp-contract=off", "-std=c++17", "-shared",
                "-fPIC", "-fopenmp",
                str(REPO_ROOT / "sanafe_tpu/native_src/scheduler.cpp"),
                "-o", str(log_dir / "libsanafe_sched_ci.so"),
            ],
        ))
    if shutil.which("g++"):
        # ASan/UBSan/LSan replay of captured ctypes traffic (the
        # reference runs its C++ under Valgrind memcheck in CI)
        gates.append((
            "sanitize",
            [sys.executable, str(REPO_ROOT / "ci/sanitize_gate.py")],
        ))
    if args.slow:
        # offline docs build (reference analog: Sphinx/readthedocs build;
        # sphinx is not installable here — docs/build_offline.py renders
        # the same sources + live autodoc introspection without it)
        gates.append((
            "docs",
            [sys.executable, str(REPO_ROOT / "docs/build_offline.py"),
             "--check"],
        ))
    if not args.skip_perf:
        gates.append(
            ("perf", [sys.executable, str(REPO_ROOT / "ci/check_perf.py")])
        )

    failures = [
        name for name, cmd in gates if not run_gate(name, cmd, log_dir)
    ]
    print("=" * 40)
    if failures:
        print(f"CI FAILED: {', '.join(failures)} (logs: {log_dir})")
        return 1
    print(f"CI PASSED ({len(gates)} gates; logs: {log_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
