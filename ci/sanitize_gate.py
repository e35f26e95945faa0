#!/usr/bin/env python3
"""Memory-safety gate for the native scheduler (ASan + UBSan + LSan).

Reference analog: its CTest suite runs under Valgrind memcheck
(/root/reference/CMakeLists.txt:335-336, tests/README.md:16). Running
this repo's Python suite under ASan is not viable (ASan's allocator
aborts inside XLA's compiler), so the gate replays captured ctypes
traffic through a pure-C++ main() instead:

1. gunzip the committed replay fixture
   (tests/golden_ref/sanitize_replay.bin.gz — real simulation traffic
   recorded by scripts/capture_sanitize_replay.py; regenerate it with
   that script whenever the extern "C" surface changes)
2. build native_src/sanitize_harness.cpp + scheduler.cpp with
   -fsanitize=address,undefined -fno-sanitize-recover=all
3. run the replay + utility edge-case smoke; any report aborts

No Python/JAX in the instrumented process, so every finding is the
scheduler's own.
"""

from __future__ import annotations

import gzip
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "sanafe_tpu" / "native_src"
FIXTURE = REPO / "tests" / "golden_ref" / "sanitize_replay.bin.gz"


def main() -> int:
    if not FIXTURE.exists():
        print(f"missing replay fixture {FIXTURE}")
        return 1
    with tempfile.TemporaryDirectory() as td:
        replay = Path(td) / "sanitize_replay.bin"
        replay.write_bytes(gzip.decompress(FIXTURE.read_bytes()))
        harness = Path(td) / "sanitize_harness"
        build = [
            "g++", "-std=c++17", "-O1", "-g", "-fopenmp",
            "-ffp-contract=off", "-march=native",
            "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
            str(SRC / "sanitize_harness.cpp"), str(SRC / "scheduler.cpp"),
            "-o", str(harness),
        ]
        print("+", " ".join(build), flush=True)
        rc = subprocess.run(build).returncode
        if rc != 0:
            print("sanitizer build failed")
            return rc
        env = dict(os.environ, ASAN_OPTIONS="detect_leaks=1")
        print(f"+ {harness} {replay}", flush=True)
        rc = subprocess.run([str(harness), str(replay)], env=env).returncode
        if rc != 0:
            print("sanitize replay FAILED")
            return rc
    print("sanitize gate OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
