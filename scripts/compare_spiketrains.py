#!/usr/bin/env python3
"""Compare two spike rasters (spikes.csv) for exact equality.

The golden-validation tool for the bit-identical-raster north star
(reference analog: scripts/compare_spiketrains.py, updated for the current
``neuron,timestep`` row format written by src/chip.cpp:1610-1630 and this
framework). Accepts plain or .gz files. Exit code 0 when identical, 1
otherwise (prints the first --max-diffs differences).
"""

from __future__ import annotations

import argparse
import gzip
import sys
from pathlib import Path


def read_spikes(path: str) -> list[str]:
    p = Path(path)
    if p.suffix == ".gz":
        text = gzip.decompress(p.read_bytes()).decode()
    else:
        text = p.read_text()
    lines = text.splitlines()
    if lines and lines[0].strip() == "neuron,timestep":
        lines = lines[1:]
    return [line for line in lines if line.strip()]


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("first")
    parser.add_argument("second")
    parser.add_argument(
        "--max-diffs", type=int, default=20,
        help="stop printing after this many differences",
    )
    args = parser.parse_args(argv)

    first = read_spikes(args.first)
    second = read_spikes(args.second)
    diffs = 0
    for i, (a, b) in enumerate(zip(first, second)):
        if a != b:
            if diffs < args.max_diffs:
                print(f"row {i + 1}: {a!r} != {b!r}")
            diffs += 1
    if len(first) != len(second):
        print(f"event counts differ: {len(first)} vs {len(second)}")
        diffs += abs(len(first) - len(second))
    if diffs:
        print(f"NOT IDENTICAL ({diffs} differences)")
        return 1
    print(f"IDENTICAL ({len(first)} spike events)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
