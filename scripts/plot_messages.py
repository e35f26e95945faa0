#!/usr/bin/env python3
"""Plot NoC message statistics from a messages.csv trace: a per-tile router
load heatmap (spikes processed per router along dimension-order routes) and
histograms of hop counts and delays.

Reference analog: scripts/plot_messages.py, generalized from its hardcoded
8x4 Loihi mesh to any --width x --height NoC.
"""

from __future__ import annotations

import argparse
import csv
import sys

import numpy as np


def route_tiles(src_x, src_y, dest_x, dest_y):
    """Tiles visited on the dimension-order (x then y) route, inclusive."""
    yield src_x, src_y
    x, y = src_x, src_y
    while x != dest_x:
        x += 1 if dest_x > x else -1
        yield x, y
    while y != dest_y:
        y += 1 if dest_y > y else -1
        yield x, y


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("trace", help="messages.csv path")
    parser.add_argument("--width", type=int, default=8, help="NoC width")
    parser.add_argument("--height", type=int, default=4, help="NoC height")
    parser.add_argument(
        "--cores-per-tile", type=int, default=4,
        help="cores per tile (to map core ids to tiles)",
    )
    parser.add_argument("-o", "--output", default="messages.png")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    load = np.zeros((args.height, args.width), dtype=np.int64)
    hops, gen_delays, proc_delays = [], [], []
    with open(args.trace) as stream:
        for row in csv.DictReader(stream):
            if row["mid"] == "-1":
                continue
            src_tile = int(row["src_hw"].split(".")[0])
            dest_tile = int(row["dest_hw"].split(".")[0])
            sx, sy = divmod(src_tile, args.height)
            dx, dy = divmod(dest_tile, args.height)
            for x, y in route_tiles(sx, sy, dx, dy):
                load[y, x] += 1
            hops.append(int(row["hops"]))
            gen_delays.append(float(row["generation_delay"]))
            proc_delays.append(float(row["processing_delay"]))

    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    im = axes[0, 0].imshow(load, cmap="hot", origin="lower")
    axes[0, 0].set_title("Router load (messages through tile)")
    axes[0, 0].set_xlabel("tile x")
    axes[0, 0].set_ylabel("tile y")
    fig.colorbar(im, ax=axes[0, 0])
    axes[0, 1].hist(hops, bins=max(1, max(hops, default=1)))
    axes[0, 1].set_title("Hops per message")
    axes[1, 0].hist(gen_delays, bins=50)
    axes[1, 0].set_title("Generation delay (s)")
    axes[1, 1].hist(proc_delays, bins=50)
    axes[1, 1].set_title("Processing delay (s)")
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"Wrote {args.output} ({len(hops)} messages)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
