#!/usr/bin/env python3
"""Plot a spike raster from a spikes.csv trace (neuron,timestep rows).

Reference analog: scripts/plot_raster.py, updated for the current trace
format (it consumed an older one-row-per-neuron probe format).
"""

from __future__ import annotations

import argparse
import csv
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("trace", help="spikes.csv path")
    parser.add_argument("-o", "--output", default="raster.png")
    parser.add_argument("--max-timestep", type=int, default=None)
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    neuron_rows: dict[str, int] = {}
    xs, ys = [], []
    with open(args.trace) as stream:
        for row in csv.DictReader(stream):
            t = int(row["timestep"])
            if args.max_timestep is not None and t > args.max_timestep:
                continue
            neuron = row["neuron"]
            idx = neuron_rows.setdefault(neuron, len(neuron_rows))
            xs.append(t)
            ys.append(idx)

    plt.figure(figsize=(6.0, 5.0))
    plt.scatter(xs, ys, c="b", s=2, marker=".", linewidths=0.1)
    plt.xlabel("Time-step")
    plt.ylabel("Neuron")
    plt.savefig(args.output, dpi=150)
    print(f"Wrote {args.output} ({len(xs)} spikes, "
          f"{len(neuron_rows)} neurons)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
