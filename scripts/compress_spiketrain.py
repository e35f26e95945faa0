"""Compress a spikes.csv trace for one layer into snntoolbox's two-row
format (neuron ids row, spike times row).

Port of /root/reference/scripts/compress_spiketrain.py with the layer and
paths as arguments instead of hardcoded.

Usage: python scripts/compress_spiketrain.py spikes.csv 1 spiketrain.csv
"""

from __future__ import annotations

import csv
import sys


def compress(spikes_path: str, layer: str, out_path: str) -> int:
    spikes: list[tuple[str, int]] = []
    with open(spikes_path) as csvfile:
        for row in csv.DictReader(csvfile):
            group, neuron = row["neuron"].rsplit(".", 1)
            if group == layer:
                spikes.append((neuron, int(row["timestep"])))
    spikes.sort(key=lambda x: x[1])
    with open(out_path, "w", newline="") as csvfile:
        writer = csv.writer(csvfile)
        writer.writerow([s[0] for s in spikes])
        writer.writerow([s[1] for s in spikes])
    print(f"Wrote {len(spikes)} spikes for layer {layer!r} to {out_path}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(2)
    sys.exit(compress(sys.argv[1], sys.argv[2], sys.argv[3]))
