#!/usr/bin/env python3
"""Summarize a messages.csv trace: message counts, delay statistics, and
per-core send/receive load.

Functional port of the reference's message-analysis tooling
(scripts/message_analysis.py) over the message trace columns written by
src/chip.cpp:1731-1764 / sanafe_tpu.trace. Prints a text report; with
--csv writes per-core aggregates for further analysis.
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import defaultdict


DELAY_FIELDS = (
    "generation_delay",
    "processing_delay",
    "network_delay",
    "blocking_delay",
)


def analyze(path: str):
    totals = defaultdict(float)
    count = 0
    placeholders = 0
    hops_total = 0
    max_fields: dict[str, tuple[float, str]] = {}
    sent_per_core: dict[str, int] = defaultdict(int)
    recv_per_core: dict[str, int] = defaultdict(int)
    timesteps = set()
    with open(path) as stream:
        for row in csv.DictReader(stream):
            timesteps.add(row["timestep"])
            if row["mid"] == "-1":
                placeholders += 1
                continue
            count += 1
            hops_total += int(row["hops"])
            sent_per_core[row["src_hw"]] += 1
            recv_per_core[row["dest_hw"]] += 1
            for field in DELAY_FIELDS:
                value = float(row[field])
                totals[field] += value
                best = max_fields.get(field)
                if best is None or value > best[0]:
                    max_fields[field] = (value, row["mid"])
    return {
        "messages": count,
        "placeholders": placeholders,
        "timesteps": len(timesteps),
        "hops_total": hops_total,
        "totals": dict(totals),
        "max_fields": max_fields,
        "sent_per_core": dict(sent_per_core),
        "recv_per_core": dict(recv_per_core),
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("trace", help="messages.csv path")
    parser.add_argument(
        "--csv", help="write per-core send/receive aggregates to this path"
    )
    parser.add_argument(
        "--top", type=int, default=10, help="cores to list in the report"
    )
    args = parser.parse_args(argv)

    stats = analyze(args.trace)
    n = stats["messages"]
    print(f"messages: {n} (+{stats['placeholders']} placeholders) "
          f"over {stats['timesteps']} timesteps")
    if n:
        print(f"mean hops: {stats['hops_total'] / n:.3f}")
        for field in DELAY_FIELDS:
            total = stats["totals"].get(field, 0.0)
            worst, worst_mid = stats["max_fields"].get(field, (0.0, "-"))
            print(f"{field}: mean {total / n:.3e} s, "
                  f"max {worst:.3e} s (mid {worst_mid})")
        for label, per_core in (
            ("busiest senders", stats["sent_per_core"]),
            ("busiest receivers", stats["recv_per_core"]),
        ):
            ranked = sorted(
                per_core.items(), key=lambda kv: kv[1], reverse=True
            )[: args.top]
            print(f"{label}: " + ", ".join(
                f"{core}({count})" for core, count in ranked
            ))
    if args.csv:
        cores = sorted(
            set(stats["sent_per_core"]) | set(stats["recv_per_core"])
        )
        with open(args.csv, "w", newline="") as out:
            writer = csv.writer(out)
            writer.writerow(["core", "messages_sent", "messages_received"])
            for core in cores:
                writer.writerow([
                    core,
                    stats["sent_per_core"].get(core, 0),
                    stats["recv_per_core"].get(core, 0),
                ])
        print(f"Wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
