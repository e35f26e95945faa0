#!/usr/bin/env python3
"""Convert a legacy netlist (v1 .net) SNN description to the YAML format.

Reference analog: scripts/net_to_yaml.py — rebuilt on the framework's own
parsers/serializers so the conversion matches simulator semantics exactly
(the reference script reimplements ad-hoc parsing).

Usage: net_to_yaml.py <arch.yaml> <in.net> <out.yaml>
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("arch", help="architecture YAML the netlist maps to")
    parser.add_argument("netlist", help="input .net description")
    parser.add_argument("output", help="output YAML path")
    args = parser.parse_args(argv)

    import sanafe_tpu as sf

    arch = sf.load_arch(args.arch)
    net = sf.load_net(args.netlist, arch, use_netlist_format=True)
    net.save(args.output)
    print(f"Wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
