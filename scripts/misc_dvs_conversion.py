"""Convert DVS-gesture npz kernels to the compact YAML network format.

Port of /root/reference/scripts/misc_dvs_conversion.py: takes the
`dvs_challenge.npz` archive (conv1..conv4, dense1 filter tensors plus
per-input biases) and emits the compact `conv2d` hyperedge description
and per-input-neuron bias list, printing the edges and writing both to
the output file. Layer filters serialize as flow-style (inline) lists and
each input neuron as a flow-style map, matching the reference's pyyaml
styling hacks.

Usage:
  python scripts/misc_dvs_conversion.py <snn.yaml> <filters.npz> <out.yaml>

(The first argument is accepted for command-line compatibility; like the
reference, the script only reads the npz.)
"""

from __future__ import annotations

import sys

import numpy as np
import yaml


class FlowList(list):
    pass


class FlowDict(dict):
    pass


def _flow_list_rep(dumper, data):
    return dumper.represent_sequence(
        "tag:yaml.org,2002:seq", data, flow_style=True
    )


def _flow_dict_rep(dumper, data):
    return dumper.represent_mapping(
        "tag:yaml.org,2002:map", data, flow_style=True
    )


yaml.add_representer(FlowList, _flow_list_rep)
yaml.add_representer(FlowDict, _flow_dict_rep)

LAYER_KEYS = ("conv1", "conv2", "conv3", "conv4", "dense1")


def convert(np_filename: str) -> dict:
    info = np.load(np_filename)
    edges = [
        {
            f"{i} -> {i + 1}": {
                "type": "conv2d",
                "weight": FlowList(
                    info[key].astype(int).flatten().tolist()
                ),
            }
        }
        for i, key in enumerate(LAYER_KEYS)
        if key in info
    ]
    input_neurons = [
        FlowDict({neuron_id: {"bias": bias}})
        for neuron_id, bias in enumerate(
            info["inputs"].astype(int).tolist()
        )
    ]
    return {"network": {"edges": edges}, "neurons": input_neurons}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3:
        print("Usage: misc_dvs_conversion.py <snn> <in> <out>")
        return 1
    _yaml_filename, np_filename, out_filename = argv
    description = convert(np_filename)
    print(yaml.dump(description["network"]["edges"]))
    with open(out_filename, "w") as description_file:
        yaml.dump(description, description_file, default_flow_style=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
