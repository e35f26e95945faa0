"""Latin-square CSP solver on simulated Loihi (TCAD'25 experiment).

TPU-native rewrite of the reference experiment
(/root/reference/scripts/tcad2025/latin_squares.py): an N x N grid of
N-neuron winner-take-all layers with row/column/position inhibition,
running on the stochastic-LIF Loihi model. Differences from the
reference script:

- the stochastic soma's noise stream file is generated here (the
  reference points at an absolute path outside its tree); values are
  drawn once with a fixed seed so runs are reproducible,
- the network is built and solved in-process (in-memory spike trace)
  instead of round-tripping through a netlist file and spikes.csv,
- the solution is validated (each row and column a permutation).

Usage: python scripts/tcad2025/latin_squares.py [N] [timesteps]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import numpy as np

import sanafe_tpu as sf

REF_ARCH = Path("/root/reference/arch/loihi_with_noise.yaml")
LOIHI_CORES = 128
MAX_COMPARTMENTS = 1024

WTA_ATTRIBUTES = {
    "log_spikes": True,
    "force_update": True,
    "threshold": 64,
    "reset": 0,
    "leak_decay": 1,
    "reverse_threshold": -(2**8) + 1,
    "reverse_reset_mode": "saturate",
}


def build_noisy_loihi(workdir: Path, seed: int = 2025):
    """Load loihi_with_noise.yaml with its broken absolute noise path
    replaced by a generated 9-bit noise stream."""
    rng = np.random.default_rng(seed)
    noise_path = workdir / "loihi_random_seq.csv"
    noise_path.write_text(
        "\n".join(str(int(v)) for v in rng.integers(0, 512, 20000)) + "\n"
    )
    text = REF_ARCH.read_text()
    patched = []
    for line in text.splitlines():
        if "noise:" in line:
            indent = line[: len(line) - len(line.lstrip())]
            line = f"{indent}noise: {noise_path}"
        patched.append(line)
    arch_path = workdir / "loihi_noise_patched.yaml"
    arch_path.write_text("\n".join(patched) + "\n")
    return sf.load_arch(arch_path)


class _GreedyMapper:
    """The reference's greedy core filler, including its Loihi-bug
    workaround: the first group mapped to each fresh core is preceded by
    a one-neuron dummy group."""

    def __init__(self, cores, max_compartments=MAX_COMPARTMENTS):
        self.cores = cores
        self.free = [max_compartments] * len(cores)
        self.max = max_compartments

    def place(self, count):
        for idx, free in enumerate(self.free):
            if free is None:
                continue
            fresh = free == self.max
            if free < count + (1 if fresh else 0):
                self.free[idx] = None
                continue
            if fresh:
                self.free[idx] -= 1  # dummy neuron slot
            self.free[idx] -= count
            return idx, fresh
        raise RuntimeError("network does not fit on the chip")


def latin_square_network(N: int, arch, net: "sf.Network | None" = None,
                         max_compartments: int = MAX_COMPARTMENTS):
    """Build the WTA grid network and map it."""
    net = net or sf.Network()
    cores = arch.cores()
    mapper = _GreedyMapper(cores, max_compartments)
    zero_pad = len(str(len(cores) + N * N - 1))

    attrs = dict(
        WTA_ATTRIBUTES,
        soma_hw_name="loihi_stochastic_lif",
        default_synapse_hw_name="loihi_sparse_synapse",
    )

    def config(extra=None):
        model = {
            k: v
            for k, v in attrs.items()
            if k
            not in (
                "log_spikes", "soma_hw_name", "default_synapse_hw_name"
            )
        }
        if extra:
            model.update(extra)
        return sf.NeuronConfiguration(
            model_attributes={
                k: sf.Attribute(v) for k, v in model.items()
            },
            soma_hw_name=attrs["soma_hw_name"],
            default_synapse_hw_name=attrs["default_synapse_hw_name"],
            log_spikes=True,
        )

    square = []
    gid = 1
    for row in range(N):
        layer_row = []
        for col in range(N):
            core_id, fresh = mapper.place(N)
            if fresh:
                dummy = net.create_neuron_group(
                    f"~dummy_core_{core_id}", 1, config()
                )
                dummy[0].map_to_core(cores[core_id])
            wta = net.create_neuron_group(
                f"group_{gid:0{zero_pad}d}", N,
                config({"bias": 1 * 2**7}),
            )
            gid += 1
            for neuron in wta:
                neuron.map_to_core(cores[core_id])
            layer_row.append(wta)
        square.append(layer_row)

    inhibit = {"weight": sf.Attribute(-128)}
    connections = 0
    for row in range(N):
        for col in range(N):
            pos = square[row][col]
            for digit in range(N):
                pre = pos[digit]
                for d in range(N):
                    if d != digit:
                        pre.connect_to_neuron(pos[d], inhibit)
                        connections += 1
                for r in range(N):
                    if r != row:
                        pre.connect_to_neuron(square[r][col][digit], inhibit)
                        connections += 1
                for c in range(N):
                    if c != col:
                        pre.connect_to_neuron(square[row][c][digit], inhibit)
                        connections += 1
    print(f"Latin square network: {N * N * N} WTA neurons, "
          f"{connections} inhibiting connections")
    return net


def decode_solution(N: int, spike_steps, settle_fraction=0.75) -> np.ndarray:
    """Winner per position = most-spiking digit neuron, counted after the
    WTA dynamics have settled (the reference decodes 'after a fixed
    point'; counting the transient biases toward early random winners)."""
    spike_steps = spike_steps[int(len(spike_steps) * settle_fraction):]
    counts = np.zeros((N, N, N), dtype=np.int64)
    for step in spike_steps:
        for address in step:
            name = address.group_name
            if name.startswith("~dummy"):
                continue
            gid = int(name.split("_")[1]) - 1
            row, col = divmod(gid, N)
            counts[row, col, address.neuron_offset] += 1
    return counts.argmax(axis=2)


def is_latin(square: np.ndarray) -> bool:
    N = square.shape[0]
    want = set(range(N))
    return all(
        set(square[i, :]) == want and set(square[:, i]) == want
        for i in range(N)
    )


def main(N: int = 9, timesteps: int = 1024) -> int:
    with tempfile.TemporaryDirectory() as tmp:
        arch = build_noisy_loihi(Path(tmp))
        net = latin_square_network(N, arch)
        chip = sf.SpikingChip(arch)
        chip.load(net)
        result = chip.sim(
            timesteps, timing_model="detailed", spike_trace=True,
            heartbeat=0,
        )
    square = decode_solution(N, result["spike_trace"].data)
    print(square)
    ok = is_latin(square)
    print(f"valid latin square: {ok}")
    print(
        f"energy {result['energy']['total']:.3e} J, "
        f"sim_time {result['sim_time']:.3e} s, "
        f"{result['spikes']} synaptic ops"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    sys.exit(main(n, steps))
