"""Randomized-network throughput benchmark (TCAD'25 experiment).

TPU-native rewrite of /root/reference/scripts/tcad2025/random_network.py:
generates parameterized random SNNs on a Loihi-style chip (cores x
neurons-per-core population; each firing neuron sends messages to
`messages_per_neuron` random cores, `spikes_per_message` synapses each)
and reports detailed-timing throughput, energy, and latency per
configuration. The generator is vectorized with numpy + the sparse bulk
path instead of per-edge Python objects, so million-edge nets build in
seconds.

Usage:
  python scripts/tcad2025/random_network.py [--timesteps 100] \
      [--experiment tiny|full]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute

REF_ARCH = Path("/root/reference/arch/loihi.yaml")


def create_random_network(arch, cores, neurons_per_core,
                          messages_per_neuron, spikes_per_message,
                          spike_percentage, seed=None):
    if seed is None:
        seed = (cores * neurons_per_core * messages_per_neuron *
                spikes_per_message * spike_percentage) % 2**31
    rng = np.random.default_rng(seed)
    net = sf.Network()
    neurons = cores * neurons_per_core

    population = net.create_neuron_group(
        "pop", neurons,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(64),
                "reset": Attribute(0),
                "force_update": Attribute(True),
            }
        ),
    )

    firing = np.flatnonzero(
        rng.random(neurons) < (spike_percentage / 100.0)
    )
    # per firing neuron: messages_per_neuron distinct dest cores, then
    # spikes_per_message distinct neurons within each dest core
    src_list = []
    dest_list = []
    for n in firing:
        dest_cores = rng.choice(cores, size=messages_per_neuron,
                                replace=False)
        for c in dest_cores:
            dests = c * neurons_per_core + rng.choice(
                neurons_per_core, size=spikes_per_message, replace=False
            )
            src_list.append(np.full(spikes_per_message, n))
            dest_list.append(dests)
    if src_list:
        src = np.concatenate(src_list)
        dst = np.concatenate(dest_list)
        pairs = list(zip(src.tolist(), dst.tolist()))
        population.connect_neurons_sparse(
            population,
            {"weight": [Attribute(128)] * len(pairs)},
            pairs,
        )
        for n in firing:
            population[int(n)].set_attributes(
                sf.NeuronConfiguration(
                    model_attributes={"bias": Attribute(128)}
                )
            )

    chip_cores = arch.cores()
    for n, neuron in enumerate(population):
        neuron.map_to_core(chip_cores[n // neurons_per_core])
    return net, len(src_list) * spikes_per_message if src_list else 0


EXPERIMENTS = {
    "tiny": [
        # (cores, neurons/core, msgs/neuron, spikes/msg, spike %)
        (16, 64, 4, 4, 50),
        (32, 128, 8, 8, 50),
    ],
    "full": [
        (128, 256, 4, 8, 25),
        (128, 256, 8, 8, 50),
        (128, 512, 8, 16, 50),
        (128, 1024, 16, 16, 50),
    ],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--experiment", choices=EXPERIMENTS, default="tiny")
    args = ap.parse_args()

    arch_path = REF_ARCH
    print("config,edges,energy,latency,ts_per_s")
    for cfg in EXPERIMENTS[args.experiment]:
        cores, npc, mpn, spm, pct = cfg
        arch = sf.load_arch(arch_path)
        net, edges = create_random_network(arch, cores, npc, mpn, spm, pct)
        chip = sf.SpikingChip(arch)
        chip.load(net)
        chip.sim(args.timesteps, timing_model="detailed", heartbeat=0,
                 chunk=args.timesteps)  # warm/compile
        t0 = time.perf_counter()
        r = chip.sim(args.timesteps, timing_model="detailed", heartbeat=0,
                     chunk=args.timesteps)
        wall = time.perf_counter() - t0
        print(
            f"c{cores}_n{npc}_m{mpn}_s{spm}_p{pct},{edges},"
            f"{r['energy']['total']:.4e},{r['sim_time']:.4e},"
            f"{args.timesteps / wall:.0f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
