"""Deep-SNN construction with the Keras-style layer helpers.

Builds an MNIST-scale conv SNN (random weights), maps it across a
Loihi-scale chip, and simulates with Poisson-encoded inputs.

Run:  python examples/layers_mnist_style.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import sanafe_tpu as sf
from sanafe_tpu.layers import Conv2D, Dense, Input2D


def main() -> None:
    rng = np.random.default_rng(0)
    net = sf.Network()
    inputs = Input2D(net, 16, 16, 1, poisson=0.2)
    conv1 = Conv2D(
        net, inputs, rng.normal(0.0, 0.4, (3, 3, 1, 8)),
        stride_width=2, stride_height=2, threshold=1.0, leak_decay=0.9,
    )
    conv2 = Conv2D(
        net, conv1, rng.normal(0.0, 0.4, (3, 3, 8, 16)),
        threshold=1.0, leak_decay=0.9,
    )
    dense = Dense(
        net, conv2, 10, rng.normal(0.0, 0.2, (len(conv2), 10)),
        threshold=1.0, log_spikes=True,
    )

    arch = sf.load_loihi()
    cores = arch.cores()
    # the input layer needs the input-model soma
    for neuron in inputs:
        neuron.set_attributes(soma_hw_name="demo_inputs")
    core_idx = 0
    for layer in (inputs, conv1, conv2, dense):
        for i, neuron in enumerate(layer):
            neuron.map_to_core(cores[core_idx + i // 1024])
        core_idx += 1 + (len(layer) - 1) // 1024

    chip = sf.SpikingChip(arch)
    chip.load(net)
    results = chip.sim(100, timing_model="detailed", spike_trace=True,
                       heartbeat=0)
    counts = {}
    for row in results["spike_trace"].data:
        for address in row:
            counts[address.neuron_offset] = (
                counts.get(address.neuron_offset, 0) + 1
            )
    print("output spike counts:", dict(sorted(counts.items())))
    print("energy:", results["energy"]["total"], "J")
    print("chip time:", results["sim_time"], "s")


if __name__ == "__main__":
    main()
