"""TrueNorth NeMo cross-validation demo (TCAD'25 experiment).

TPU-native rewrite of /root/reference/scripts/tcad2025/demo_truenorth.py:
the Izhikevich phasic-spiking and tonic-bursting behaviors from
Plagge's NeMo paper, reproduced with the TrueNorth neuron model.

The reference script drives snn/nemo/truenorth_{phasic,bursting}.net;
those netlists put log_spikes/log_v on `n` lines, which the current
reference parser (and ours, for parity) rejects — so the same networks
are built programmatically here with identical parameters
(snn/nemo/*.net; see tests/test_pallas_chunk.py for the parity note).

Usage: python scripts/tcad2025/demo_truenorth.py [outdir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute

ARCH = Path("/root/reference/arch/truenorth.yaml")

# group parameter rows from the nemo netlists (g lines)
PHASIC = [
    dict(threshold=200.0, reset=0.0, reverse_threshold=0.0,
         reverse_reset=0.0, leak_bias=0.0, reset_mode="hard",
         reverse_reset_mode="none", bias=1.0),
    dict(threshold=2.0, reset=-15.0, reverse_threshold=-10.0,
         reverse_reset=-15.0, leak_bias=-2.0, reset_mode="hard",
         reverse_reset_mode="saturate", bias=0.0),
]
PHASIC_EDGES = [(0, 1, 4.0)]

BURSTING = [
    dict(threshold=300.0, reset=0.0, reverse_threshold=0.0,
         reverse_reset=0.0, leak_bias=0.0, reset_mode="hard",
         reverse_reset_mode="none", bias=1.0),
    dict(threshold=18.0, reset=1.0, reverse_threshold=0.0,
         reverse_reset=1.0, leak_bias=-1.0, reset_mode="hard",
         reverse_reset_mode="saturate", bias=0.0),
    dict(threshold=6.0, reset=0.0, reverse_threshold=0.0,
         reverse_reset=0.0, leak_bias=0.0, reset_mode="hard",
         reverse_reset_mode="saturate", bias=0.0),
]
BURSTING_EDGES = [(0, 1, 1.0), (0, 2, 0.0), (1, 2, 1.0), (2, 1, -100.0)]


def build(arch, params, edges):
    net = sf.Network()
    groups = []
    for i, p in enumerate(params):
        p = dict(p, force_update=True)
        groups.append(net.create_neuron_group(
            str(i), 1,
            sf.NeuronConfiguration(
                model_attributes={k: Attribute(v) for k, v in p.items()},
                soma_hw_name="core_soma",
                default_synapse_hw_name="core_synapses",
                log_spikes=True,
                log_potential=True,
            ),
        ))
    for src, dst, w in edges:
        groups[src][0].connect_to_neuron(groups[dst][0],
                                         {"w": Attribute(w)})
    core = arch.cores()[0]
    for g in groups:
        g[0].map_to_core(core)
    return net


def run(name, params, edges, outdir: Path, timesteps=1200, probe="1"):
    arch = sf.load_arch(ARCH)
    net = build(arch, params, edges)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    result = chip.sim(timesteps, timing_model="simple", heartbeat=0,
                      spike_trace=True, potential_trace=True)
    potentials = np.asarray(result["potential_trace"].data)
    labels = [
        f"{g}.{o}" for g, o in chip.compiled.potential_log_labels
    ]
    col = labels.index(f"{probe}.0")
    spikes = [
        (a.group_name, a.neuron_offset, t + 1)
        for t, step in enumerate(result["spike_trace"].data)
        for a in step
    ]
    print(f"{name}: {len(spikes)} spikes; probe neuron {probe}.0 "
          f"potential range [{potentials[:, col].min():.0f}, "
          f"{potentials[:, col].max():.0f}]")
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        offset = 200
        plt.rcParams.update({"font.size": 6, "lines.markersize": 2})
        plt.figure(figsize=(3.2, 1.5))
        v = potentials[offset:, col]
        plt.plot(np.arange(len(v)), v, color="black")
        out_spikes = [t - offset for g, o, t in spikes
                      if g == probe and t > offset]
        plt.scatter(out_spikes, (v.max() + 2) * np.ones(len(out_spikes)),
                    marker="^", color="red")
        plt.xlabel("Simulation Ticks")
        plt.ylabel("Membrane Potential")
        plt.tight_layout()
        path = outdir / f"{name}.png"
        plt.savefig(path)
        plt.close()
        print(f"  wrote {path}")
    except ImportError:
        pass
    return result


def main(outdir: str = "/tmp/nemo_demo") -> int:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    run("phasic", PHASIC, PHASIC_EDGES, out)
    run("bursting", BURSTING, BURSTING_EDGES, out, probe="1")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nemo_demo"))
