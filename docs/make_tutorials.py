#!/usr/bin/env python3
"""Generate the tutorial notebooks (tutorial/*.ipynb).

Content mirrors the reference's six-part tutorial arc
(/root/reference/tutorial/tutorial_0..5) rewritten for this framework's
API. Notebooks are generated from the cell lists below so they stay easy
to regenerate; tests/test_tutorials.py executes every code cell.
"""

from __future__ import annotations

import json
from pathlib import Path

TUTORIAL_DIR = Path(__file__).parent.parent / "tutorial"


def md(text: str) -> dict:
    return {"cell_type": "markdown", "metadata": {}, "source": text}


def code(text: str) -> dict:
    return {
        "cell_type": "code",
        "metadata": {},
        "execution_count": None,
        "outputs": [],
        "source": text,
    }


def notebook(cells: list[dict]) -> dict:
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {
                "display_name": "Python 3",
                "language": "python",
                "name": "python3",
            },
            "language_info": {"name": "python", "version": "3.10"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


ARCH_YAML = '''\
architecture:
  name: tutorial_chip
  attributes: {link_buffer_size: 4, width: 2, height: 1}
  tile:
    - name: tutorial_tile[0..1]
      attributes:
        energy_north_hop: 2.0e-12
        latency_north_hop: 1.4e-9
        energy_east_hop: 2.5e-12
        latency_east_hop: 1.2e-9
        energy_south_hop: 2.0e-12
        latency_south_hop: 1.5e-9
        energy_west_hop: 1.8e-12
        latency_west_hop: 2.0e-9
      core:
        - name: tutorial_core[0..1]
          attributes: {buffer_position: soma, max_neurons_supported: 64}
          axon_in:
            - name: in
              attributes: {energy_message_in: 1.0e-12, latency_message_in: 1.0e-9}
          synapse:
            - name: syn
              attributes:
                model: current_based
                energy_process_spike: 20.0e-12
                latency_process_spike: 3.0e-9
          dendrite:
            - name: den
              attributes: {model: accumulator, energy_update: 0.0, latency_update: 0.0}
          soma:
            - name: lif
              attributes:
                model: leaky_integrate_fire
                energy_access_neuron: 2.0e-12
                latency_access_neuron: 1.0e-9
                energy_update_neuron: 5.0e-12
                latency_update_neuron: 2.0e-9
                energy_spike_out: 20.0e-12
                latency_spike_out: 10.0e-9
            - name: stimulus
              attributes:
                model: input
                energy_access_neuron: 0.0
                latency_access_neuron: 0.0
                energy_update_neuron: 0.0
                latency_update_neuron: 0.0
                energy_spike_out: 0.0
                latency_spike_out: 0.0
          axon_out:
            - name: out
              attributes: {energy_message_out: 50.0e-12, latency_message_out: 5.0e-9}
'''

SNN_YAML = '''\
network:
  name: tutorial_snn
  groups:
    - name: inputs
      attributes: [soma_hw_name: stimulus, log_spikes: true]
      neurons:
        - 0..1: [spikes: [1, 0, 1, 1]]
    - name: layer
      attributes: [threshold: 1.5, leak_decay: 0.8, log_potential: true]
      neurons:
        - 0..3: []
  edges:
    - inputs -> layer: [type: dense, weight: [1.0, 0.4, 0.0, 0.9,
                                              0.3, 1.2, 0.8, 0.0]]
mappings:
  - inputs: [core: 0.0]
  - layer.0..1: [core: 0.1]
  - layer.2..3: [core: 1.0]
'''

WRITE_FILES = f'''\
from pathlib import Path

ARCH_YAML = """{ARCH_YAML}"""
SNN_YAML = """{SNN_YAML}"""
Path("tutorial_arch.yaml").write_text(ARCH_YAML)
Path("tutorial_snn.yaml").write_text(SNN_YAML)
'''


def tutorial_0() -> dict:
    return notebook([
        md(
            "# sanafe_tpu Tutorial 0 — Introduction #\n\n"
            "`sanafe_tpu` is a TPU-native rebuild of SANA-FE (Simulating "
            "Advanced Neuromorphic Architectures for Fast Exploration): "
            "the per-timestep hardware simulation runs as one JAX/XLA "
            "program on accelerator, while the NoC timing sweep and all "
            "file I/O run in a native host runtime. Its description "
            "formats, Python API, and trace outputs match the SANA-FE "
            "reference simulator — bit-for-bit on the acceptance "
            "workloads (see `tests/test_reference_parity.py`).\n\n"
            "This tutorial series mirrors the reference's six parts:\n"
            "0. introduction (this notebook)\n"
            "1. architecture description files\n"
            "2. SNN description files\n"
            "3. the Python API\n"
            "4. outputs and traces\n"
            "5. the DVS-gesture case study\n\n"
            "Install with `pip install -e .` from the repository root "
            "(provides the `sim` command-line tool and the `sanafe_tpu` "
            "package)."
        ),
        code(
            "import sanafe_tpu as sf\n"
            "arch, net = sf.load_example()\n"
            "chip = sf.SpikingChip(arch)\n"
            "chip.load(net)\n"
            "results = chip.sim(100, timing_model='detailed')\n"
            "print('fired:', results['neurons_fired'])\n"
            "print('total energy (J):', results['energy']['total'])\n"
            "print('simulated time (s):', results['sim_time'])"
        ),
        md(
            "The returned dictionary matches the reference's "
            "`RunData` layout: counters, a four-way energy split "
            "(synapse / dendrite / soma / network), and the simulated "
            "time under the chosen timing model (`simple`, `detailed`, "
            "or the cycle-accurate `cycle` tier)."
        ),
        code(
            "for key, value in results['energy'].items():\n"
            "    print(f'{key:>9}: {value:.3e} J')"
        ),
    ])


def tutorial_1() -> dict:
    return notebook([
        md(
            "# Tutorial 1 — Architecture Description Files #\n\n"
            "An architecture YAML describes the simulated chip: a "
            "network-on-chip of tiles, each with cores, each core a "
            "pipeline of axon-in → synapse → dendrite → soma → axon-out "
            "units with energy/latency costs. Ranges (`name[0..N]`) "
            "expand into many identical tiles/cores/units."
        ),
        code(WRITE_FILES),
        code(
            "import sanafe_tpu as sf\n"
            "arch = sf.load_arch('tutorial_arch.yaml')\n"
            "print('tiles:', len(arch.tiles))\n"
            "print('cores:', arch.core_count)\n"
            "core = arch.cores()[0]\n"
            "print('units in core 0:',\n"
            "      [unit.name for unit in core.pipeline_hw])"
        ),
        md(
            "Every unit picks a hardware model (`model:`), either "
            "built-in (`leaky_integrate_fire`, `truenorth`, `input`, "
            "`current_based`, `accumulator`, `accumulator_with_delay`, "
            "`taps`) or a plugin registered from Python. "
            "`sanafe_tpu.models.get_model` shows a model's attribute "
            "schema."
        ),
        code(
            "from sanafe_tpu.models import get_model\n"
            "spec = get_model('leaky_integrate_fire')\n"
            "for attr, doc in sorted(spec.attributes.items())[:6]:\n"
            "    print(f'{attr}: {doc}')"
        ),
    ])


def tutorial_2() -> dict:
    return notebook([
        md(
            "# Tutorial 2 — SNN Description Files #\n\n"
            "An SNN YAML has a `network` section (neuron `groups` and "
            "`edges`) plus a `mappings` section placing neurons onto "
            "cores. Group-to-group hyperedges (`type: dense / sparse / "
            "conv2d`) expand into per-neuron connections. The legacy "
            "netlist format (`.net`, flags `-n` / "
            "`use_netlist_format=True`) is also supported."
        ),
        code(WRITE_FILES),
        code(
            "import sanafe_tpu as sf\n"
            "arch = sf.load_arch('tutorial_arch.yaml')\n"
            "net = sf.load_net('tutorial_snn.yaml', arch)\n"
            "for name, group in net.groups.items():\n"
            "    print(name, len(group.neurons), 'neurons')\n"
            "edges = sum(len(n.edges_out) for g in net.groups.values()\n"
            "            for n in g.neurons)\n"
            "print('edges:', edges)"
        ),
        code(
            "chip = sf.SpikingChip(arch)\n"
            "chip.load(net)\n"
            "results = chip.sim(4, timing_model='detailed',\n"
            "                   spike_trace=True)\n"
            "for step, spikes in enumerate(results['spike_trace'].data, 1):\n"
            "    print(f'step {step}:', [str(s) for s in spikes])"
        ),
        md(
            "Networks round-trip: `net.save(path)` writes YAML (or the "
            "netlist format), and `scripts/net_to_yaml.py` converts "
            "legacy files."
        ),
    ])


def tutorial_3() -> dict:
    return notebook([
        md(
            "# Tutorial 3 — the Python API #\n\n"
            "Everything in the YAML formats can be built "
            "programmatically: `Architecture` + `create_tile` / "
            "`create_core` / unit constructors, and `Network` + "
            "`create_neuron_group` / `connect_neurons_dense`."
        ),
        code(
            "import sanafe_tpu as sf\n"
            "from sanafe_tpu.arch import (\n"
            "    AxonInPowerMetrics, AxonOutPowerMetrics,\n"
            "    CorePipelineConfiguration, ModelInfo,\n"
            "    NetworkOnChipConfiguration, TilePowerMetrics)\n"
            "from sanafe_tpu.attributes import Attribute\n"
            "from sanafe_tpu.network import NeuronConfiguration\n\n"
            "noc = NetworkOnChipConfiguration(width_in_tiles=1,\n"
            "                                 height_in_tiles=1)\n"
            "arch = sf.Architecture('api_chip', noc)\n"
            "tile = arch.create_tile('tile0', TilePowerMetrics())\n"
            "core = arch.create_core('core0', tile.id,\n"
            "    CorePipelineConfiguration(max_neurons_supported=32))\n"
            "core.create_axon_in('in', AxonInPowerMetrics(1e-12, 1e-9))\n"
            "syn = core.create_hardware_unit('syn', ModelInfo(\n"
            "    'current_based',\n"
            "    {'energy_process_spike': Attribute(1e-12),\n"
            "     'latency_process_spike': Attribute(1e-9)}))\n"
            "syn.implements_synapse = True\n"
            "den = core.create_hardware_unit('den', ModelInfo('accumulator'))\n"
            "den.implements_dendrite = True\n"
            "soma = core.create_hardware_unit('soma', ModelInfo(\n"
            "    'leaky_integrate_fire',\n"
            "    {'energy_access_neuron': Attribute(1e-13),\n"
            "     'latency_access_neuron': Attribute(1e-10),\n"
            "     'energy_update_neuron': Attribute(1e-12),\n"
            "     'latency_update_neuron': Attribute(1e-9),\n"
            "     'energy_spike_out': Attribute(2e-12),\n"
            "     'latency_spike_out': Attribute(2e-9)}))\n"
            "soma.implements_soma = True\n"
            "core.create_axon_out('out', AxonOutPowerMetrics(1e-12, 1e-9))\n"
            "print('built', arch.name, 'with', arch.core_count, 'core')"
        ),
        code(
            "net = sf.Network()\n"
            "group = net.create_neuron_group('pop', 8, NeuronConfiguration(\n"
            "    model_attributes={'threshold': Attribute(1.0),\n"
            "                      'bias': Attribute(0.4)}))\n"
            "for i, neuron in enumerate(group):\n"
            "    neuron.connect_to_neuron(group.neurons[(i + 1) % 8],\n"
            "                             {'weight': Attribute(0.5)})\n"
            "    neuron.map_to_core(arch.cores()[0])\n"
            "chip = sf.SpikingChip(arch)\n"
            "chip.load(net)\n"
            "print(chip.sim(10)['neurons_fired'], 'fired over 10 steps')"
        ),
        md(
            "Between `sim()` calls, `chip.mapped_neuron_groups` exposes "
            "live neurons whose attributes can be updated in place — the "
            "simulation state is preserved across calls, and "
            "`chip.save_state()` / `chip.load_state()` checkpoint it."
        ),
        code(
            "mapped = chip.mapped_neuron_groups['pop'][0]\n"
            "mapped.set_attributes(model_attributes={'bias': 2.0})\n"
            "more = chip.sim(10)\n"
            "print('after bias bump:', more['neurons_fired'], 'fired')"
        ),
    ])


def tutorial_4() -> dict:
    return notebook([
        md(
            "# Tutorial 4 — Outputs and Traces #\n\n"
            "Five traces are available, each either streamed to a CSV "
            "file (pass a path), collected in memory (pass `True`), or "
            "off (`None`): spikes, potentials, neuron state, performance "
            "counters, and per-message NoC records. Formats match the "
            "reference's `spikes.csv` / `potentials.csv` / `perf.csv` / "
            "`messages.csv` byte-for-byte."
        ),
        code(WRITE_FILES),
        code(
            "import sanafe_tpu as sf\n"
            "arch = sf.load_arch('tutorial_arch.yaml')\n"
            "net = sf.load_net('tutorial_snn.yaml', arch)\n"
            "chip = sf.SpikingChip(arch)\n"
            "chip.load(net)\n"
            "results = chip.sim(20, timing_model='detailed',\n"
            "                   spike_trace='spikes.csv',\n"
            "                   potential_trace=True,\n"
            "                   perf_trace='perf.csv',\n"
            "                   message_trace='messages.csv')\n"
            "chip.close()\n"
            "print(open('spikes.csv').read().splitlines()[:5])"
        ),
        code(
            "# In-memory potential trace: one row per step, one column per\n"
            "# neuron with log_potential set\n"
            "rows = results['potential_trace'].data\n"
            "print('steps recorded:', len(rows))\n"
            "print('first row:', rows[0])"
        ),
        code(
            "# run_summary.yaml matches the reference's format\n"
            "print(chip.format_run_summary(results))"
        ),
        md(
            "The command-line tool writes the same outputs: "
            "`sim -o out -s -t detailed arch.yaml snn.yaml 100` "
            "(like the reference binary, `-s` enables the spike, "
            "potential, perf AND message traces together). "
            "`scripts/plot_raster.py`, `scripts/plot_messages.py`, and "
            "`scripts/message_analysis.py` visualize/summarize them, and "
            "`scripts/compare_spiketrains.py` diffs two rasters."
        ),
    ])


def tutorial_5() -> dict:
    return notebook([
        md(
            "# Tutorial 5 — DVS Gesture Case Study #\n\n"
            "The flagship acceptance workload: a 5-layer convolutional "
            "SNN (18.7k neurons, 3.5M synapses) classifying DVS camera "
            "gestures, mapped onto a simulated Loihi. This framework "
            "reproduces the reference simulator's spike raster for this "
            "workload bit-for-bit over 1000 timesteps.\n\n"
            "The trained weights, layer thresholds, and one gesture "
            "frame's input biases ship as packaged data "
            "(`dvs_challenge.npz`, via "
            "`sanafe_tpu.tutorial.get_dvs_data()`)."
        ),
        code(
            "import numpy as np\n"
            "import sanafe_tpu as sf\n"
            "import sanafe_tpu.layers\n"
            "import sanafe_tpu.tutorial\n\n"
            "arch = sf.load_loihi()\n"
            "snn = sf.Network()\n"
            "with sf.tutorial.get_dvs_data() as weight_file:\n"
            "    data = np.load(weight_file)\n"
            "    snn_attributes = {key: data[key] for key in data.files}\n"
            "thresholds = snn_attributes['thresholds']\n"
            "biases = snn_attributes['inputs']\n\n"
            "layer0 = sf.layers.Input2D(snn, 32, 32,\n"
            "                           threshold=thresholds[0])\n"
            "layer1 = sf.layers.Conv2D(snn, layer0,\n"
            "                          snn_attributes['conv1'],\n"
            "                          stride_width=2, stride_height=2,\n"
            "                          threshold=thresholds[1])\n"
            "layer2 = sf.layers.Conv2D(snn, layer1,\n"
            "                          snn_attributes['conv2'],\n"
            "                          threshold=thresholds[2])\n"
            "layer3 = sf.layers.Conv2D(snn, layer2,\n"
            "                          snn_attributes['conv3'],\n"
            "                          threshold=thresholds[3])\n"
            "layer4 = sf.layers.Conv2D(snn, layer3,\n"
            "                          snn_attributes['conv4'],\n"
            "                          threshold=thresholds[4])\n"
            "layer5 = sf.layers.Dense(snn, layer4, 11,\n"
            "                         snn_attributes['dense1'],\n"
            "                         threshold=thresholds[5])\n"
            "for neuron, bias in zip(layer0, biases):\n"
            "    neuron.set_attributes(model_attributes={'bias': bias})\n"
            "print('neurons:', sum(len(g.neurons)\n"
            "      for g in snn.groups.values()))"
        ),
        code(
            "# Map each layer evenly across a chosen number of Loihi cores\n"
            "layer_mapped_core_counts = [1, 4, 16, 16, 4, 1]\n"
            "cores = arch.cores()\n"
            "total_cores_mapped = 0\n\n"
            "def map_layer_to_cores(layer, core_count):\n"
            "    global total_cores_mapped\n"
            "    per_core = len(layer) // core_count\n"
            "    for idx in range(core_count):\n"
            "        first = idx * per_core\n"
            "        last = None if idx == core_count - 1 else first + per_core\n"
            "        for neuron in layer[first:last]:\n"
            "            neuron.map_to_core(cores[total_cores_mapped])\n"
            "        total_cores_mapped += 1\n\n"
            "for layer, count in zip(\n"
            "        [layer0, layer1, layer2, layer3, layer4, layer5],\n"
            "        layer_mapped_core_counts):\n"
            "    map_layer_to_cores(layer, count)\n"
            "print('mapped across', total_cores_mapped, 'cores')"
        ),
        code(
            "chip = sf.SpikingChip(arch)\n"
            "chip.load(snn)\n"
            "results = chip.sim(1000)\n"
            "expected_firing_neurons = 365277\n"
            "assert results['neurons_fired'] == expected_firing_neurons, (\n"
            "    results['neurons_fired'])\n"
            "energy_delay_product = (results['energy']['total']\n"
            "                        * results['sim_time'])\n"
            "print(f'Energy-Delay product: {energy_delay_product}')"
        ),
        md(
            "On a TPU the same workload runs the simulation kernel as a "
            "single compiled scan; the detailed NoC timing sweep runs "
            "concurrently on the host (the device computes chunk *k+1* "
            "while the host schedules chunk *k*). For multi-chip scaling "
            "see `sanafe_tpu.parallel`, which shards the neuron and "
            "synapse-block axes over a `jax.sharding.Mesh`."
        ),
    ])


def tutorial_6() -> dict:
    return notebook([
        md(
            "# Tutorial 6 — Design-Space Exploration #\n\n"
            "SANA-FE exists to answer questions like *\"what threshold, "
            "leak, or hardware energy budget should this chip have?\"* — "
            "questions you answer by simulating many parameterizations of "
            "the same mapped network. The reference simulator runs one "
            "configuration per process; this framework batches B parameter "
            "samples over a leading array axis (`jax.vmap`), so the "
            "connectivity — the dominant memory traffic — is read once per "
            "timestep for **all** samples, and a whole sweep runs in one "
            "device program."
        ),
        code(
            "import numpy as np\n"
            "import sanafe_tpu as sf\n\n"
            "arch, snn = sf.load_example()\n"
            "chip = sf.SpikingChip(arch)\n"
            "chip.load(snn)\n"
            "chip.compiled.groups.keys()"
        ),
        md(
            "`expand_group_values` builds a `[B, n_neurons]` override from "
            "per-group samples: here 16 candidate thresholds for one group, "
            "every other neuron keeping its compiled value. Any per-neuron "
            "parameter or hardware-cost column can be overridden the same "
            "way (`threshold`, `leak_decay`, `bias`, `soma_energy_update`, "
            "conv filters, ...)."
        ),
        code(
            "group = next(iter(chip.compiled.groups))\n"
            "candidates = np.linspace(0.5, 4.0, 16)\n"
            "overrides = sf.expand_group_values(\n"
            "    chip.compiled, 'threshold', {group: candidates})\n"
            "sweep = sf.ParameterSweep(chip, {'threshold': overrides})\n"
            "out = sweep.run(200)\n"
            "for th, spikes, energy in zip(candidates, out['spikes'],\n"
            "                              out['energy']['total']):\n"
            "    print(f'threshold {th:4.2f}: {spikes:4d} spikes, '\n"
            "          f'{energy:.3e} J')"
        ),
        md(
            "Counters are exactly what B sequential `sim()` calls produce; "
            "pick a winner and rerun it through `sim()` for detailed NoC "
            "timing and traces (the sweep uses the simple timing model)."
        ),
        code(
            "best = int(np.argmin(out['energy']['total']))\n"
            "print('lowest-energy sample:', best,\n"
            "      'threshold', candidates[best])"
        ),
        md(
            "## Scaling out ##\n\n"
            "Samples are independent, so multi-chip scale-out is a "
            "sharding annotation rather than a communication protocol: "
            "pass a `jax.sharding.Mesh` and the sample axis splits across "
            "devices (each device simulates `B / n_devices` full chips)."
        ),
        code(
            "import jax\n"
            "from jax.sharding import Mesh\n\n"
            "devices = np.array(jax.devices())\n"
            "if len(devices) > 1 and 16 % len(devices) == 0:\n"
            "    mesh = Mesh(devices, ('samples',))\n"
            "    sharded = sf.ParameterSweep(\n"
            "        chip, {'threshold': overrides}, mesh=mesh).run(200)\n"
            "    assert np.array_equal(sharded['spikes'], out['spikes'])\n"
            "    print('sharded sweep matches on', len(devices), 'devices')\n"
            "else:\n"
            "    print('single device: skipping the mesh demo')"
        ),
    ])


def main() -> None:
    TUTORIAL_DIR.mkdir(exist_ok=True)
    examples = TUTORIAL_DIR.parent / "sanafe_tpu" / "examples"
    if examples.is_dir():
        (examples / "tutorial_arch.yaml").write_text(ARCH_YAML)
        (examples / "tutorial_snn.yaml").write_text(SNN_YAML)
    notebooks = {
        "tutorial_0_intro.ipynb": tutorial_0(),
        "tutorial_1_architecture.ipynb": tutorial_1(),
        "tutorial_2_snns.ipynb": tutorial_2(),
        "tutorial_3_api.ipynb": tutorial_3(),
        "tutorial_4_traces.ipynb": tutorial_4(),
        "tutorial_5_dvs.ipynb": tutorial_5(),
        "tutorial_6_design_space.ipynb": tutorial_6(),
    }
    for name, nb in notebooks.items():
        path = TUTORIAL_DIR / name
        path.write_text(json.dumps(nb, indent=1))
        print("wrote", path)


if __name__ == "__main__":
    main()
