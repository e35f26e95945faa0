"""Sparse delta mask wire (ops/step.py make_scan) + chunk-schedule tests.

The delta wire ships the fired/updated bit planes as a nonzero-byte
presence bitmap plus compacted byte values (fired raw, updated as
chunk-local XOR deltas); the host rebuilds the exact packed planes, so
the detailed host sweep, spike rows, and counters must be byte-identical
to the dense-wire path. The wire only engages on float32 programs (the
x64 parity path runs wire-less), so the end-to-end check runs in a
float32 subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

from sanafe_tpu.chip import _plan_chunks

REPO = Path(__file__).resolve().parent.parent


def test_plan_chunks_tapers_head_and_tail():
    plan = _plan_chunks(1000, 500, 128)
    assert plan == [128, 500, 244, 128]
    assert sum(plan) == 1000


def test_plan_chunks_small_totals():
    assert _plan_chunks(128, 500, 128) == [128]
    assert _plan_chunks(200, 500, 128) == [128, 72]
    assert _plan_chunks(64, 500, 128) == [64]
    assert sum(_plan_chunks(997, 250, 128)) == 997


def test_plan_chunks_no_taper():
    assert _plan_chunks(1000, 400, 0) == [400, 400, 200]


_SUBPROC = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SANAFE_PALLAS_CHUNK"] = "0"  # force the scan path
import json, tempfile, pathlib, sys
import numpy as np
sys.path.insert(0, {repo!r})
from tests.helpers import build_arch
import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute

def build_chip():
    arch = build_arch(
        n_tiles=2, cores_per_tile=2, max_neurons=32,
        soma_costs={{"energy_update_neuron": 1e-12,
                    "latency_update_neuron": 2e-9,
                    "energy_spike_out": 3e-12,
                    "latency_spike_out": 4e-9}},
        synapse_costs={{"energy_process_spike": 1e-12,
                       "latency_process_spike": 5e-10}},
    )
    net = sf.Network()
    rng = np.random.default_rng(3)
    cores = arch.cores()
    groups = []
    for layer in range(4):
        g = net.create_neuron_group(
            "layer%d" % layer, 30,
            sf.NeuronConfiguration(
                model_attributes={{
                    "threshold": Attribute(1.0),
                    "leak_decay": Attribute(0.9),
                    "bias": Attribute(0.4 if layer == 0 else 0.0),
                    "reset": Attribute(0.0),
                }},
                log_spikes=True,
            ),
        )
        groups.append(g)
    for src, dst in zip(groups[:-1], groups[1:]):
        w = rng.normal(0.0, 0.5, (len(src), len(dst))).ravel()
        src.connect_neurons_dense(
            dst, {{"weight": [Attribute(float(x)) for x in w]}}
        )
    for layer, g in enumerate(groups):
        for i, neuron in enumerate(g):
            neuron.map_to_core(cores[(layer + i) % len(cores)])
    chip = sf.SpikingChip(arch)
    chip.load(net)
    return chip

def run(mask_wire, cap=None):
    os.environ["SANAFE_TPU_MASK_WIRE"] = mask_wire
    if cap is None:
        os.environ.pop("SANAFE_TPU_MASK_WIRE_CAP", None)
    else:
        os.environ["SANAFE_TPU_MASK_WIRE_CAP"] = str(cap)
    chip = build_chip()
    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "spikes.csv"
        r = chip.sim(130, timing_model="detailed", chunk=50, heartbeat=0,
                     spike_trace=str(p))
        blob = p.read_text()
    return {{"sim_time": r["sim_time"], "spikes": r["spikes"],
            "fired": r["neurons_fired"], "energy": r["energy"],
            "csv": blob}}

dense = run("0")
sparse = run("1")
tiny_cap = run("1", cap=2)  # forces the per-chunk overflow fallback
assert sparse == dense, "delta mask wire diverged from dense wire"
assert tiny_cap == dense, "overflow fallback diverged from dense wire"
assert dense["csv"].count("\n") > 10, "test produced too few spikes"
print(json.dumps({{"ok": True, "rows": dense["csv"].count("\n")}}))
"""


def test_mask_wire_end_to_end_parity_float32():
    """Delta wire on/off and the capacity-overflow fallback must produce
    identical sim dicts and byte-identical spikes.csv on a float32 chip
    with nonzero latencies (the sweep consumes the reconstructed planes,
    so an exact sim_time implies exact fired/updated reconstruction)."""
    script = _SUBPROC.format(repo=str(REPO))
    from helpers import cpu_subprocess_env

    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900,
        env=cpu_subprocess_env(), cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["rows"] > 10
