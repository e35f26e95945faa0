"""DAG chunk engine (ops/dag_chunk.py): feed-forward programs factor the
time loop by topological level — batched conv delivery over the whole
chunk + tiny per-level membrane scans — and must be bit-identical to the
generic per-step scan (reference semantics: src/chip.cpp:656-708, spike
sent at t consumed at t+1).

The engine only engages on the float32 fused-rollup + structured-conv
path (the benchmarked TPU configuration; reference snn/dvs.yaml is the
production workload), so these tests flip x64 off around the runs, same
as tests/test_batch.py. conv.yaml can't serve as the fixture — its
dendrite delays reject build_conv_delivery — so the fixture net mirrors
the DVS topology in miniature: bias-driven 4x4 input plane, conv2d
hidden layer, dense head, plus a level-skipping sparse edge (leftover
block path).
"""

import gzip
import os
import tempfile
from pathlib import Path

import jax
import numpy as np
import pytest

import sanafe_tpu as sf
from sanafe_tpu.attributes import Attribute
from sanafe_tpu.ops.dag_chunk import plan_dag

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference fixtures not present"
)


@pytest.fixture(autouse=True)
def _small_bulk_threshold():
    # the structured-conv path keys off the bulk hyperedge record, which
    # ordinarily engages at BULK_EDGE_THRESHOLD edges; shrink it so the
    # miniature net takes the same code path as DVS-gesture
    import sanafe_tpu.network as network_mod

    old = network_mod.BULK_EDGE_THRESHOLD
    network_mod.BULK_EDGE_THRESHOLD = 1
    try:
        yield
    finally:
        network_mod.BULK_EDGE_THRESHOLD = old


def _build():
    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.Network()

    def cfg(threshold, bias):
        return sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(threshold),
                "bias": Attribute(bias),
                "leak_decay": Attribute(0.875),
                "reset": Attribute(0.0),
            },
            log_spikes=True,
        )

    # ~1.3k neurons: big enough that the all-dense delivery shortcut
    # (dense_delivery, ≤8 MB matrix) declines and the program takes the
    # same structured-conv + leftover-block path as DVS-gesture
    in_c, in_h, in_w = 2, 16, 16          # 512 inputs
    out_c, k = 4, 3                       # 14x14x4 = 784 hidden
    out_h = out_w = in_h - k + 1
    gin = net.create_neuron_group("in", in_c * in_h * in_w, cfg(1.0, 0.0))
    ghid = net.create_neuron_group(
        "hid", out_c * out_h * out_w, cfg(0.5, 0.0)
    )
    gout = net.create_neuron_group("out", 2, cfg(0.75, 0.0))
    # vary the input phases so levels see staggered spikes
    for i, nrn in enumerate(gin):
        nrn.set_attributes(
            model_attributes={"bias": Attribute(0.25 + (i % 4) * 0.0625)}
        )
    nk = k * k * in_c * out_c
    kernel = [((i * 11) % 9 - 4) / 16.0 for i in range(nk)]
    gin.connect_neurons_conv2d(
        ghid,
        {"weight": [Attribute(w) for w in kernel]},
        convolution=in_w,
        input_height=in_h,
        input_channels=in_c,
        kernel_width=k,
        kernel_height=k,
        kernel_count=out_c,
        stride_width=1,
        stride_height=1,
    )
    dense_w = [((i * 7 + j * 3) % 5 - 2) / 8.0
               for i in range(len(ghid.neurons)) for j in range(2)]
    ghid.connect_neurons_dense(
        gout, {"weight": [Attribute(w) for w in dense_w]}
    )
    # level-skipping sparse edge: exercises the leftover block delivery
    gin.connect_neurons_sparse(
        gout, {"weight": [Attribute(0.5), Attribute(-0.25)]},
        [(0, 0), (5, 1)],
    )
    cores = arch.cores()
    for i, nrn in enumerate(list(gin) + list(ghid) + list(gout)):
        nrn.map_to_core(cores[i % 8])
    return arch, net


def _run(dag: str, steps: int = 64, chunk: int = 16,
         timing: str = "detailed"):
    """One run with the DAG engine toggled; returns raster text, summary,
    and the compiled program."""
    os.environ["SANAFE_TPU_DAG"] = dag
    try:
        arch, net = _build()
        chip = sf.SpikingChip(arch)
        chip.load(net)
        with tempfile.TemporaryDirectory() as td:
            trace = Path(td) / "spikes.csv"
            summary = chip.sim(
                steps,
                timing_model=timing,
                heartbeat=0,
                chunk=chunk,
                spike_trace=str(trace),
            )
            raster = trace.read_text()
        prog = next(iter(chip._programs.values()))
        return raster, summary, prog
    finally:
        os.environ.pop("SANAFE_TPU_DAG", None)


@pytest.fixture()
def f32():
    jax.config.update("jax_enable_x64", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", True)


def test_dag_engages_on_feedforward_net(f32):
    """The miniature DVS-shaped net (conv2d + dense + sparse edges, 3
    topological levels) is DAG-eligible on the float32 fused-rollup path."""
    raster, _, prog = _run("1")
    assert prog.conv_delivery is not None and prog.fused_rollup
    assert prog.engine == "dag"  # surfaced as result["device_engine"]
    plan = plan_dag(prog)
    assert plan is not None
    assert len(plan.levels) == 3  # in -> hid -> out
    # the dense/sparse edges land as leftover deliveries
    assert any(lv.has_leftover for lv in plan.levels)
    assert any(lv.conv_entries for lv in plan.levels)
    assert raster.count("\n") > 16  # the chip actually spikes


def test_dag_matches_step_scan_bitexact(f32):
    """Raster and run summary are identical between the DAG body and the
    per-step scan: same update formulas, same dtype, and (since the scan
    defers its roll-up to the same batched matmul) bit-identical stats."""
    for timing in ("simple", "detailed"):
        r_dag, s_dag, prog = _run("1", timing=timing)
        r_scan, s_scan, _ = _run("0", timing=timing)
        assert plan_dag(prog) is not None  # the toggle did something
        assert r_dag == r_scan
        assert s_dag["spikes"] == s_scan["spikes"]
        assert s_dag["neurons_fired"] == s_scan["neurons_fired"]
        assert s_dag["packets_sent"] == s_scan["packets_sent"]
        assert s_dag["sim_time"] == s_scan["sim_time"]
        assert s_dag["energy"]["total"] == s_scan["energy"]["total"]


def test_dag_state_carries_across_chunks(f32):
    """Chunk boundaries: the chunk-final delivery feeds the next chunk's
    first step exactly like the scan's per-step buffer hand-off."""
    r_small, s_small, _ = _run("1", steps=60, chunk=10)
    r_big, s_big, _ = _run("1", steps=60, chunk=60)
    assert r_small == r_big
    assert s_small["sim_time"] == s_big["sim_time"]
    # energies come out of the batched [T, 2N] @ [2N, K] roll-up; XLA may
    # tile the 2N reduction differently per T, so chunk size shifts f32
    # energies by ulps (the f32 path's golden contract is 1% — PARITY.md)
    assert s_small["energy"]["total"] == pytest.approx(
        s_big["energy"]["total"], rel=1e-5
    )


@pytest.mark.slow
def test_dag_dvs_raster_parity_1000(f32, tmp_path):
    """Pin the DAG engine at production scale: DVS-gesture (acceptance
    config 3, reference snn/dvs.yaml) for the full 1000 steps on the
    float32 path must (a) actually compile to the DAG body — this is the
    engine bench.py measures on TPU — and (b) reproduce the reference
    binary's spike raster byte-for-byte (LIF potentials stay on their
    exact 1/64 grid in float32, so the f32 raster equals the x64 one).

    The x64 parity test (test_reference_parity_dvs) never exercises the
    DAG engine because plan_dag declines float64 programs; without this
    test the benchmarked configuration would be pinned only by the
    TPU-host-gated artifact run (VERDICT r4 item 8)."""
    golden = Path(__file__).parent / "golden_ref" / "cfg3_dvs" / "spikes.csv.gz"
    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    trace = tmp_path / "spikes.csv"
    chip.sim(
        1000,
        timing_model="simple",  # rasters are timing-tier independent
        heartbeat=0,
        chunk=250,
        spike_trace=str(trace),
    )
    prog = next(iter(chip._programs.values()))
    assert prog.engine == "dag"
    assert trace.read_bytes() == gzip.decompress(golden.read_bytes())


def test_dag_rejects_x64_program():
    """The float64 parity path keeps the step scan (fused_rollup is
    float32-only), so plan_dag must decline."""
    arch, net = _build()
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(4, timing_model="simple", heartbeat=0)
    prog = next(iter(chip._programs.values()))
    assert "float64" in str(prog.dtype)
    assert plan_dag(prog) is None


def test_dag_rejects_cyclic_net(f32):
    """A recurrent edge (group self-loop) must fall back to the scan."""
    arch = sf.load_arch(REF / "arch" / "example_chip.yaml")
    net = sf.Network()
    g = net.create_neuron_group(
        "loop", 4,
        sf.NeuronConfiguration(
            model_attributes={
                "threshold": Attribute(1.0), "bias": Attribute(1.0)
            }
        ),
    )
    for i in range(4):
        g.neurons[i].connect_to_neuron(
            g.neurons[(i + 1) % 4], {"weight": 0.5}
        )
    core = arch.cores()[0]
    for n in g.neurons:
        n.map_to_core(core)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chip.sim(4, timing_model="simple", heartbeat=0)
    prog = next(iter(chip._programs.values()))
    assert plan_dag(prog) is None


def test_dag_env_kill_switch(f32):
    """SANAFE_TPU_DAG=0 disables the engine even on eligible programs."""
    os.environ["SANAFE_TPU_DAG"] = "0"
    try:
        arch, net = _build()
        chip = sf.SpikingChip(arch)
        chip.load(net)
        chip.sim(4, timing_model="simple", heartbeat=0)
        prog = next(iter(chip._programs.values()))
        assert plan_dag(prog) is None
    finally:
        os.environ.pop("SANAFE_TPU_DAG", None)
