"""On-TPU correctness lane: verify the BENCHMARKED path against goldens.

The repo's parity tests force CPU + float64 for bit-exactness against the
reference binary; the throughput numbers, however, come from the float32
compiled path on a real TPU. This script closes that gap: it runs the
same compiled float32 path the benchmarks use (fused roll-up, conv
delivery, on-device detailed sweep) on the acceptance configs and diffs
spike rasters byte-for-byte against the committed reference-binary
goldens (tests/golden_ref/), with counters exact and energies/sim_time
within float32 tolerance. (Reference analog: its CI benchmarks the same
binary it tests.)

Rasters can match exactly in float32 because the dynamics were designed
for it: LIF quantization keeps potentials on a 1/64 grid, stochastic
draws replay bit-exact integer RNG streams, and thresholds compare
against exactly-representable values.

Run on the TPU host:  python scripts/tpu_parity.py [--out TPU_PARITY.json]
A driver/CI wrapper also lives in tests/test_tpu_parity.py (skipped off-TPU).
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden_ref"
REF = Path("/root/reference")

CONFIGS = [
    # name, arch, snn, netlist, steps, golden dir, golden steps
    ("cfg1", "arch/example_chip.yaml", "snn/example_snn.yaml", False, 100,
     "cfg1_detailed", 100),
    ("cfg2_conv", "arch/loihi.yaml", "snn/conv.yaml", False, 100,
     "cfg2_conv", 100),
    ("cfg_stochastic", "FIXTURES:fixtures/arch_stoch.yaml",
     "FIXTURES:fixtures/snn_stoch.yaml", False, 100, "cfg_stochastic",
     100),
    ("dvs100", "arch/loihi.yaml", "snn/dvs.yaml", False, 100,
     "cfg3_dvs", 1000),
]


def golden_spikes(golden_dir: Path, steps: int, golden_steps: int) -> str:
    gz = golden_dir / "spikes.csv.gz"
    text = (
        gzip.decompress(gz.read_bytes()).decode()
        if gz.exists()
        else (golden_dir / "spikes.csv").read_text()
    )
    if steps == golden_steps:
        return text
    lines = text.splitlines(keepends=True)
    kept = [lines[0]]
    for line in lines[1:]:
        if int(line.rsplit(",", 1)[1]) <= steps:
            kept.append(line)
    return "".join(kept)


def run_one(name, arch_rel, snn_rel, netlist, steps, golden_name,
            golden_steps, tmp: Path) -> dict:
    import sanafe_tpu as sf

    def resolve(rel):
        if rel.startswith("FIXTURES:"):
            return GOLDEN / rel.split(":", 1)[1]
        return REF / rel

    prev = os.getcwd()
    # cwd-relative noise files resolve against the fixtures dir (matching
    # how the goldens were produced)
    os.chdir(GOLDEN / "fixtures" if arch_rel.startswith("FIXTURES:") else REF)
    try:
        arch = sf.load_arch(resolve(arch_rel))
        net = sf.load_net(resolve(snn_rel), arch, netlist)
        chip = sf.SpikingChip(arch)
        chip.load(net)
        out = tmp / name
        out.mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        result = chip.sim(
            steps,
            timing_model="detailed",
            spike_trace=out / "spikes.csv",
            heartbeat=0,
            device_sweep=True,
        )
        wall = time.perf_counter() - t0
        chip.close()
    finally:
        os.chdir(prev)

    mine = (out / "spikes.csv").read_text()
    golden = golden_spikes(GOLDEN / golden_name, steps, golden_steps)
    raster_ok = mine == golden
    entry = {
        "config": name,
        "steps": steps,
        "raster_byte_identical": raster_ok,
        "spike_rows": mine.count("\n") - 1,
        "wall_s": round(wall, 3),
        "counters": {
            "spikes": result["spikes"],
            "packets_sent": result["packets_sent"],
            "neurons_fired": result["neurons_fired"],
            "neurons_updated": result["neurons_updated"],
        },
        "energy_total": result["energy"]["total"],
        "sim_time": result["sim_time"],
    }
    # counters/energies vs the golden run_summary (f32 tolerance)
    summary = (GOLDEN / golden_name / "run_summary.yaml").read_text()
    ref_vals = {}
    for line in summary.splitlines():
        line = line.strip()
        for key in ("total_spikes", "total_neurons_fired", "sim_time"):
            if line.startswith(key + ":"):
                ref_vals[key] = float(line.split(":")[1])
        if line.startswith("total:"):
            ref_vals["energy_total"] = float(line.split(":")[1])
    if steps == golden_steps and ref_vals:
        entry["counters_match"] = (
            result["spikes"] == int(ref_vals.get("total_spikes", -1))
            and result["neurons_fired"]
            == int(ref_vals.get("total_neurons_fired", -1))
        )
        ref_e = ref_vals.get("energy_total")
        if ref_e:
            entry["energy_rel_err"] = abs(
                result["energy"]["total"] - ref_e
            ) / abs(ref_e)
        ref_t = ref_vals.get("sim_time")
        if ref_t:
            entry["sim_time_rel_err"] = abs(
                result["sim_time"] - ref_t
            ) / abs(ref_t)
    return entry


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=str(REPO / "TPU_PARITY.json"))
    parser.add_argument("--configs", default=None,
                        help="comma-separated subset of config names")
    parser.add_argument("--allow-cpu", action="store_true",
                        help="run even when the backend is not a TPU")
    args = parser.parse_args(argv)

    import jax

    backend = jax.default_backend()
    if backend != "tpu" and not args.allow_cpu:
        print(f"backend is {backend}, not tpu; use --allow-cpu to force")
        return 2

    import tempfile

    wanted = set(args.configs.split(",")) if args.configs else None
    results = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "x64": bool(jax.config.jax_enable_x64),
        "configs": [],
    }
    failures = 0
    with tempfile.TemporaryDirectory() as td:
        for cfg in CONFIGS:
            if wanted and cfg[0] not in wanted:
                continue
            print(f"running {cfg[0]} ...", flush=True)
            entry = run_one(*cfg, Path(td))
            results["configs"].append(entry)
            ok = entry["raster_byte_identical"] and (
                entry.get("sim_time_rel_err", 0.0) < 0.01
            ) and (entry.get("energy_rel_err", 0.0) < 0.01)
            print(f"  raster_identical={entry['raster_byte_identical']} "
                  f"energy_rel={entry.get('energy_rel_err')} "
                  f"sim_time_rel={entry.get('sim_time_rel_err')}",
                  flush=True)
            if not ok:
                failures += 1
    results["pass"] = failures == 0
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}; pass={results['pass']}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
