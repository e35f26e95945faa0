"""Headline benchmark: the north-star workload (BASELINE.json).

Primary metric: simulated timesteps/second on Loihi DVS-gesture
(arch/loihi.yaml + snn/dvs.yaml, detailed timing, spike trace on), the
acceptance workload the task's >=100x target is defined on. The baseline
denominator is the ACTUAL reference binary built offline from
/root/reference (tools/refbuild/), measured on this host single-thread:
16.07 timesteps/s detailed / 21.41 simple (marginal rate between 300- and
900-step runs, `-s` traces on; see README "Performance").

Also reported in the same JSON line (extra fields): DVS simple-timing
throughput and the reference-CI example-chip workload
(tests/ci/check_perf.rb: 100k steps / 156.49 s => ~639 ts/s).

Each workload runs in its OWN subprocess: the tunneled TPU worker this
machine uses can crash on pathological programs, and one workload's crash
must not lose the others' numbers. Each reports the best of several
repetitions (tunnel stalls on one-off fetches say nothing about simulator
throughput). If the detailed device-sweep tier fails, the workload retries
with the exact host sweep before giving up.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra": {...}}.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

# Reference-binary DVS rates measured on this host (tools/refbuild/)
DVS_DETAILED_BASELINE = 16.07  # timesteps/s, single-thread C++
DVS_SIMPLE_BASELINE = 21.41
EXAMPLE_BASELINE = 100000.0 / 156.49  # reference CI perf baseline

REF = Path("/root/reference")
# Per-workload subprocess budgets. The whole bench (preflight + 2 workers)
# must finish well inside the driver's kill timeout (~30 min observed in
# round 3), so one hung worker may not eat more than this. The combined
# DVS worker (both timing tiers, one process) gets the larger share: its
# warmup alone — tunnel handshake + ~200 MB chip upload + compiles — was
# measured at 140-300 s and once starved a 600 s budget entirely.
WORKER_TIMEOUT = float(os.environ.get("SANAFE_BENCH_TIMEOUT", "480"))
WORKER_TIMEOUT_DVS = float(os.environ.get("SANAFE_BENCH_TIMEOUT_DVS", "900"))


def bench_example(deadline: float) -> float:
    """Reference-CI workload: example_chip + example_snn, detailed.

    Round-4 driver evidence lost this number to a worker timeout
    (BENCH_r04 tail), so every expensive stage is deadline-aware and a
    RESULT:example line is printed after each completed repetition (the
    parent keeps the last one even if the worker is killed mid-run)."""
    import sanafe_tpu as sf

    arch_p = REF / "arch" / "example_chip.yaml"
    snn_p = REF / "snn" / "example_snn.yaml"
    if arch_p.exists():
        arch = sf.load_arch(arch_p)
        net = sf.load_net(snn_p, arch)
        chip = sf.SpikingChip(arch)
        chip.load(net)
    else:
        from __graft_entry__ import _build_chip

        chip = _build_chip()
    chunk = 262144
    steps = 2 * chunk
    # warm-up: compiles the chunk program and absorbs the tunnel's
    # first-fetch stall (up to ~5 min observed)
    chip.sim(chunk, timing_model="detailed", heartbeat=0, chunk=chunk)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        chip.sim(steps, timing_model="detailed", heartbeat=0, chunk=chunk)
        elapsed = time.perf_counter() - t0
        best = max(best, steps / elapsed)
        print(f"RESULT:example {best:.6f} {best:.6f}", flush=True)
        if time.monotonic() + 2 * elapsed > deadline:
            break
    return best


def bench_dvs(
    device_sweep: bool,
    deadline: float,
    reps: int = 3,
    steps: int = 1000,
) -> None:
    """North-star workload: DVS-gesture with spike trace written to disk
    (the acceptance config is 1000 steps + spike traces). Rasters are
    unaffected by the timing tier (tests/test_device_sweep.py) and
    byte-identical to the reference (tests/test_reference_parity.py).

    BOTH timing tiers run in this one process: the per-process fixed cost
    over the tunneled device (client handshake ~60-140 s + the ~200 MB
    chip upload) dominated separate workers and starved them of their
    budget (BENCH_r05 precursor run lost the detailed tier entirely to a
    slow-tunnel warmup). Tier results stream as
    ``RESULT:dvs_<tier> best worst`` lines after every repetition, so a
    mid-run kill keeps everything finished so far — detailed (the
    headline) runs first."""
    import sanafe_tpu as sf

    arch = sf.load_arch(REF / "arch" / "loihi.yaml")
    net = sf.load_net(REF / "snn" / "dvs.yaml", arch)
    chip = sf.SpikingChip(arch)
    chip.load(net)
    chunk = int(os.environ.get("SANAFE_BENCH_DVS_CHUNK", "500"))
    with tempfile.TemporaryDirectory() as td:
        for timing_model in ("detailed", "simple"):
            kwargs = dict(
                timing_model=timing_model,
                heartbeat=0,
                chunk=chunk,
                device_sweep=device_sweep and timing_model == "detailed",
            )
            # warmup: compiles every chunk length of the measured schedule
            # (head taper + full + tail); the first tier's warmup also
            # absorbs the one-time handshake/upload/first-fetch stall
            rv = chip.sim(
                steps, spike_trace=str(Path(td) / "warm.csv"), **kwargs
            )
            # name the device engine measured (dag batched-time vs step
            # scan, ops/dag_chunk.py) so perf records are attributable
            print(f"EXTRA dvs_{timing_model}_device_engine="
                  f"{rv.get('device_engine')}", flush=True)
            rates = []
            for i in range(reps):
                trace = str(Path(td) / f"{timing_model}{i}.csv")
                t0 = time.perf_counter()
                chip.sim(steps, spike_trace=trace, **kwargs)
                elapsed = time.perf_counter() - t0
                rates.append(steps / elapsed)
                print(
                    f"RESULT:dvs_{timing_model} {max(rates):.6f} "
                    f"{min(rates):.6f}", flush=True
                )
                if time.monotonic() + 2 * elapsed > deadline:
                    break


def _worker(argv: list[str]) -> None:
    """Subprocess entry: run one workload group, streaming
    ``RESULT:<tag> best worst`` lines after every repetition (best and
    worst across reps — the tunnel's run-to-run variance is +-20%, and
    'robustly above target' means the WORST run clears it). A soft
    internal deadline at 90% of the parent's budget stops cleanly BEFORE
    the hard kill, so a slow tunnel day degrades to fewer reps instead of
    a lost workload."""
    try:
        # The tunnel proxy process contends for the single host CPU while
        # it streams a chunk's wire buffer; at equal priority it steals
        # ~15-20% of the host sweep (measured). Transfers are network-bound,
        # so prioritizing the simulator does not slow them.
        os.nice(-10)
    except (OSError, AttributeError):
        pass
    budget = WORKER_TIMEOUT_DVS if argv[0] == "dvs" else WORKER_TIMEOUT
    deadline = time.monotonic() + 0.9 * budget
    which = argv[0]
    if which == "example":
        bench_example(deadline)
    else:
        bench_dvs(device_sweep=argv[1] == "1", deadline=deadline)


def _parse_results(stdout) -> dict[str, tuple[float, float]]:
    """Latest ``RESULT:<tag> best worst`` per tag from a worker's stdout
    (bytes or str). Workers print cumulative best/worst, so the last line
    per tag carries that workload's final answer."""
    out: dict[str, tuple[float, float]] = {}
    if stdout is None:
        return out
    if isinstance(stdout, bytes):
        stdout = stdout.decode(errors="replace")
    for line in stdout.splitlines():
        if line.startswith("RESULT:"):
            parts = line.split()
            tag = parts[0][len("RESULT:"):]
            best = float(parts[1])
            worst = float(parts[2]) if len(parts) > 2 else best
            out[tag] = (best, worst)
    return out


def _merge_extras(stdout) -> None:
    """Fold workers' `EXTRA key=value` lines into the bench extra dict."""
    if stdout is None:
        return
    if isinstance(stdout, bytes):
        stdout = stdout.decode(errors="replace")
    for line in stdout.splitlines():
        if line.startswith("EXTRA ") and "=" in line:
            key, value = line[len("EXTRA "):].split("=", 1)
            _STATE["extra"][key.strip()] = value.strip()


def _run_worker(args: list[str]) -> dict[str, tuple[float, float]]:
    """Run one workload subprocess; {} on crash/timeout with no partial
    result. Workers print a RESULT:<tag> line after every completed
    repetition, so even a hard timeout keeps the reps that finished
    (round-4 lost the example workload to exactly this)."""
    budget = WORKER_TIMEOUT_DVS if args[0] == "dvs" else WORKER_TIMEOUT
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_worker", *args],
            capture_output=True,
            text=True,
            timeout=budget,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        stdout, stderr, rc = out.stdout, out.stderr, out.returncode
    except subprocess.TimeoutExpired as exc:
        _merge_extras(exc.stdout)
        got = _parse_results(exc.stdout)
        print(
            f"bench worker {args} timed out"
            + ("; keeping partial results" if got else ""),
            file=sys.stderr,
        )
        return got
    _merge_extras(stdout)
    got = _parse_results(stdout)
    if not got:
        sys.stderr.write((stderr or "")[-2000:])
        print(f"bench worker {args} failed (rc={rc})", file=sys.stderr)
    return got


def _device_preflight(budget_s: float) -> bool:
    """The tunneled TPU can be down for a while; probe it in a subprocess
    (a dead tunnel hangs the first jax op indefinitely) and retry within
    ``budget_s``. The budget MUST stay well inside any caller/driver
    timeout: round 3's only perf artifact was lost because the 1800 s
    default outlived the driver's ~6 min kill (BENCH_r03.json rc=124),
    so the default is now 180 s — fail fast with an error JSON instead
    of dying silently."""
    deadline = time.monotonic() + budget_s
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, text=True,
                # healthy-but-cold first contact can take >120 s over the
                # tunnel (observed 2026-08-19); give one probe up to 150 s
                # while still finishing inside the 180 s default budget
                timeout=max(30.0, min(150.0, remaining)),
            )
            if probe.returncode == 0 and "ok" in probe.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print("bench: device unreachable, retrying...", file=sys.stderr)
        time.sleep(min(20.0, max(1.0, deadline - time.monotonic())))


# Mutable bench state so a SIGTERM/SIGINT (e.g. the driver's `timeout`)
# still flushes ONE JSON line with whatever finished. Workloads stream
# into _STATE as they complete; _emit() derives the headline from it.
_STATE: dict = {"extra": {}, "emitted": False}
_PARTIAL_PATH = Path(__file__).resolve().parent / "BENCH_PARTIAL.json"


def _emit(error: str | None = None) -> None:
    """Print the single headline JSON line from current _STATE (idempotent)."""
    if _STATE["emitted"]:
        return
    _STATE["emitted"] = True
    extra = _STATE["extra"]
    if error:
        extra = dict(extra, error=error)
    detailed = _STATE.get("detailed") or (0.0, 0.0)
    print(
        json.dumps(
            {
                "metric": _STATE.get(
                    "metric", "dvs_gesture_detailed_timesteps_per_second"
                ),
                "value": _STATE.get("value", round(detailed[0], 2)),
                "unit": "timesteps/s",
                "vs_baseline": _STATE.get(
                    "vs_baseline",
                    round(detailed[0] / DVS_DETAILED_BASELINE, 3),
                ),
                "extra": extra,
            }
        ),
        flush=True,
    )


def _checkpoint() -> None:
    """Persist per-workload results incrementally so a later crash or kill
    cannot erase earlier numbers (VERDICT r3 'weak' #2)."""
    try:
        _PARTIAL_PATH.write_text(json.dumps(_STATE["extra"], indent=1) + "\n")
    except OSError:
        pass


def _flush_and_exit(signum, frame):  # pragma: no cover - signal path
    _checkpoint()
    _emit(error=f"killed by signal {signum} mid-bench; partial results")
    sys.stdout.flush()
    os._exit(0)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "_worker":
        _worker(sys.argv[2:])
        return
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    have_dvs = (REF / "snn" / "dvs.yaml").exists()
    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGINT, _flush_and_exit)
    extra = _STATE["extra"]

    budget = float(os.environ.get("SANAFE_BENCH_PREFLIGHT_S", "180"))
    if not _device_preflight(budget):
        _STATE["value"] = 0.0
        _STATE["vs_baseline"] = 0.0
        _emit(error="device unreachable (tunnel down)")
        return

    # DVS first: it is the headline metric, so if a later workload (or the
    # driver's timeout) kills the run, the number that matters is already in
    # the partial artifact and the signal-flushed JSON line.
    if have_dvs and which in ("all", "dvs"):
        # The exact host sweep is the fast detailed tier at DVS scale (the
        # on-device merge kernel is event-serial and pays per-iteration VPU
        # overhead; see ops/merge_sweep.py). Opt into benching the device
        # tier with SANAFE_BENCH_DEVICE_SWEEP=1. One worker process runs
        # BOTH timing tiers (detailed first) on one loaded chip.
        use_dev = os.environ.get("SANAFE_BENCH_DEVICE_SWEEP", "0") == "1"
        got = _run_worker(["dvs", "1" if use_dev else "0"])
        if use_dev and "dvs_detailed" not in got:
            got = _run_worker(["dvs", "0"]) or got
            use_dev = False
        detailed = got.get("dvs_detailed", (0.0, 0.0))
        if "dvs_detailed" in got:
            extra["dvs_detailed_tier"] = (
                "device_sweep" if use_dev else "host_sweep"
            )
        _STATE["detailed"] = detailed
        extra["dvs_detailed_ts_per_s"] = round(detailed[0], 2)
        extra["dvs_detailed_vs_baseline"] = round(
            detailed[0] / DVS_DETAILED_BASELINE, 3
        )
        extra["dvs_detailed_worst_ts_per_s"] = round(detailed[1], 2)
        extra["dvs_detailed_worst_vs_baseline"] = round(
            detailed[1] / DVS_DETAILED_BASELINE, 3
        )
        simple = got.get("dvs_simple")
        if simple:
            extra["dvs_simple_ts_per_s"] = round(simple[0], 2)
            extra["dvs_simple_worst_ts_per_s"] = round(simple[1], 2)
            extra["dvs_simple_vs_baseline"] = round(
                simple[0] / DVS_SIMPLE_BASELINE, 3
            )
            extra["dvs_simple_worst_vs_baseline"] = round(
                simple[1] / DVS_SIMPLE_BASELINE, 3
            )
        _checkpoint()

    if which in ("all", "example") or not have_dvs:
        example = _run_worker(["example"]).get("example")
        if example:
            extra["example_detailed_ts_per_s"] = round(example[0], 2)
            extra["example_vs_baseline"] = round(
                example[0] / EXAMPLE_BASELINE, 3
            )
        _checkpoint()

    if not have_dvs:
        # no reference fixtures: fall back to the example metric headline
        _STATE["metric"] = "timesteps_per_second_detailed_example"
        _STATE["value"] = extra.get("example_detailed_ts_per_s", 0.0)
        _STATE["vs_baseline"] = extra.get("example_vs_baseline", 0.0)
    _emit()


if __name__ == "__main__":
    main()
