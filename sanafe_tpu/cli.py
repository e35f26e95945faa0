"""Command-line entry point: ``python -m sanafe_tpu.cli`` (the reference's
standalone ``./sim`` binary; src/main.cpp:28-100, src/arg_parsing.cpp:32-110).

Flags::

    -o <dir>   output directory for trace CSVs + run_summary.yaml
    -m         record message trace (messages.csv)
    -n         parse the SNN file as legacy netlist format
    -p         record perf trace (perf.csv)
    -s         record spike trace (spikes.csv)
    -t <model> timing model: simple | detailed | cycle
    -v         record potential trace (potentials.csv)
    -x         record neuron-state trace (neurons.csv)
    -N <n>     processing threads (accepted for parity; kernel is parallel)
    -S <n>     scheduler threads (accepted for parity)

Trace wiring matches the reference binary exactly (src/main.cpp:63-67):
``-s`` enables the spike, potential, perf AND message traces together, and
``-v``/``-p``/``-m`` have no effect on their own (they are parsed, like in
the reference, but main.cpp never consults them). Set
``SANAFE_TPU_SANE_TRACES=1`` to opt into the documented per-flag behavior
instead (-s spikes only, -v potentials, -p perf, -m messages).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

from .arch import load_arch
from .chip import SpikingChip
from .network import load_net
from .yaml_arch import DescriptionParsingError


USAGE = (
    "Usage: sim [-o dir] [-mnpsvx] [-t model] [-N threads] [-S threads] "
    "<arch.yaml> <snn.yaml> <timesteps>"
)


def parse_args(argv: list[str]) -> tuple[dict, list[str]]:
    flags = {
        "output_dir": Path("."),
        "record_messages": False,
        "use_netlist_format": False,
        "record_perf": False,
        "record_spikes": False,
        "record_potentials": False,
        "record_neuron_state": False,
        "timing_model": "detailed",
        "processing_threads": 1,
        "scheduler_threads": 0,
    }
    positional: list[str] = []
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("-") or len(arg) < 2:
            positional.append(arg)
            i += 1
            continue
        flag = arg[1]
        if flag == "o":
            flags["output_dir"] = Path(argv[i + 1])
            i += 2
        elif flag == "m":
            flags["record_messages"] = True
            i += 1
        elif flag == "n":
            flags["use_netlist_format"] = True
            i += 1
        elif flag == "p":
            flags["record_perf"] = True
            i += 1
        elif flag == "s":
            flags["record_spikes"] = True
            i += 1
        elif flag == "t":
            flags["timing_model"] = argv[i + 1]
            i += 2
        elif flag == "v":
            flags["record_potentials"] = True
            i += 1
        elif flag == "x":
            flags["record_neuron_state"] = True
            i += 1
        elif flag == "N":
            flags["processing_threads"] = int(argv[i + 1])
            i += 2
        elif flag == "S":
            flags["scheduler_threads"] = int(argv[i + 1])
            i += 2
        else:
            print(f"Error: Flag {flag} not recognized.", file=sys.stderr)
            i += 1
    return flags, positional


def _probe_backend() -> str | None:
    """Resolve the default jax backend without risking a hang.

    ``jax.default_backend()`` initializes the platform; with a tunneled
    accelerator plugin whose link is down, that call never returns. When
    no accelerator plugin is installed the answer is ``cpu`` without any
    probe; otherwise a subprocess resolves the backend under a timeout.
    ``SANAFE_TPU_PROBE=0`` skips the subprocess (assume the device is
    reachable and resolve in-process — no duplicate backend init).
    Returns the backend name, or ``None`` when the probe hung/failed."""
    import importlib.util
    import subprocess
    import sys as _sys
    from importlib.metadata import entry_points

    import jax

    if os.environ.get("SANAFE_TPU_PROBE", "1") == "0":
        return jax.default_backend()

    # Accelerators arrive as (a) an explicit platform list in the config /
    # JAX_PLATFORMS env (possibly set by a sitecustomize shim), (b) a
    # pip-installed PJRT plugin, or (c) a bare libtpu install that
    # xla_bridge discovers directly. Reading any of these does not
    # initialize the backend.
    platforms = (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS")
        or ""
    )
    first = platforms.split(",")[0].strip().lower()
    if first == "cpu":
        return "cpu"
    has_plugin = bool(first)
    if not has_plugin:
        try:
            has_plugin = bool(entry_points(group="jax_plugins"))
            if not has_plugin:
                import jax_plugins  # namespace package (pip plugins)

                has_plugin = bool(getattr(jax_plugins, "__path__", None))
        except Exception:
            has_plugin = False
    if not has_plugin:
        # Cloud-TPU installs register via libtpu without an entry point
        try:
            has_plugin = importlib.util.find_spec("libtpu") is not None
        except (ImportError, ValueError):
            has_plugin = False
    if not has_plugin:
        return "cpu"
    timeout = float(os.environ.get("SANAFE_TPU_PROBE_TIMEOUT", "120"))
    # Retry once: a healthy-but-slow accelerator (tunnel reconnect, cold
    # runtime) must not get silently pinned to the CPU/float64 path — that
    # is a large perf cliff, not a graceful fallback.
    for attempt in range(2):
        try:
            # jax.devices() is the call that actually contacts the device
            # runtime (plain default_backend() can resolve without touching
            # a tunneled accelerator, then hang at first use)
            probe = subprocess.run(
                [_sys.executable, "-c",
                 "import jax; jax.devices(); print(jax.default_backend())"],
                capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            if attempt == 0:
                print("sanafe_tpu: accelerator probe timed out; "
                      "retrying once...", file=_sys.stderr)
                continue
            return None
        if probe.returncode != 0:
            return None
        return (probe.stdout.strip().splitlines()[-1]
                if probe.stdout else None)
    return None


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    flags, positional = parse_args(argv)
    if len(positional) != 3:
        print(USAGE, file=sys.stderr)
        return 1
    arch_path, net_path, timesteps_arg = positional
    try:
        timesteps = int(timesteps_arg)
    except ValueError:
        print(f"Error: Invalid time-steps: {timesteps_arg}", file=sys.stderr)
        return 1
    if timesteps <= 0:
        print(f"Error: Time-steps must be > 0 ({timesteps})", file=sys.stderr)
        return 1

    # Reference trace-flag wiring (src/main.cpp:63-67): -s drives the
    # spike/potential/perf/message traces together; only -x acts alone.
    # The reference computes everything in C++ double; byte-identical trace
    # output needs float64. On CPU backends that is free, so enable it by
    # default; on accelerators keep the fast float32 path (bit-exact spike
    # rasters, last-digit energy deviations) unless SANAFE_TPU_CLI_EXACT=1
    # forces the CPU float64 parity configuration.
    import jax

    if os.environ.get("SANAFE_TPU_CLI_EXACT", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        backend = _probe_backend()
        if backend == "cpu":
            # pin the platform too: the decision must bind the main
            # process even if its own backend resolution would differ
            # (e.g. an accelerator the detection above cannot see). Under
            # SANAFE_TPU_PROBE=0 the backend already initialized
            # in-process (as cpu), making the pin redundant — skip the
            # RuntimeError it would raise.
            try:
                jax.config.update("jax_platforms", "cpu")
            except RuntimeError:
                pass
            jax.config.update("jax_enable_x64", True)
        elif backend is None:
            # Accelerator plugin present but unreachable (e.g. a tunneled
            # device that is down): calling jax.default_backend() here
            # would hang forever, so fall back to the CPU parity path.
            print(
                "Warning: accelerator backend unreachable; "
                "falling back to CPU (float64).",
                file=sys.stderr,
            )
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)

    if os.environ.get("SANAFE_TPU_SANE_TRACES", "0") != "1":
        record_spikes = flags["record_spikes"]
        flags["record_potentials"] = record_spikes
        flags["record_perf"] = record_spikes
        flags["record_messages"] = record_spikes

    out = Path(flags["output_dir"])
    try:
        arch = load_arch(arch_path)
        print("Architecture initialized.")
        net = load_net(net_path, arch, flags["use_netlist_format"])
        print("Network initialized.")
        chip = SpikingChip(arch)
        chip.load(net)
        print("Running simulation.")
        out.mkdir(parents=True, exist_ok=True)
        run_data = chip.sim(
            timesteps,
            timing_model=flags["timing_model"],
            processing_threads=flags["processing_threads"],
            scheduler_threads=flags["scheduler_threads"],
            spike_trace=(
                str(out / "spikes.csv") if flags["record_spikes"] else None
            ),
            potential_trace=(
                str(out / "potentials.csv")
                if flags["record_potentials"]
                else None
            ),
            neuron_trace=(
                str(out / "neurons.csv")
                if flags["record_neuron_state"]
                else None
            ),
            perf_trace=(
                str(out / "perf.csv") if flags["record_perf"] else None
            ),
            message_trace=(
                str(out / "messages.csv")
                if flags["record_messages"]
                else None
            ),
        )
        chip.close()
        print("***** Run Summary *****")
        chip.sim_output_run_summary(out, run_data)
        print(f"Average power consumption: {chip.get_power():f} W.")
        print("Run finished.")
        return 0
    except DescriptionParsingError as exc:
        print(str(exc), file=sys.stderr)
        return 1
    except FileNotFoundError as exc:
        print(f"Error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
