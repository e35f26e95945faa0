"""Multi-device (SPMD) execution of the chip kernel.

The reference is a single-process simulator whose only parallelism is OpenMP
over simulated cores inside one timestep (``src/chip.cpp:629-653``). The
TPU-native scale-out equivalent shards the *simulated-core/neuron axis* of the
dense chip state across a ``jax.sharding.Mesh`` — the spatial analog of tensor
parallelism — and lets XLA's GSPMD partitioner insert the ICI collectives for
the cross-shard spike scatter (the simulated NoC traffic becomes real
all-to-all/reduce-scatter traffic over the interconnect).

Usage::

    mesh = jax.make_mesh((n_devices,), ("cores",))
    padded = pad_compiled(chip.compiled, multiple=n_devices)
    prog = make_device_program(padded)
    prog = shard_program(prog, mesh)
    run = prog.make_scan(chunk)

Padded neuron/axon/edge slots are inert by construction: padded neurons have
``soma_model == SOMA_MODEL_NONE`` (never update or fire), padded axons source
from a padded neuron, padded edges hang off a padded axon with zero weight and
zero energy, so every reduction the kernel computes is unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compile import CompiledChip
from ..models import SOMA_MODEL_NONE
from ..ops.step import DeviceProgram


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_compiled(c: CompiledChip, multiple: int) -> CompiledChip:
    """Return a copy of ``c`` with the neuron, axon, and edge axes padded to a
    multiple of ``multiple`` using inert slots (see module docstring)."""
    n = c.n_neurons
    a = c.n_axons if c.n_axons else len(c.axon_src_slot)
    e = c.n_edges

    n_pad = _round_up(max(n, 1), multiple)
    a_pad = _round_up(max(a, 1), multiple)
    e_pad = _round_up(max(e, 1), multiple)
    # Padded axons must source from a padded (never-firing) neuron and padded
    # edges from a padded axon, so force at least one pad slot upstream.
    if a_pad > a and n_pad == n:
        n_pad += multiple
    if e_pad > e and a_pad == a:
        a_pad += multiple
        if n_pad == n:
            n_pad += multiple

    if (n_pad, a_pad, e_pad) == (n, a, e):
        return c

    out = dataclasses.replace(c)
    # Conv specs survive padding: the appended slots belong to no group, so
    # build_conv_delivery emits them as zero pieces and the few-KB filters
    # replicate across the mesh while the leftover block path shards its
    # block axis (shard_program) — a sharded DVS keeps ~KB of delivery
    # state per device instead of ~300 MB of materialized blocks.

    def pad_axis(arr: Optional[np.ndarray], new_len: int, fill=0):
        if arr is None:
            return None
        pad_width = [(0, new_len - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width, constant_values=fill)

    neuron_fields = [
        f.name
        for f in dataclasses.fields(CompiledChip)
        if f.name.startswith(
            ("soma_", "dendrite_", "input_", "neuron_", "lif_noise_")
        )
        and f.name
        not in ("input_trains", "input_unit_instance", "lif_noise_values")
    ] + [
        "core_id",
        "offset_in_core",
        "threshold",
        "reverse_threshold",
        "reset",
        "reverse_reset",
        "reset_mode",
        "reverse_reset_mode",
        "leak_decay",
        "input_decay",
        "bias",
        "leak",
        "leak_towards_zero",
        "random_range_mask",
        "force_update",
        "refractory_delay",
        "initial_potential",
        "log_spikes",
        "log_potential",
        "log_u",
        "input_unit_instance",
        "tap_time_constants",
        "tap_space_constants",
        "n_taps",
    ]
    for name in neuron_fields:
        arr = getattr(c, name, None)
        if isinstance(arr, np.ndarray) and arr.shape[:1] == (n,):
            setattr(out, name, pad_axis(arr, n_pad))
    out.soma_model = pad_axis(c.soma_model, n_pad, fill=SOMA_MODEL_NONE)
    # lif_noise_stride must stay >= 1 (used as a modulus divisor guard)
    if out.lif_noise_stride is not None:
        out.lif_noise_stride = np.maximum(out.lif_noise_stride, 1)
    out.plugin_params = {
        name: {
            param: pad_axis(values, n_pad)
            for param, values in params.items()
        }
        for name, params in c.plugin_params.items()
    }

    pad_neuron_slot = n  # first padded neuron slot (never fires)
    for name in [f.name for f in dataclasses.fields(CompiledChip)]:
        if not name.startswith("axon_"):
            continue
        arr = getattr(c, name, None)
        if isinstance(arr, np.ndarray) and arr.shape[:1] == (a,):
            fill = pad_neuron_slot if name == "axon_src_slot" else 0
            setattr(out, name, pad_axis(arr, a_pad, fill=fill))

    pad_axon = a  # first padded axon (sources from a padded neuron)
    for name in [f.name for f in dataclasses.fields(CompiledChip)]:
        if not name.startswith("edge_"):
            continue
        arr = getattr(c, name, None)
        if isinstance(arr, np.ndarray) and arr.shape[:1] == (e,):
            if name == "edge_axon":
                fill = pad_axon
            elif name in ("edge_src_slot", "edge_dest_slot"):
                fill = pad_neuron_slot
            else:
                fill = 0
            setattr(out, name, pad_axis(arr, e_pad, fill=fill))

    out.n_neurons = n_pad
    out.n_axons = a_pad
    out.n_edges = e_pad
    return out


def shard_program(prog: DeviceProgram, mesh: Mesh, axis: str = "cores"):
    """Place the program's device arrays with shardings over ``mesh``:
    neuron/axon/edge axes split along ``axis``; the block-delivery arrays
    split along their BLOCK axis (each device owns a slice of the weight
    blocks and contributes a partial delivery that GSPMD reduce-scatters);
    the fused roll-up matrix splits along its 2N row axis. Small index /
    filter arrays replicate. Returns the same DeviceProgram, mutated in
    place. ``init_state`` results should be placed with
    :func:`shard_state` afterwards."""
    c = prog.compiled
    split = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    sized = {
        c.n_neurons,
        2 * c.n_neurons,  # fused roll-up rows (concat(fired, updated))
        c.n_edges,
        len(np.asarray(prog.arrays["axon_src_slot"])),
    }
    # block-delivery arrays shard on the block axis — the dominant memory
    # on dense chips ([B, tile, tile] weights)
    block_names = {
        "block_src_tiles", "block_dest_tiles", "block_weights",
        "block_wc", "block_counts",
    }

    n_dev = math.prod(mesh.shape.values())
    new_arrays = {}
    for name, arr in prog.arrays.items():
        if name in block_names:
            if arr.shape[0] % n_dev == 0:
                new_arrays[name] = jax.device_put(arr, split)
            else:
                # pad inert blocks (src == dest == tile 0, zero weights)
                # up to the mesh size so the block axis divides
                pad = (-arr.shape[0]) % n_dev
                widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
                padded = jnp.pad(arr, widths)
                new_arrays[name] = jax.device_put(padded, split)
        elif (
            arr.ndim >= 1
            and arr.shape[0] in sized
            and name != "input_trains"
        ):
            new_arrays[name] = jax.device_put(arr, split)
        else:
            new_arrays[name] = jax.device_put(arr, repl)
    prog.arrays = new_arrays
    prog.mesh = mesh
    prog.shard_axis = axis
    return prog


def shard_state(state: dict, mesh: Mesh, axis: str = "cores") -> dict:
    """Place a kernel state pytree with the neuron axis split over ``mesh``."""
    out = {}
    for name, arr in state.items():
        if name == "delay_ring":
            spec = P(None, axis)
        else:
            spec = P(axis)
        out[name] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out
