"""Batched design-space exploration: B parameterizations of one chip at once.

SANA-FE exists for neuromorphic architecture design-space exploration
(reference README.md; the TCAD'25 paper sweeps hardware energy/latency
costs and model parameters across runs). The reference evaluates one
parameterization per process; on TPU the natural formulation is a leading
sample axis: ``jax.vmap`` batches the timestep kernel over B parameter
samples of the SAME mapped topology, so

- connectivity (block weights, conv filters) stays unbatched and is read
  from HBM once per step for ALL samples — the dominant memory traffic is
  amortized B-fold, and
- every overridden per-neuron parameter or per-neuron cost column simply
  carries a ``[B, ...]`` axis through the same jitted code path the
  single-chip simulator uses (ops/step.py `_timestep`), so batched counters
  are exactly those of B sequential `sim()` calls (float sums may differ in
  the last ulp from chunk-partial grouping).

Restrictions: the simple timing model only (the detailed NoC sweep is a
serial host-side algorithm per sample — run it on the winning sample
afterwards), and no host-fed stochastic models (TrueNorth LFSR noise /
Poisson inputs consume a process-global RNG stream whose draw order is
defined per-chip, not per-batch).

Example::

    chip = sf.SpikingChip(arch); chip.load(net)
    sweep = ParameterSweep(chip, {
        "threshold": thresholds,          # [B, n_neurons]
        "leak_decay": decays,             # [B, n_neurons]
    })
    out = sweep.run(1000)
    best = int(np.argmin(out["energy"]["total"]))
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.step import _timestep, make_device_program

__all__ = ["ParameterSweep", "expand_group_values"]


def expand_group_values(
    compiled, name: str, group_values: dict, base: Optional[np.ndarray] = None
) -> np.ndarray:
    """Build a ``[B, n_neurons]`` override for per-neuron column ``name``.

    ``group_values`` maps group name -> ``[B]`` (one value per sample,
    broadcast over the group) or ``[B, group_size]`` arrays. Neurons of
    unlisted groups keep the compiled value (or ``base`` if given).
    """
    ref = base if base is not None else getattr(compiled, name)
    ref = np.asarray(ref, dtype=np.float64)
    B = None
    for values in group_values.values():
        b = np.asarray(values).shape[0]
        if B is None:
            B = b
        elif B != b:
            raise ValueError("inconsistent sample counts across groups")
    if B is None:
        raise ValueError("group_values is empty")
    out = np.broadcast_to(ref, (B,) + ref.shape).copy()
    for group, values in group_values.items():
        slots = np.asarray(compiled.groups[group])
        values = np.asarray(values, dtype=np.float64)
        if values.ndim == 1:
            out[:, slots] = values[:, None]
        else:
            if values.shape[1] != len(slots):
                raise ValueError(
                    f"override for group {group!r} has {values.shape[1]} "
                    f"columns, group has {len(slots)} neurons"
                )
            out[:, slots] = values
    return out


class ParameterSweep:
    """Simulate B parameter samples of one mapped chip simultaneously.

    ``overrides`` maps device-array names (the per-neuron parameter and
    cost columns of ops/step.py `make_device_program` — e.g. ``threshold``,
    ``leak_decay``, ``bias``, ``soma_energy_update``, or a conv filter
    ``conv_kernel_0``) to arrays of shape ``[B, *original.shape]``.

    Note ``conv_kernel_i`` is the HWIO filter with an appended all-ones
    output channel (the destination arrival counter driving buffer_valid);
    when sweeping filter weights, scale ``kernel[..., :-1]`` and leave the
    last output channel at 1.
    """

    def __init__(self, chip, overrides: dict, dtype=None, mesh=None,
                 mesh_axis: str = None):
        """``mesh`` (a ``jax.sharding.Mesh``) shards the SAMPLE axis across
        devices: each device simulates B/n_devices full chips — the
        embarrassingly-parallel scale-out for design-space exploration.
        Shared arrays (connectivity, unbatched parameters) are replicated;
        only the ``[B, ...]`` overrides and the state split. ``mesh_axis``
        names the mesh axis to split over (default: the mesh's first)."""
        c = chip.compiled
        if c.has_poisson or (
            c.tn_noise_slots is not None and len(c.tn_noise_slots)
        ):
            raise ValueError(
                "ParameterSweep does not support host-fed stochastic models "
                "(Poisson inputs / TrueNorth LFSR noise); their RNG stream "
                "draw order is defined per-chip. Sweep deterministic "
                "configurations, then sim() the winner."
            )
        self.compiled = c
        # The fused roll-up / dense-delivery matvec bakes every cost
        # column and the edge weights into its coefficient matrix at build
        # time; overriding one of those arrays per sample would silently
        # no-op. Pure state-dynamics parameters stay runtime inputs, so
        # fusion is only disabled when a baked array is swept.
        dynamics_only = {
            "threshold", "reverse_threshold", "reset", "reverse_reset",
            "leak_decay", "input_decay", "bias", "leak",
            "leak_towards_zero", "refractory_delay", "force_update",
        }
        fuse = all(name in dynamics_only for name in overrides)
        self.prog = make_device_program(c, dtype=dtype, fuse=fuse)
        prog = self.prog
        if not overrides:
            raise ValueError("no overrides given; use SpikingChip.sim()")
        B = None
        self.arrays = dict(prog.arrays)
        self.in_axes = {k: None for k in prog.arrays}
        for name, values in overrides.items():
            if name not in prog.arrays:
                known = ", ".join(sorted(prog.arrays))
                raise KeyError(
                    f"unknown device array {name!r}; valid names: {known}"
                )
            orig = prog.arrays[name]
            vb = jnp.asarray(values, dtype=orig.dtype)
            if vb.shape[1:] != orig.shape:
                raise ValueError(
                    f"override {name!r} must have shape [B, "
                    f"{', '.join(map(str, orig.shape))}]; got {vb.shape}"
                )
            if B is None:
                B = vb.shape[0]
            elif vb.shape[0] != B:
                raise ValueError("inconsistent sample counts across overrides")
            self.arrays[name] = vb
            self.in_axes[name] = 0
        self.batch = B
        self.mesh = mesh
        self.mesh_axis = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh_axis or mesh.axis_names[0]
            self.mesh_axis = axis
            if B % mesh.shape[axis]:
                raise ValueError(
                    f"sample count {B} must divide the mesh axis "
                    f"{axis!r} ({mesh.shape[axis]} devices)"
                )
            split = NamedSharding(mesh, PartitionSpec(axis))
            repl = NamedSharding(mesh, PartitionSpec())
            self.arrays = {
                k: jax.device_put(v, split if self.in_axes[k] == 0 else repl)
                for k, v in self.arrays.items()
            }
        self._scan_cache: dict[int, object] = {}

    def _make_scan(self, chunk_len: int):
        prog = self.prog
        in_axes = self.in_axes

        def step(arrays, state, t):
            return _timestep(prog, arrays, state, t, {})

        vstep = jax.vmap(step, in_axes=(in_axes, 0, None))

        @jax.jit
        def run_chunk(arrays, state, t0):
            ts = t0 + jnp.arange(chunk_len, dtype=jnp.int64)

            def body(s, t):
                return vstep(arrays, s, t)

            return jax.lax.scan(body, state, ts)

        return run_chunk

    def run(self, timesteps: int, chunk: int = 4096) -> dict:
        """Run ``timesteps`` steps for every sample; returns ``[B]``-shaped
        aggregates mirroring ``SpikingChip.sim()``'s result keys."""
        B = self.batch
        prog = self.prog
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), prog.init_state()
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            split = NamedSharding(self.mesh, PartitionSpec(self.mesh_axis))
            state = jax.tree.map(
                lambda x: jax.device_put(x, split), state
            )
        counters = np.zeros((B, 5), dtype=np.int64)
        energies = np.zeros((B, 6), dtype=np.float64)
        t = 1
        remaining = timesteps
        while remaining > 0:
            this_chunk = min(chunk, remaining)
            run_chunk = self._scan_cache.get(this_chunk)
            if run_chunk is None:
                run_chunk = self._make_scan(this_chunk)
                self._scan_cache[this_chunk] = run_chunk
            state, outputs = run_chunk(self.arrays, state, np.int64(t))
            stats = np.asarray(outputs["stats"], dtype=np.float64)  # [T,B,11]
            counters += np.round(stats[:, :, :5]).astype(np.int64).sum(axis=0)
            energies += stats[:, :, 5:11].sum(axis=0)
            t += this_chunk
            remaining -= this_chunk
        return {
            "timesteps_executed": timesteps,
            "spikes": counters[:, 0],
            "packets_sent": counters[:, 1],
            "neurons_updated": counters[:, 3],
            "neurons_fired": counters[:, 4],
            "energy": {
                "synapse": energies[:, 0],
                "dendrite": energies[:, 1],
                "soma": energies[:, 2],
                "network": energies[:, 3],
                "total": energies[:, 4],
            },
            "sim_time": energies[:, 5],
        }
