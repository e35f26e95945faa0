"""Byte-exact perf.csv energy columns: the reference's accumulation tree.

The reference computes each timestep's energy categories by accumulating
one float64 add per EVENT into per-unit bins (PipelineUnit::process,
src/pipeline.cpp:101), then folding units -> cores -> tiles -> totals in a
fixed order (sim_calculate_ts_energy / _tile_energy / _core_energy,
src/chip.cpp:1171-1261). The device kernel's vectorized reductions are
mathematically equal but associate differently, which flips the last
printed digit on a small fraction of rows at DVS scale. This module
replays the reference's exact association on the host from the per-step
fired/updated masks:

- synapse / message-phase-dendrite units process one event per (message,
  synapse address); every event on a unit costs the unit's constant, so
  the serially-rounded sum of k events is a lazily-grown cumsum table
  lookup (np.cumsum applies adds in element order).
- soma units see one event per mapped neuron in slot order with energy
  fl(fl(access+update)+spike) gated by status
  (calculate_soma_default_energy_latency, src/pipeline.hpp:631-696);
  their serial sums use the native order-exact keyed accumulator.
- axon_out units add energy_access per packet serially
  (pipeline_process_axon_out, src/chip.cpp:802-834); axon_in energy is a
  single count*cost product (sim_calculate_core_energy).
- per-tile directional hop counts go to the DEST tile
  (sim_estimate_network_costs, src/chip.cpp:1127-1169); hop energy adds
  east, west, south, north in that order.

Only the standard buffer positions (before_dendrite / before_soma) and
single-function units are supported; anything else falls back to the
device sums (which are exact at those configs' scales anyway). Used when
float64 is active and a perf trace is requested — i.e. exactly the parity
path; the float32 TPU fast path is untouched.
"""

from __future__ import annotations

import numpy as np

from ..arch import BufferPosition
from ..compile import CompiledChip


class ExactEnergyUnsupported(Exception):
    pass


def _csr(pairs_key, pairs_col, pairs_weight, n_rows, n_cols):
    from scipy.sparse import csr_matrix

    return csr_matrix(
        (pairs_weight, (pairs_key, pairs_col)), shape=(n_rows, n_cols)
    )


class _SerialConstTable:
    """Serially-rounded sums of k copies of a constant, per constant."""

    def __init__(self):
        self._tables: dict[float, np.ndarray] = {}

    def lookup(self, const: float, counts: np.ndarray) -> np.ndarray:
        counts = np.asarray(counts, dtype=np.int64)
        if const == 0.0:
            return np.zeros(counts.shape)
        table = self._tables.get(const)
        need = int(counts.max(initial=0))
        if table is None or len(table) < need:
            size = max(need, 1024)
            table = np.cumsum(np.full(size, const, dtype=np.float64))
            self._tables[const] = table
        out = np.zeros(counts.shape)
        nz = counts > 0
        out[nz] = table[counts[nz] - 1]
        return out


class ExactEnergyModel:
    def __init__(self, c: CompiledChip):
        try:
            import scipy.sparse  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise ExactEnergyUnsupported("scipy unavailable") from exc
        for u in c.units:
            functions = (
                int(u.implements_synapse)
                + int(u.implements_dendrite)
                + int(u.implements_soma)
            )
            if functions > 1:
                raise ExactEnergyUnsupported(
                    "multi-function unit energies interleave phases"
                )
            if u.update_every_timestep:
                raise ExactEnergyUnsupported(
                    "forced per-timestep updates add extra unit events"
                )
        for core in c.cores:
            if core.buffer_position not in (
                BufferPosition.BEFORE_DENDRITE, BufferPosition.BEFORE_SOMA
            ):
                raise ExactEnergyUnsupported(
                    f"buffer position {core.buffer_position!r}"
                )
        if getattr(c, "plugin_specs", None):
            for spec in c.plugin_specs:
                raise ExactEnergyUnsupported(
                    "plugin models may simulate energies"
                )

        self.c = c
        n = c.n_neurons
        n_units = len(c.units)
        n_cores = c.n_cores
        tiles = c.arch.tiles
        n_tiles = len(tiles)
        self.n_units = n_units
        self.tables = _SerialConstTable()

        # soma per-slot event energies: access / +update / +spike
        acc = np.asarray(c.soma_energy_access, dtype=np.float64)
        e01 = acc + np.asarray(c.soma_energy_update, dtype=np.float64)
        e012 = e01 + np.asarray(c.soma_energy_spike, dtype=np.float64)
        self.soma_e = (acc, e01, e012)
        self.soma_keys = np.asarray(c.soma_unit_id, dtype=np.int32)

        # neuron-phase dendrite: one constant event per mapped neuron per
        # step -> a per-unit constant vector (computed once, serially)
        from ..native import serial_keyed_sum

        den_phase = np.asarray(c.dendrite_in_neuron_phase, dtype=bool)
        den_vals = np.where(
            den_phase, np.asarray(c.dendrite_energy_update, np.float64), 0.0
        )
        den_keys = np.where(
            den_phase, np.asarray(c.dendrite_unit_id, np.int32), -1
        ).astype(np.int32)
        self.dendrite_neuron_phase_energy = serial_keyed_sum(
            den_vals, den_keys, n_units
        )

        # message-phase ops per unit: count matrices over fired src slots
        e = len(c.edge_src_slot) if c.edge_src_slot is not None else 0
        src = c.edge_src_slot if e else np.zeros(0, np.int64)
        ones = np.ones(e)
        self.ops_syn = _csr(
            c.edge_synapse_unit_id if e else np.zeros(0, np.int64),
            src, ones, n_units, n,
        )
        if e:
            dest = c.edge_dest_slot
            den_msg = np.asarray(c.dendrite_in_message_phase, dtype=bool)[
                dest
            ]
            self.ops_den = _csr(
                np.where(den_msg, c.dendrite_unit_id[dest], 0),
                src, den_msg.astype(np.float64), n_units, n,
            )
        else:
            self.ops_den = _csr(
                np.zeros(0, np.int64), src, ones, n_units, n
            )
        self.unit_syn_const = np.zeros(n_units)
        self.unit_den_const = np.zeros(n_units)
        for u in c.units:
            self.unit_syn_const[u.unit_id] = u.energy_process_spike
            self.unit_den_const[u.unit_id] = u.energy_update

        # per-core axon counts
        a = len(c.axon_src_slot)
        ax_src = c.axon_src_slot if a else np.zeros(0, np.int64)
        self.msgs_in = _csr(
            c.axon_dest_core if a else np.zeros(0, np.int64),
            ax_src, np.ones(a), n_cores, n,
        )
        slots = np.arange(n)
        self.packets_out = _csr(
            np.asarray(c.core_id, np.int64), slots,
            np.asarray(c.neuron_n_axons, np.float64), n_cores, n,
        )
        self.core_e_in = np.array(
            [core.energy_message_in for core in c.cores]
        )
        self.core_e_out = np.array(
            [core.energy_message_out for core in c.cores]
        )

        # per-tile directional hop counts (dest tile; x hops east/west by
        # src.x vs dest.x, y hops north/south)
        if a:
            sx, sy = c.axon_src_x, c.axon_src_y
            dx, dy = c.axon_dest_x, c.axon_dest_y
            dt = c.axon_dest_tile
            x_h = np.abs(sx - dx).astype(np.float64)
            y_h = np.abs(sy - dy).astype(np.float64)
            east = (sx < dx).astype(np.float64) * x_h
            west = (sx >= dx).astype(np.float64) * x_h
            north = (sy < dy).astype(np.float64) * y_h
            south = (sy >= dy).astype(np.float64) * y_h
            self.hops_mats = [
                _csr(dt, ax_src, w, n_tiles, n)
                for w in (east, west, south, north)
            ]
        else:
            zero = np.zeros(0)
            z = np.zeros(0, np.int64)
            self.hops_mats = [_csr(z, z, zero, n_tiles, n)] * 4
        self.tile_hop_e = np.array(
            [
                [
                    t.power_metrics.energy_east_hop,
                    t.power_metrics.energy_west_hop,
                    t.power_metrics.energy_south_hop,
                    t.power_metrics.energy_north_hop,
                ]
                for t in tiles
            ]
        )

        # fold order: tiles ascending; per tile its cores ascending; per
        # core its in-use units in arch (construction) order
        self.tile_cores: list[list[int]] = [[] for _ in range(n_tiles)]
        self.core_units: list[list] = [[] for _ in range(n_cores)]
        for core in c.cores:
            self.tile_cores[core.tile_id].append(core.core_id)
            for u in core.units:
                if u.is_used:
                    self.core_units[core.core_id].append(
                        (
                            u.unit_id,
                            u.implements_synapse,
                            u.implements_dendrite,
                            u.implements_soma,
                        )
                    )

    def chunk(self, fired: np.ndarray, updated: np.ndarray) -> np.ndarray:
        """fired/updated: [T, n_neurons] bool ->
        [T, 5] float64 (synapse, dendrite, soma, network, total)."""
        from ..native import serial_keyed_sum

        T = fired.shape[0]
        f = fired.astype(np.float64)
        fT = f.T  # [N, T]
        acc, e01, e012 = self.soma_e
        upd = updated | fired

        # per-unit event sums
        k_syn = np.rint(self.ops_syn @ fT).astype(np.int64)  # [U, T]
        k_den = np.rint(self.ops_den @ fT).astype(np.int64)
        msgs_in = np.rint(self.msgs_in @ fT).astype(np.int64)  # [C, T]
        packets = np.rint(self.packets_out @ fT).astype(np.int64)
        hop_counts = [np.rint(m @ fT) for m in self.hops_mats]  # [Tl, T]

        unit_energy = np.zeros((T, self.n_units))
        for u in range(self.n_units):
            e_s = self.unit_syn_const[u]
            if e_s != 0.0 or k_syn[u].any():
                unit_energy[:, u] += self.tables.lookup(e_s, k_syn[u])
            e_d = self.unit_den_const[u]
            if e_d != 0.0 and k_den[u].any():
                unit_energy[:, u] += self.tables.lookup(e_d, k_den[u])
        unit_energy += self.dendrite_neuron_phase_energy[None, :]
        for t in range(T):
            e_n = np.where(
                fired[t], e012, np.where(upd[t], e01, acc)
            )
            unit_energy[t] += serial_keyed_sum(
                e_n, self.soma_keys, self.n_units
            )

        axon_out_e = np.zeros((T, len(self.core_e_out)))
        for ci, e_o in enumerate(self.core_e_out):
            axon_out_e[:, ci] = self.tables.lookup(e_o, packets[ci])
        axon_in_e = msgs_in.T.astype(np.float64) * self.core_e_in[None, :]

        out = np.zeros((T, 5))
        for t in range(T):
            syn = den = soma = net = total = 0.0
            ue_t = unit_energy[t]
            for tile_id, cores in enumerate(self.tile_cores):
                he = self.tile_hop_e[tile_id]
                hop = hop_counts[0][tile_id, t] * he[0]
                hop += hop_counts[1][tile_id, t] * he[1]
                hop += hop_counts[2][tile_id, t] * he[2]
                hop += hop_counts[3][tile_id, t] * he[3]
                net += hop
                tile_e = hop
                for core_id in cores:
                    ain = axon_in_e[t, core_id]
                    net += ain
                    pipe = 0.0
                    for uid, is_syn, is_den, is_soma in self.core_units[
                        core_id
                    ]:
                        ue = ue_t[uid]
                        pipe += ue
                        if is_syn:
                            syn += ue
                        if is_den:
                            den += ue
                        if is_soma:
                            soma += ue
                    aout = axon_out_e[t, core_id]
                    net += aout
                    core_e = ain
                    core_e += pipe
                    core_e += aout
                    tile_e += core_e
                total += tile_e
            out[t] = (syn, den, soma, net, total)
        return out
