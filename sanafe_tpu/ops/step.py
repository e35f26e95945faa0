"""Device timestep kernel: the entire per-timestep simulation as jitted JAX.

TPU-native replacement for the reference's hot loop
(``SpikingChip::sim_hw_timestep``, ``src/chip.cpp:1053-1108``): instead of
event-driven per-neuron/per-message processing over OpenMP threads, every
phase is dense vectorized math over the global neuron-slot axis, run under
``lax.scan`` across timesteps:

- neuron phase  = masked multi-model soma update over all slots
  (``process_neurons``, src/chip.cpp:624-654)
- spike scatter = ``segment_sum`` over the precompiled edge CSR
  (``process_messages``, src/chip.cpp:656-708)
- energy/counter roll-up = closed-form sums from per-event constants
  (``sim_calculate_ts_energy``, src/chip.cpp:1171-1261)
- simple timing model = segment reductions per core
  (``schedule_messages_timestep_simple``, src/schedule.cpp:61-102)

The detailed timing model consumes the per-step fired-axon tensor host-side
(see ``ops/timing.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..arch import NeuronResetMode
from ..compile import CompiledChip
from ..models import (
    DENDRITE_MODEL_ACCUMULATOR_DELAY,
    DENDRITE_MODEL_MULTITAP,
    DENDRITE_MODEL_PLUGIN_COMP,
    SOMA_MODEL_INPUT,
    SOMA_MODEL_LIF,
    SOMA_MODEL_TRUENORTH,
)

NEURON_STATUS_IDLE = 0
NEURON_STATUS_UPDATED = 1
NEURON_STATUS_FIRED = 2

# Spike-delivery tile size for the block-dense matmul path. TPU
# scatters/gathers execute ~serially (≈8-30 ns/element), so per-edge
# scatter over millions of edges is the wrong shape for the hardware;
# delivery instead runs as a batch of dense [TILE, TILE] matmuls on the
# MXU over the (src-tile, dest-tile) blocks that contain edges.
DELIVERY_TILE = 256


def _segment_sum(values, segment_ids, num_segments):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


@dataclass
class BlockDelivery:
    """Static block-sparse connectivity for the MXU delivery path."""

    tile: int
    n_tiles: int
    n_pad: int
    src_tiles: jnp.ndarray  # [B] int32, static block source tile ids
    dest_tiles: jnp.ndarray  # [B] int32, sorted ascending
    weights: jnp.ndarray  # [B, tile, tile] f32, summed parallel edges
    counts: jnp.ndarray  # [B, tile, tile] int8, edge counts (saturated)


def build_block_delivery(
    c: CompiledChip, edge_subset: Optional[np.ndarray] = None
) -> Optional[BlockDelivery]:
    """Lower the edge CSR into dense (src-tile, dest-tile) weight blocks.

    Usable whenever every dendrite is a plain accumulator (no per-edge delay
    slots or tap routing); models with per-edge state keep the scatter path.
    ``edge_subset`` (bool [E]) restricts the lowering to a subset of edges —
    used by the conv path to handle only the leftover unstructured edges.
    """
    if c.has_delay_dendrite or c.has_multitap or c.has_plugin_comp:
        return None
    n = c.n_neurons
    tile = min(DELIVERY_TILE, max(8, 1 << (n - 1).bit_length()))
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    n_edges = (
        int(edge_subset.sum()) if edge_subset is not None else c.n_edges
    )
    if n_edges == 0:
        return BlockDelivery(
            tile=tile,
            n_tiles=n_tiles,
            n_pad=n_pad,
            src_tiles=jnp.zeros(0, jnp.int32),
            dest_tiles=jnp.zeros(0, jnp.int32),
            weights=jnp.zeros((0, tile, tile), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
            counts=jnp.zeros((0, tile, tile), jnp.int8),
        )
    src = c.axon_src_slot[c.edge_axon].astype(np.int64)
    dst = c.edge_dest_slot.astype(np.int64)
    edge_weight = c.edge_weight
    if edge_subset is not None:
        src = src[edge_subset]
        dst = dst[edge_subset]
        edge_weight = edge_weight[edge_subset]
    src_t = src // tile
    dst_t = dst // tile
    key = dst_t * n_tiles + src_t  # dest-major so segment ids sort ascending
    uniq, block_of_edge = np.unique(key, return_inverse=True)
    B = len(uniq)
    # Weights stay float64 until the device cast so float32 rounding only
    # happens when the program itself is float32
    weights = np.zeros((B, tile, tile), dtype=np.float64)
    np.add.at(
        weights,
        (block_of_edge, src % tile, dst % tile),
        edge_weight,
    )
    counts16 = np.zeros((B, tile, tile), dtype=np.int16)
    np.add.at(counts16, (block_of_edge, src % tile, dst % tile), 1)
    return BlockDelivery(
        tile=tile,
        n_tiles=n_tiles,
        n_pad=n_pad,
        src_tiles=jnp.asarray((uniq % n_tiles).astype(np.int32)),
        dest_tiles=jnp.asarray((uniq // n_tiles).astype(np.int32)),
        weights=jnp.asarray(weights),
        counts=jnp.asarray(np.minimum(counts16, 127).astype(np.int8)),
    )


@dataclass
class ConvDelivery:
    """Structured (convolutional) spike delivery.

    For nets described with conv2d hyperedges (compile.py ConvSpec), the
    message phase runs each hyperedge as ONE strided convolution on the
    MXU: the HBM read per step is the few-KB filter instead of the
    megabytes of materialized block weights (a DVS-gesture chip's 3.5M
    edges lower to ~300 MB of 4.5%-dense blocks but only ~150 KB of
    filters). The reference's neuron indexing (src/network.cpp:377-528,
    ``ci*W*H + y*W + x``) makes each group's slot range an NCHW plane and
    the filter layout HWIO, so no data movement beyond a static
    slot-permutation (applied as contiguous-run slices) is needed.

    An extra all-ones output channel is appended to every filter so the
    same convolution also yields each destination's arrival count, whose
    positivity is the reference's buffer_valid condition
    (src/chip.cpp:656-708). Edges not covered by any conv spec (e.g. a
    dense classifier head) keep the block-matmul path over just those
    leftover edges.
    """

    # per conv spec: (src_group, dest_group, kernel f64 [kh,kw,cin,cout+1],
    # (s_h, s_w), (cin, h, w), (cout, oh, ow))
    entries: list
    # group -> int32 slot array: the group's fired vector in neuron-offset
    # order is ONE gather (slots interleave across cores, so run-slicing
    # fragments into hundreds of pieces — at DVS scale the old slice+concat
    # assembly put ~1700 slices per step into the scan body)
    in_index: dict
    # conv-dest groups in the order their results concatenate into G
    dest_order: list
    # slot s takes G[out_gidx[s]] where out_mask[s], else 0 — the inverse
    # slot permutation as one gather instead of a slot-run concatenation
    out_gidx: np.ndarray  # int32 [n]
    out_mask: np.ndarray  # bool [n]
    # block delivery over the edges not covered by conv specs
    leftover: Optional[BlockDelivery]



def build_conv_delivery(c: CompiledChip) -> Optional[ConvDelivery]:
    """Build the structured delivery plan, or None when inapplicable."""
    specs = getattr(c, "conv_specs", None)
    if not specs:
        return None
    if c.has_delay_dendrite or c.has_multitap or c.has_plugin_comp:
        return None
    if getattr(c, "edge_from_conv", None) is None:
        return None

    entries = []
    gather_runs: dict[str, list] = {}
    for spec in specs:
        out_h = (spec.in_h - spec.k_h) // spec.s_h + 1
        out_w = (spec.in_w - spec.k_w) // spec.s_w + 1
        kernel = np.concatenate(
            [
                spec.kernel,
                np.ones((spec.k_h, spec.k_w, spec.in_c, 1), dtype=np.float64),
            ],
            axis=3,
        )
        entries.append(
            (
                spec.src_group,
                spec.dest_group,
                kernel,
                (spec.s_h, spec.s_w),
                (spec.in_c, spec.in_h, spec.in_w),
                (spec.out_c, out_h, out_w),
            )
        )
        if spec.src_group not in gather_runs:
            gather_runs[spec.src_group] = np.asarray(
                c.groups[spec.src_group], dtype=np.int32
            )

    # Inverse slot permutation: only conv-DEST groups contribute values;
    # every other slot — other groups, and the inert padding appended by
    # parallel.pad_compiled — is masked to zero (any non-conv delivery
    # arrives via the leftover block path and is added on top).
    conv_dests = {e[1] for e in entries}
    dest_order = sorted(conv_dests)
    base = {}
    off = 0
    for g in dest_order:
        base[g] = off
        off += len(c.groups[g])
    out_gidx = np.zeros(c.n_neurons, dtype=np.int32)
    out_mask = np.zeros(c.n_neurons, dtype=bool)
    for name in dest_order:
        slots = np.asarray(c.groups[name])
        out_gidx[slots] = base[name] + np.arange(len(slots), dtype=np.int32)
        out_mask[slots] = True

    leftover = build_block_delivery(c, edge_subset=~c.edge_from_conv)
    return ConvDelivery(
        entries=entries,
        in_index=gather_runs,
        dest_order=dest_order,
        out_gidx=out_gidx,
        out_mask=out_mask,
        leftover=leftover,
    )


def build_rollup_matrix(c: CompiledChip):
    """Coefficient matrix for the fused stats roll-up.

    Every per-timestep reduction the kernel needs — the 9 leading stats
    counters/energies, the per-core neuron/message latency sums feeding the
    simple timing model (src/schedule.cpp:61-102), and the optional perf
    columns — is an affine function of the fired / updated masks:

        out_k = sum_i fired_i * F[i,k] + sum_i upd_i * U[i,k] + const_k

    so the whole roll-up is ONE matvec  concat(fired, updated) @ R + const
    with R = vstack(F, U) of shape [2N, K]. On small chips this replaces
    ~20 tiny reduction kernels per scan iteration (each paying fixed TPU
    kernel overhead) with a single MXU op.

    Returns (R [2N, K] f64, const [K] f64). Column layout (KEEP IN SYNC
    with ops/pallas_chunk.py plan_chunk, which lays the same stats/latency
    column groups out at lane-aligned offsets for the whole-chunk kernel):
    0..8  spike_ops, packets, hops, updated, fired, synapse_e, dendrite_e,
          soma_e, network_e   (stats rows 0..8 in this order)
    9..9+C               per-core neuron-processing latency sums
    9+C..9+2C            per-core message-processing latency sums
    9+2C..               optional perf columns (c.perf_col_names order)
    """
    n = c.n_neurons
    n_cores = c.n_cores
    n_opt = len(c.perf_col_names)
    K = 9 + 2 * n_cores + n_opt
    F = np.zeros((n, K), dtype=np.float64)
    U = np.zeros((n, K), dtype=np.float64)
    const = np.zeros(K, dtype=np.float64)

    F[:, 0] = c.neuron_spike_ops
    F[:, 1] = c.neuron_n_axons
    F[:, 2] = c.neuron_axon_hops
    U[:, 3] = 1.0
    F[:, 4] = 1.0
    F[:, 5] = c.neuron_synapse_energy
    F[:, 6] = c.neuron_msg_dendrite_energy
    F[:, 7] = c.soma_energy_spike
    U[:, 7] = c.soma_energy_update
    F[:, 8] = c.neuron_axon_energy
    const[6] = float(
        np.sum(np.where(c.dendrite_in_neuron_phase, c.dendrite_energy_update, 0.0))
    )
    const[7] = float(np.sum(c.soma_energy_access))

    onehot = np.zeros((n, n_cores), dtype=np.float64)
    onehot[np.arange(n), c.core_id] = 1.0
    lat0 = 9
    gen_const = c.soma_lat_access + np.where(
        c.dendrite_in_neuron_phase, c.dendrite_lat_update, 0.0
    )
    F[:, lat0 : lat0 + n_cores] = (
        (c.soma_lat_spike + c.neuron_axon_latency_out)[:, None] * onehot
    )
    U[:, lat0 : lat0 + n_cores] = c.soma_lat_update[:, None] * onehot
    const[lat0 : lat0 + n_cores] = gen_const @ onehot

    msg0 = lat0 + n_cores
    F[:, msg0 : msg0 + n_cores] = c.neuron_proc_lat_core

    if n_opt:
        opt0 = msg0 + n_cores
        F[:, opt0:] = c.perf_col_fired
        U[:, opt0:] = c.perf_col_updated
        const[opt0:] = c.perf_col_const

    return np.concatenate([F, U], axis=0), const


def build_dense_delivery_columns(c: CompiledChip):
    """Dense [N, 2N] delivery block appended to the roll-up matrix on small
    chips: columns 0..N are the synaptic weight matrix (delivered currents),
    columns N..2N the edge-count matrix (a destination's input count, whose
    positivity is the reference's 'message arrived' buffer_valid condition).
    Folding delivery into the roll-up matvec makes the entire message phase
    + stats roll-up a single MXU op."""
    n = c.n_neurons
    W = np.zeros((n, 2 * n), dtype=np.float64)
    if c.n_edges:
        src = c.axon_src_slot[c.edge_axon]
        dst = c.edge_dest_slot
        np.add.at(W, (src, dst), c.edge_weight)
        np.add.at(W, (src, n + dst), 1.0)
    return W


@dataclass
class DeviceProgram:
    """Compiled device arrays + the jitted scan step for one chip."""

    compiled: CompiledChip
    dtype: Any
    arrays: dict[str, jnp.ndarray]
    record_fired_axons: bool
    record_potentials: bool
    record_spikes: bool
    record_u: bool
    sync_delay: float
    block: Optional[BlockDelivery] = None
    pallas_delivery: Optional[Any] = None
    # Structured conv delivery; when set, `block` holds only the leftover
    # (non-conv) edges and the conv kernels live in arrays["conv_kernel_i"]
    conv_delivery: Optional[ConvDelivery] = None
    # Statically known set of soma model ids present on this chip; absent
    # model paths are never traced into the step, cutting kernel count.
    models_present: frozenset = frozenset()
    # Fused roll-up (float32 perf path): every per-step counter/energy/
    # latency reduction collapses into one [2N] @ [2N, K] matvec.
    fused_rollup: bool = False
    # On small chips the dense delivery columns are appended to the roll-up
    # matrix, so message phase + roll-up is ONE matvec. n_stats_cols marks
    # where the delivery columns start.
    dense_delivery: bool = False
    n_stats_cols: int = 0

    def sparse_spike_k(self) -> int:
        """Fixed per-step index budget for the sparse spike wire, or 0
        (the default) for packed bit planes. Firing is sparse on large
        chips (DVS-gesture: ~364 of 18.7k neurons/step), so shipping up
        to K uint16 indices (+ count, burst planes for steps over K) cuts
        the wire ~2x vs the S/8-byte plane — but the on-device index
        extraction (``jnp.where(size=K)`` over [T, S]) measured +80 ms
        per 500-step DVS chunk on v5e, an order of magnitude more than
        the ~6 ms of transfer it saves at ~60 MB/s, so packed planes win
        on this deployment and sparse is opt-in for links slower than
        ~5 MB/s (SANAFE_TPU_SPARSE_SPIKES=<K>). Requires S >= 16*K so
        the plane is at least ~2x the index rows."""
        k = int(os.environ.get("SANAFE_TPU_SPARSE_SPIKES", "0"))
        s = len(self.compiled.spike_log_slots)
        if k <= 0 or s < 16 * k:
            return 0
        return k

    def sparse_over_rows(self, chunk_len: int) -> int:
        """Burst-plane budget for the sparse spike wire: the chunk program
        proactively ships the packed planes of the M highest-count steps
        (``lax.top_k``) so overflow steps (count > K) resolve from the
        wire instead of a post-hoc device gather. The gather alternative
        queues behind the NEXT chunk's compute on the device stream —
        measured ~300 ms per chunk at DVS scale on the tunneled TPU.
        Tune with SANAFE_TPU_SPARSE_OVER (0 disables)."""
        if not self.sparse_spike_k():
            return 0
        v = os.environ.get("SANAFE_TPU_SPARSE_OVER", "auto")
        m = max(32, chunk_len // 4) if v == "auto" else int(v)
        return min(max(m, 0), chunk_len)

    def init_state(self) -> dict[str, jnp.ndarray]:
        c = self.compiled
        n = c.n_neurons
        dtype = self.dtype
        state = {
            "potential": jnp.asarray(c.initial_potential, dtype=dtype),
            "input_current": jnp.zeros(n, dtype=dtype),
            "refractory": jnp.zeros(n, dtype=jnp.int32),
            "buffer_current": jnp.zeros(n, dtype=dtype),
            "buffer_valid": jnp.zeros(n, dtype=bool),
        }
        if c.has_delay_dendrite:
            state["delay_ring"] = jnp.zeros(
                (c.max_delay + 1, n), dtype=dtype
            )
        if c.has_multitap:
            state["tap_voltages"] = jnp.zeros((n, c.max_taps), dtype=dtype)
        if c.has_plugin_comp:
            state["comp_buffer"] = jnp.zeros(
                (n, c.max_plugin_comp), dtype=dtype
            )
        for spec in c.plugin_specs:
            params = c.plugin_params[spec.name]
            for var, init in spec.state_init.items():
                # state vars sharing a parameter name initialize from the
                # per-neuron attribute values (e.g. HH gating variables)
                if var in params:
                    state[f"plugin_{spec.name}_{var}"] = jnp.asarray(
                        params[var], dtype=dtype
                    )
                else:
                    state[f"plugin_{spec.name}_{var}"] = jnp.full(
                        n, init, dtype=dtype
                    )
        # Shared-unit plugins: member k's stored state must be the shared
        # sequence at offset k (the states of members 0..k-1 have already
        # advanced it when k first updates; plugins/hodgkin_huxley.cpp
        # keeps one state per unit), so pre-advance each member rank times.
        for spec in c.plugin_specs:
            if not spec.shared_unit_state:
                continue
            max_rank = c.plugin_shared_max_stride - 1
            if max_rank <= 0:
                continue
            rank = jnp.asarray(c.plugin_shared_rank)
            params = {
                p: jnp.asarray(v, dtype=dtype)
                for p, v in c.plugin_params[spec.name].items()
            }
            st = {
                var: state[f"plugin_{spec.name}_{var}"]
                for var in spec.state_init
            }
            no_input = jnp.zeros(n, dtype=bool)
            zero_cur = jnp.zeros(n, dtype=dtype)
            for j in range(max_rank):
                advanced, _, _, _ = spec.soma_update(
                    params, st, no_input, zero_cur, 1
                )
                st = {
                    var: jnp.where(rank > j, advanced[var], value)
                    for var, value in st.items()
                }
            for var, value in st.items():
                state[f"plugin_{spec.name}_{var}"] = value
        return state

    def make_scan(self, chunk_len: int, unroll: Optional[int] = None,
                  wire: bool = False, device_sweep: bool = False):
        """Return a function (state, t0) -> (state', outputs) scanning
        ``chunk_len`` timesteps. Timestep indices are 1-based. The chip
        arrays are passed as jit arguments (not baked-in constants) so large
        connectivity blocks stay device-resident buffers instead of being
        inlined into the HLO.

        ``wire=True`` consolidates all per-step outputs into one uint8
        buffer (+ ``wire_layout`` metadata; split with ``decode_wire``) so
        a host pays a single device fetch per chunk — used by
        SpikingChip.sim. The default keeps the named per-step output
        arrays. Wire packing uses bitcast-convert, which XLA cannot lower
        for 64-bit element types on TPU, so it is skipped under
        jax_enable_x64 (the float64 parity path runs on CPU, where
        transfers are cheap anyway)."""
        if unroll is None:
            # Small fused-path chips are kernel-overhead bound: unrolling
            # the scan amortizes per-iteration loop overhead (~25% win).
            # Large chips do real per-step work; keep the HLO small. Cap
            # the unrolled trace size (unroll x chunk_len) so long chunks
            # don't blow up compile time.
            if self.fused_rollup:
                unroll = 16 if chunk_len <= 16384 else 8
            else:
                unroll = 1
        unroll = max(1, min(unroll, chunk_len))
        if chunk_len % unroll:
            unroll = 1

        layout_box: dict = {}

        # Sparse delta mask wire: the fired/updated bit planes dominate the
        # per-chunk wire (4.7 KB/step at DVS scale) on a ~19 MB/s tunnel
        # link, but they are highly redundant — the fired plane is ~2%
        # dense and the updated plane changes by only ~450 bits/step. Ship
        # (a) a nonzero-BYTE presence bitmap over [fired_raw | upd_xor_delta]
        # and (b) the nonzero byte values compacted into one shared
        # per-chunk buffer (scatter-by-prefix-sum, ~0.1 ms/chunk on device).
        # The host rebuilds the exact packed planes (scatter + XOR-cumsum),
        # so every downstream consumer (native sweep, spike rows, exact
        # energy) is byte-identical. Deltas are CHUNK-LOCAL (step 0 XORs
        # against zeros): costs ~2 KB extra per chunk, needs no cross-chunk
        # state. Per-chunk capacity overflow (mw_over) falls back to
        # fetching the dense device-resident masks.
        mask_wire = (
            wire
            and not device_sweep
            and self.record_fired_axons
            and not jax.config.jax_enable_x64
            and os.environ.get("SANAFE_TPU_MASK_WIRE", "1") != "0"
        )
        # per-step value budget, shared across the chunk (mean DVS usage is
        # ~490 B/step; see scripts/measure_mask_wire.py)
        mw_cap = int(os.environ.get("SANAFE_TPU_MASK_WIRE_CAP", "768"))

        sweep_jit = None
        if device_sweep and np.asarray(
            self.compiled.axon_const_processing_latency
        ).min(initial=0.0) < 0.0:
            # Both device tiers retire in-flight messages assuming
            # nondecreasing receive times per destination fleet, which a
            # negative processing latency breaks (the native scheduler's
            # monotone_recv=false path exists for exactly these configs) —
            # route such chips to the exact host sweep.
            device_sweep = False
        if device_sweep:
            # Detailed timing ON DEVICE (opt-in tier): the packed masks
            # feed the vmapped event-loop sweep instead of crossing the
            # host link. Compiled as its OWN jit and composed with the
            # scan at the Python level — fusing both into one XLA program
            # crashes the TPU runtime at DVS scale, and the masks hand-off
            # stays on device either way. The masks are also returned
            # un-wired so the caller can fall back to the exact host sweep
            # if the message-capacity flag trips.
            from .device_sweep import make_device_sweep, unpack_masks

            if os.environ.get("SANAFE_TPU_DEVICE_SWEEP_GEN", "2") == "1":
                # first-generation vmapped event loop (per-lane
                # gather/scatter bound; kept for comparison)
                sweep_fn = make_device_sweep(
                    self.compiled, self.sync_delay, self.dtype
                )
            else:
                # second-generation Pallas merge kernel (exact dynamic
                # order, dense one-hot state updates, per-step host
                # fallback flags)
                from .merge_sweep import make_merge_sweep

                sweep_fn = make_merge_sweep(
                    self.compiled, self.sync_delay
                )
            n_neurons = self.compiled.n_neurons

            @jax.jit
            def sweep_jit(masks_packed):
                fired, updated = unpack_masks(masks_packed, n_neurons)
                return sweep_fn(fired, updated)

        # feed-forward nets factorize by topological level: batched conv
        # delivery over the whole chunk + tiny per-level membrane scans
        # (ops/dag_chunk.py); cyclic/stateful programs take the step scan
        dag_body = None
        from .dag_chunk import make_dag_body, plan_dag

        dag_plan = plan_dag(self)
        if dag_plan is not None:
            dag_body = make_dag_body(self, dag_plan, chunk_len)
        # introspection: which device engine this program compiled to
        # (surfaced as result["device_engine"] by SpikingChip.sim and
        # recorded by bench.py so perf artifacts name the engine measured)
        self.engine = "dag" if dag_body is not None else "scan"
        # scan path, fused-rollup programs: emit planes from the scan and
        # run ONE batched roll-up after it (bit-identical to the DAG
        # engine's; reads the [2N, K] matrix once per chunk, not per step)
        defer_rollup = (
            dag_body is None
            and self.fused_rollup
            and not self.dense_delivery
        )

        @jax.jit
        def run_chunk_inner(arrays, state, t0, feeds):
            ts = t0 + jnp.arange(chunk_len, dtype=jnp.int64)

            if dag_body is not None:
                state, outputs = dag_body(arrays, state, ts, feeds)
            else:
                def body(s, xs):
                    t, step_feeds = xs
                    return _timestep(self, arrays, s, t, step_feeds,
                                     defer_rollup=defer_rollup)

                state, outputs = jax.lax.scan(
                    body, state, (ts, feeds), unroll=unroll
                )
            if defer_rollup:
                from .dag_chunk import rollup_stats

                fired_pl = outputs.pop("fired_plane")
                upd_pl = outputs.pop("upd_plane")
                stats, opt_perf = rollup_stats(
                    self, arrays,
                    fired_pl.astype(self.dtype), upd_pl.astype(self.dtype),
                )
                outputs["stats"] = stats
                if opt_perf is not None:
                    outputs["opt_perf"] = opt_perf
            masks_device = None
            fired_log = outputs.pop("fired_log", None)
            if mask_wire and "masks_packed" in outputs:
                masks_device = outputs.pop("masks_packed")
                fired_b = masks_device[:, 0, :]
                upd_b = masks_device[:, 1, :]
                nb = upd_b.shape[1]
                upd_delta = upd_b ^ jnp.concatenate(
                    [jnp.zeros((1, nb), jnp.uint8), upd_b[:-1]], axis=0
                )
                enc = jnp.concatenate([fired_b, upd_delta], axis=1)
                nz = enc != jnp.uint8(0)
                outputs["mw_presence"] = _packbits2(nz)
                counts = nz.sum(axis=1, dtype=jnp.int32)
                outputs["mw_counts"] = counts
                cap_total = chunk_len * mw_cap
                nzf = nz.reshape(-1)
                pos = jnp.cumsum(nzf.astype(jnp.int32)) - 1
                vals = (
                    jnp.zeros(cap_total, jnp.uint8)
                    .at[jnp.where(nzf, pos, cap_total)]
                    .set(enc.reshape(-1), mode="drop")
                )
                outputs["mw_values"] = vals.reshape(chunk_len, mw_cap)
                outputs["mw_over"] = jnp.broadcast_to(
                    counts.sum() > cap_total, (chunk_len,)
                )
            if sweep_jit is not None:
                masks_device = outputs.pop("masks_packed")
                if self.record_spikes:
                    # masks stay device-resident in sweep mode, so repack
                    # the spike log for the wire (cheap bit ops on device)
                    from .device_sweep import unpack_masks

                    fired_bits, _ = unpack_masks(
                        masks_device, self.compiled.n_neurons
                    )
                    fired_log = fired_bits[:, self.arrays["spike_log_slots"]]
            spikes_device = None
            if fired_log is not None:
                k = self.sparse_spike_k()
                if k:
                    s = fired_log.shape[1]
                    idt = jnp.uint16 if s < 2**16 - 1 else jnp.int32
                    outputs["spike_idx"] = jax.vmap(
                        lambda f: jnp.where(f, size=k, fill_value=s)[0]
                    )(fired_log).astype(idt)
                    outputs["spike_cnt"] = fired_log.sum(
                        axis=1, dtype=jnp.int32
                    )
                    m_over = self.sparse_over_rows(chunk_len)
                    if m_over:
                        # Ship the M highest-count steps' packed planes
                        # with the chunk (self-describing flat record:
                        # [M int32][idx int32 * M][plane uint8 * M*nb]),
                        # so burst steps (count > K) need no post-hoc
                        # device gather — one would queue behind the NEXT
                        # chunk's compute on the device stream.
                        _, top_idx = jax.lax.top_k(
                            outputs["spike_cnt"], m_over
                        )
                        top_idx = jnp.sort(top_idx).astype(jnp.int32)
                        rows = jax.vmap(_packbits)(
                            jnp.take(fired_log, top_idx, axis=0)
                        )
                        hdr = jnp.concatenate([
                            jnp.asarray(
                                np.frombuffer(
                                    np.int32(m_over).tobytes(), np.uint8
                                )
                            ),
                            jax.lax.bitcast_convert_type(
                                top_idx, jnp.uint8
                            ).reshape(-1),
                        ])
                        flat = jnp.concatenate([hdr, rows.reshape(-1)])
                        stride = -(-flat.shape[0] // chunk_len)
                        flat = jnp.pad(
                            flat, (0, stride * chunk_len - flat.shape[0])
                        )
                        outputs["spike_over"] = flat.reshape(
                            chunk_len, stride
                        )
                    if sweep_jit is None:
                        # >M overflow fallback: raw bool rows, gathered
                        # rarely (host packs them); sweep mode falls back
                        # to masks_device instead
                        spikes_device = fired_log
                else:
                    outputs["spike_log_packed"] = jax.vmap(_packbits)(
                        fired_log
                    )
            # Consolidate every per-step [T, ...] output into ONE uint8
            # "wire" buffer so the host pays a single device->host
            # round-trip per chunk (high-latency links charge per tensor).
            if wire and len(outputs) > 1 and not jax.config.jax_enable_x64:
                parts = []
                layout = []
                for key in sorted(outputs):
                    v = outputs[key]
                    if v.dtype == jnp.bool_:
                        b = v.astype(jnp.uint8)
                    else:
                        b = jax.lax.bitcast_convert_type(v, jnp.uint8)
                    b = b.reshape(chunk_len, -1)
                    layout.append((key, v.shape[1:], np.dtype(v.dtype),
                                   b.shape[1]))
                    parts.append(b)
                layout_box["layout"] = tuple(layout)  # static; set at trace
                outputs = {"wire": jnp.concatenate(parts, axis=1)}
            if masks_device is not None:
                # device-resident; only fetched on sweep overflow
                outputs["masks_device"] = masks_device
            if spikes_device is not None:
                # device-resident; only fetched on sparse-spike overflow
                outputs["spikes_device"] = spikes_device
            return state, outputs

        @jax.jit
        def append_sweep_to_wire(w, sim, overflow):
            # one fetch per chunk: the sweep outputs ride the same wire
            # buffer (a separate tensor costs a full link round-trip)
            return jnp.concatenate(
                [
                    w,
                    jax.lax.bitcast_convert_type(sim, jnp.uint8).reshape(
                        chunk_len, -1
                    ),
                    overflow.astype(jnp.uint8).reshape(chunk_len, -1),
                ],
                axis=1,
            )

        def run_chunk(state, t0, feeds=None):
            state, outputs = run_chunk_inner(
                self.arrays, state, t0, feeds or {}
            )
            if "wire" in outputs:
                outputs = dict(outputs)
                outputs["wire_layout"] = layout_box["layout"]
            if sweep_jit is not None:
                sim, overflow = sweep_jit(outputs["masks_device"])
                if "wire" in outputs:
                    outputs["wire"] = append_sweep_to_wire(
                        outputs["wire"], sim, overflow
                    )
                    outputs["wire_layout"] = outputs["wire_layout"] + (
                        ("sim_device", (), np.dtype(sim.dtype),
                         sim.dtype.itemsize),
                        ("sweep_overflow", (), np.dtype(np.bool_), 1),
                    )
                else:
                    outputs["sim_device"] = sim
                    outputs["sweep_overflow"] = overflow
            return state, outputs

        return run_chunk


def decode_wire(buf: np.ndarray, layout) -> dict:
    """Host-side split of the consolidated per-chunk wire buffer back into
    the named per-step output arrays (see make_scan)."""
    out = {}
    T = buf.shape[0]
    off = 0
    for key, shape, dtype, nbytes in layout:
        seg = np.ascontiguousarray(buf[:, off : off + nbytes])
        if dtype == np.bool_:
            arr = seg.astype(bool).reshape((T,) + tuple(shape))
        else:
            arr = seg.view(dtype).reshape((T,) + tuple(shape))
        out[key] = arr
        off += nbytes
    return out


def make_device_program(
    compiled: CompiledChip,
    dtype=None,
    record_fired_axons: bool = False,
    record_potentials: bool = False,
    record_spikes: bool = False,
    record_u: bool = False,
    use_pallas: Optional[bool] = None,
    fuse: bool = True,
) -> DeviceProgram:
    """``fuse=False`` disables the fused roll-up / dense-delivery matvec,
    whose coefficient matrix BAKES the per-neuron cost columns and edge
    weights in at build time — required when a caller (ParameterSweep)
    overrides those arrays per sample and needs the kernel to read them
    from ``arrays`` at run time."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    c = compiled
    if use_pallas is None:
        import os

        # Opt-in: the activity-gated pallas kernel is exact and skips
        # inactive weight blocks, but at DVS-like activity (~60% of blocks
        # live) the compaction overhead roughly cancels the saved HBM
        # traffic. Enable for sparser workloads.
        use_pallas = (
            os.environ.get("SANAFE_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu"
            and dtype == jnp.float32
        )

    def farr(x):
        return jnp.asarray(x, dtype=dtype)

    arrays = {
        # per-neuron
        "core_id": jnp.asarray(c.core_id),
        "soma_model": jnp.asarray(c.soma_model),
        "threshold": farr(c.threshold),
        "reverse_threshold": farr(c.reverse_threshold),
        "reset": farr(c.reset),
        "reverse_reset": farr(c.reverse_reset),
        "reset_mode": jnp.asarray(c.reset_mode),
        "reverse_reset_mode": jnp.asarray(c.reverse_reset_mode),
        "leak_decay": farr(c.leak_decay),
        "input_decay": farr(c.input_decay),
        "bias": farr(c.bias),
        "leak": farr(c.leak),
        "leak_towards_zero": jnp.asarray(c.leak_towards_zero),
        "force_update": jnp.asarray(c.force_update),
        "refractory_delay": jnp.asarray(c.refractory_delay),
        "dendrite_in_neuron_phase": jnp.asarray(c.dendrite_in_neuron_phase),
        "soma_energy_access": farr(c.soma_energy_access),
        "soma_energy_update": farr(c.soma_energy_update),
        "soma_energy_spike": farr(c.soma_energy_spike),
        "soma_lat_access": farr(c.soma_lat_access),
        "soma_lat_update": farr(c.soma_lat_update),
        "soma_lat_spike": farr(c.soma_lat_spike),
        "dendrite_energy_update": farr(c.dendrite_energy_update),
        "dendrite_lat_update": farr(c.dendrite_lat_update),
        "input_train_start": jnp.asarray(c.input_train_start),
        "input_train_len": jnp.asarray(c.input_train_len),
        "input_train_stride": jnp.asarray(c.input_train_stride),
        "input_train_rank": jnp.asarray(c.input_train_rank),
        "input_rate_interval": jnp.asarray(c.input_rate_interval),
        "input_trains": jnp.asarray(
            c.input_trains if c.input_trains.size else np.zeros(1, dtype=bool)
        ),
        # per-axon
        "axon_src_slot": jnp.asarray(c.axon_src_slot),
        "axon_src_core": jnp.asarray(c.axon_src_core),
        "axon_dest_core": jnp.asarray(c.axon_dest_core),
        "axon_fanout": jnp.asarray(c.axon_fanout),
        "axon_hops": jnp.asarray(c.axon_hops),
        "axon_min_hop_delay": farr(c.axon_min_hop_delay),
        "axon_hop_energy": farr(c.axon_hop_energy),
        "axon_energy_in": farr(c.axon_energy_in),
        "axon_energy_out": farr(c.axon_energy_out),
        "axon_latency_out": farr(c.axon_latency_out),
        "axon_const_processing_latency": farr(c.axon_const_processing_latency),
        # per-edge
        "edge_src_slot": jnp.asarray(c.edge_src_slot),
        "edge_dest_slot": jnp.asarray(c.edge_dest_slot),
        "edge_axon": jnp.asarray(c.edge_axon),
        "edge_weight": farr(c.edge_weight),
        "edge_synapse_energy": farr(c.edge_synapse_energy),
        "edge_dendrite_energy": farr(c.edge_dendrite_energy),
        "edge_delay": jnp.asarray(c.edge_delay),
        "edge_tap": jnp.asarray(c.edge_tap),
        "edge_dest_dendrite_model": jnp.asarray(
            c.dendrite_model[c.edge_dest_slot]
            if c.n_edges
            else np.zeros(0, dtype=np.int32)
        ),
        # per-neuron aggregates (see compile.py §7)
        "neuron_n_axons": jnp.asarray(c.neuron_n_axons),
        "neuron_axon_hops": jnp.asarray(c.neuron_axon_hops.astype(np.int32)),
        "neuron_axon_energy": farr(c.neuron_axon_energy),
        "neuron_axon_latency_out": farr(c.neuron_axon_latency_out),
        "neuron_spike_ops": jnp.asarray(
            c.neuron_spike_ops.astype(np.int32)
        ),
        "neuron_synapse_energy": farr(c.neuron_synapse_energy),
        "neuron_msg_dendrite_energy": farr(c.neuron_msg_dendrite_energy),
        # traces
        "spike_log_slots": jnp.asarray(c.spike_log_slots),
        "potential_log_slots": jnp.asarray(c.potential_log_slots),
        "u_log_slots": jnp.asarray(c.u_log_slots),
    }
    if c.lif_noise_values is not None and np.any(c.lif_noise_len > 0):
        arrays["lif_noise_start"] = jnp.asarray(c.lif_noise_start)
        arrays["lif_noise_len"] = jnp.asarray(c.lif_noise_len)
        arrays["lif_noise_stride"] = jnp.asarray(c.lif_noise_stride)
        arrays["lif_noise_rank"] = jnp.asarray(c.lif_noise_rank)
        arrays["lif_noise_values"] = farr(c.lif_noise_values)
    if c.tn_noise_slots is not None and len(c.tn_noise_slots):
        arrays["tn_noise_slots"] = jnp.asarray(c.tn_noise_slots)
    if c.has_poisson:
        arrays["poisson_slots"] = jnp.asarray(
            np.concatenate([members for _, members in c.input_units])
        )
    for spec in c.plugin_specs:
        for param, values in c.plugin_params[spec.name].items():
            arrays[f"plugin_{spec.name}_{param}"] = farr(values)
    if any(spec.shared_unit_state for spec in c.plugin_specs):
        arrays["plugin_shared_stride"] = jnp.asarray(c.plugin_shared_stride)
    if c.perf_col_names:
        arrays["perf_col_fired"] = farr(c.perf_col_fired)
        arrays["perf_col_updated"] = farr(c.perf_col_updated)
        arrays["perf_col_const"] = farr(c.perf_col_const)
    if c.neuron_proc_lat_core is not None:
        arrays["neuron_proc_lat_core"] = farr(c.neuron_proc_lat_core)
        core_onehot = np.zeros((c.n_neurons, c.n_cores), dtype=np.float32)
        core_onehot[np.arange(c.n_neurons), c.core_id] = 1.0
        arrays["core_onehot"] = farr(core_onehot)
    import os

    conv_delivery = None
    if os.environ.get("SANAFE_CONV_DELIVERY", "1") != "0":
        conv_delivery = build_conv_delivery(c)
    if conv_delivery is not None:
        # structured conv path: the block arrays carry only leftover edges
        block = conv_delivery.leftover
        for i, entry in enumerate(conv_delivery.entries):
            arrays[f"conv_kernel_{i}"] = farr(entry[2])
            arrays[f"conv_src_idx_{i}"] = jnp.asarray(
                conv_delivery.in_index[entry[0]]
            )
        arrays["conv_out_gidx"] = jnp.asarray(conv_delivery.out_gidx)
        arrays["conv_out_mask"] = jnp.asarray(conv_delivery.out_mask)
    else:
        block = build_block_delivery(c)
    pallas_delivery = None
    if block is not None:
        arrays["block_counts"] = block.counts
        arrays["block_src_tiles"] = block.src_tiles
        arrays["block_dest_tiles"] = block.dest_tiles
        arrays["block_weights"] = jnp.asarray(block.weights, dtype=dtype)
        if (
            use_pallas
            and conv_delivery is None
            and block.weights.shape[0] > 0
            and block.tile >= 128
        ):
            from .pallas_delivery import make_delivery_fn

            pallas_delivery = make_delivery_fn(block, dtype)
    sync_delay = c.arch.ts_sync_delay_table.get(c.mapped_tiles)
    models_present = frozenset(int(m) for m in np.unique(c.soma_model))
    # The fused roll-up trades one dense [2N, K] read per step for ~20
    # kernel launches; on tunneled/latency-bound deployments the launches
    # cost far more than the extra HBM read, so the budget is generous
    # (DVS-gesture's matrix is ~40 MB = ~50 us of HBM traffic per step,
    # replacing the dozen reduction kernels plus both per-core latency
    # matvecs). float32-only so the float64 parity path keeps the
    # reference's exact accumulation shape.
    n_rollup_cols = 9 + 2 * c.n_cores + len(c.perf_col_names)
    rollup_budget = int(
        os.environ.get("SANAFE_TPU_ROLLUP_BYTES", str(48 << 20))
    )
    fused_rollup = (
        fuse
        and dtype == jnp.float32
        and c.neuron_proc_lat_core is not None
        and 2 * c.n_neurons * n_rollup_cols * 4 <= rollup_budget
    )
    dense_delivery = False
    n_stats_cols = 0
    if fused_rollup:
        rollup, rollup_const = build_rollup_matrix(c)
        n_stats_cols = rollup.shape[1]
        dense_delivery = (
            block is not None
            and pallas_delivery is None
            and 2 * c.n_neurons * (n_stats_cols + 2 * c.n_neurons) * 4
            <= (8 << 20)
        )
        if dense_delivery:
            delivery_cols = build_dense_delivery_columns(c)
            rollup = np.concatenate(
                [
                    rollup,
                    np.concatenate(
                        [delivery_cols, np.zeros_like(delivery_cols)], axis=0
                    ),
                ],
                axis=1,
            )
            rollup_const = np.concatenate(
                [rollup_const, np.zeros(2 * c.n_neurons)]
            )
        arrays["rollup_matrix"] = farr(rollup)
        arrays["rollup_const"] = farr(rollup_const)
        if (
            not dense_delivery
            and block is not None
            and block.weights.shape[0] > 0
            and pallas_delivery is None
            and block.weights.size * 8 <= (16 << 20)
        ):
            # One matmul delivers both the weighted currents and the input
            # counts: [B, tile, 2*tile] = [weights | counts]
            arrays["block_wc"] = jnp.concatenate(
                [
                    arrays["block_weights"],
                    jnp.asarray(block.counts, dtype=dtype),
                ],
                axis=2,
            )
    return DeviceProgram(
        compiled=c,
        dtype=dtype,
        arrays=arrays,
        record_fired_axons=record_fired_axons,
        record_potentials=record_potentials,
        record_spikes=record_spikes,
        record_u=record_u,
        sync_delay=sync_delay,
        block=block,
        pallas_delivery=pallas_delivery,
        conv_delivery=conv_delivery,
        models_present=models_present,
        fused_rollup=fused_rollup,
        dense_delivery=dense_delivery,
        n_stats_cols=n_stats_cols,
    )


def _lif_update(prog: DeviceProgram, a, state, valid, current, t):
    """LoihiLifModel::update vectorized (src/models.cpp:497-567)."""
    dtype = prog.dtype
    v = state["potential"]
    u = state["input_current"]
    refractory = state["refractory"]
    zero = jnp.zeros((), dtype=dtype)

    updated = (
        (jnp.abs(v) > 0.0)
        | valid
        | (jnp.abs(a["bias"]) > 0.0)
        | a["force_update"]
    )
    # No leak on the very first timestep (src/models.cpp:527-532)
    apply_leak = t > 1
    u = jnp.where(apply_leak, u * a["input_decay"], u)
    v = jnp.where(apply_leak, v * a["leak_decay"], v)
    # 64ths fixed-point quantization, truncating toward zero
    # (src/models.cpp:447-455)
    v = jnp.trunc(v * 64.0) / 64.0
    if "lif_noise_values" in a:
        # Replayed noise stream (src/models.cpp:578-651): per unit, each
        # member consumes one masked value per step in slot order
        idx = (t - 1).astype(jnp.int32) * a["lif_noise_stride"] + a[
            "lif_noise_rank"
        ]
        has_noise = a["lif_noise_len"] > 0
        wrapped = jnp.where(
            has_noise, idx % jnp.maximum(a["lif_noise_len"], 1), 0
        )
        noise = a["lif_noise_values"][
            a["lif_noise_start"] + wrapped
        ] * has_noise.astype(prog.dtype)
        v = v + noise

    in_refractory = refractory > 0
    active = ~in_refractory
    u_new = u + jnp.where(valid, current, zero)
    v_new = v + a["bias"] + u_new
    u = jnp.where(active, u_new, u)
    v_active = v_new

    fired = active & (v_active > a["threshold"])
    v_active = jnp.where(
        fired & (a["reset_mode"] == int(NeuronResetMode.HARD)),
        a["reset"],
        v_active,
    )
    v_active = jnp.where(
        fired & (a["reset_mode"] == int(NeuronResetMode.SOFT)),
        v_active - a["threshold"],
        v_active,
    )
    reverse = v_active < a["reverse_threshold"]
    rrm = a["reverse_reset_mode"]
    v_active = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SOFT)),
        v_active - a["reverse_threshold"],
        v_active,
    )
    v_active = jnp.where(
        reverse & (rrm == int(NeuronResetMode.HARD)),
        a["reverse_reset"],
        v_active,
    )
    v_active = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SATURATE)),
        a["reverse_threshold"],
        v_active,
    )
    v = jnp.where(active, v_active, v)

    refractory = jnp.where(fired, a["refractory_delay"], refractory)
    refractory = jnp.maximum(0, refractory - 1)
    return v, u, refractory, updated, fired


def _truenorth_update(prog: DeviceProgram, a, state, valid, current,
                      tn_noise=None):
    """TrueNorthModel::update vectorized (src/models.cpp:799-830).

    ``tn_noise`` carries per-step LFSR draws (glibc rand masked host-side);
    the noisy value is used only for threshold comparisons — resets apply
    to the stored potential (src/models.cpp:745-796).
    """
    dtype = prog.dtype
    v = state["potential"]
    zero = jnp.zeros((), dtype=dtype)
    updated = (
        (jnp.abs(v) > 0.0)
        | valid
        | (jnp.abs(a["bias"]) > 0.0)
        | a["force_update"]
    )
    # Additive leak (src/models.cpp:724-743)
    leak_tz = jnp.where(
        v > 0.0, v - a["leak"], jnp.where(v < 0.0, v + a["leak"], v)
    )
    v = jnp.where(a["leak_towards_zero"], leak_tz, v + a["leak"])
    v = v + a["bias"] + jnp.where(valid, current, zero)

    v_cmp = v if tn_noise is None else v + tn_noise
    fired = v_cmp >= a["threshold"]
    rm = a["reset_mode"]
    v_after = jnp.where(fired & (rm == int(NeuronResetMode.HARD)), a["reset"], v)
    v_after = jnp.where(
        fired & (rm == int(NeuronResetMode.SOFT)), v - a["threshold"], v_after
    )
    v_after = jnp.where(
        fired & (rm == int(NeuronResetMode.SATURATE)), a["threshold"], v_after
    )
    reverse = (~fired) & (v_cmp <= a["reverse_threshold"])
    rrm = a["reverse_reset_mode"]
    v_after = jnp.where(
        reverse & (rrm == int(NeuronResetMode.HARD)), a["reverse_reset"], v_after
    )
    v_after = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SOFT)),
        v + a["reverse_threshold"],
        v_after,
    )
    v_after = jnp.where(
        reverse & (rrm == int(NeuronResetMode.SATURATE)),
        a["reverse_threshold"],
        v_after,
    )
    return v_after, updated, fired


def _input_update(prog: DeviceProgram, a, t):
    """InputModel::update vectorized (src/models.cpp:863-903).

    Spike trains replicate the shared-iterator semantics: index advances by
    the number of neurons sharing the unit each timestep. Poisson inputs are
    precomputed host-side (see chip.py) and folded into the train arrays.
    """
    idx = (t - 1) * a["input_train_stride"].astype(jnp.int64) + a[
        "input_train_rank"
    ]
    in_range = idx < a["input_train_len"]
    gather_idx = jnp.clip(a["input_train_start"] + idx, 0, None)
    gather_idx = jnp.minimum(
        gather_idx, a["input_trains"].shape[0] - 1
    ).astype(jnp.int32)
    spike = in_range & a["input_trains"][gather_idx]
    interval = a["input_rate_interval"]
    rate_spike = (interval > 0) & ((t % jnp.maximum(interval, 1)) == 0)
    return spike | rate_spike


def _timestep(prog: DeviceProgram, arrays, state, t, feeds=None,
              defer_rollup=False):
    """One full hardware timestep (neuron phase → axon/message phase →
    energy/counter/timing roll-up). ``feeds`` carries per-step host inputs
    (TrueNorth LFSR draws, Poisson spikes).

    ``defer_rollup=True`` (fused-rollup programs only): emit the raw
    fired/updated planes instead of per-step stats so the caller can run
    ONE batched [T, 2N] @ [2N, K] roll-up for the whole chunk
    (ops/dag_chunk.py ``rollup_stats``) — the coefficient matrix is then
    read from HBM once per chunk instead of once per step, and the stats
    are bit-identical to the DAG engine's."""
    feeds = feeds or {}
    a = arrays
    c = prog.compiled
    dtype = prog.dtype
    n = c.n_neurons
    zero = jnp.zeros((), dtype=dtype)

    valid = state["buffer_valid"]
    current = state["buffer_current"]

    # Model paths are statically gated on the models actually present so
    # absent ones never contribute kernels to the traced step.
    present = prog.models_present or frozenset(
        int(m) for m in np.unique(c.soma_model)
    )
    potential = state["potential"]
    input_current = state["input_current"]
    refractory = state["refractory"]
    fired = jnp.zeros(n, dtype=bool)
    updated = jnp.zeros(n, dtype=bool)

    if SOMA_MODEL_LIF in present:
        is_lif = a["soma_model"] == SOMA_MODEL_LIF
        v_lif, u_lif, refr_lif, upd_lif, fired_lif = _lif_update(
            prog, a, state, valid, current, t
        )
        potential = jnp.where(is_lif, v_lif, potential)
        input_current = jnp.where(is_lif, u_lif, input_current)
        refractory = jnp.where(is_lif, refr_lif, refractory)
        fired = fired | (is_lif & fired_lif)
        updated = updated | (is_lif & upd_lif)
    if SOMA_MODEL_TRUENORTH in present:
        is_tn = a["soma_model"] == SOMA_MODEL_TRUENORTH
        tn_noise = None
        if "tn_noise" in feeds:
            tn_noise = (
                jnp.zeros(n, dtype=dtype)
                .at[a["tn_noise_slots"]]
                .set(feeds["tn_noise"].astype(dtype))
            )
        v_tn, upd_tn, fired_tn = _truenorth_update(
            prog, a, state, valid, current, tn_noise
        )
        potential = jnp.where(is_tn, v_tn, potential)
        fired = fired | (is_tn & fired_tn)
        updated = updated | (is_tn & upd_tn)
    if SOMA_MODEL_INPUT in present:
        is_input = a["soma_model"] == SOMA_MODEL_INPUT
        fired_input = _input_update(prog, a, t)
        if "poisson" in feeds:
            fired_input = fired_input | (
                jnp.zeros(n, dtype=bool)
                .at[a["poisson_slots"]]
                .set(feeds["poisson"])
            )
        fired = fired | (is_input & fired_input)

    plugin_state_updates = {}
    for spec in c.plugin_specs:
        is_this = a["soma_model"] == spec.soma_model_id
        params = {
            param: a[f"plugin_{spec.name}_{param}"]
            for param in spec.param_defaults
        }
        plugin_state = {
            var: state[f"plugin_{spec.name}_{var}"]
            for var in spec.state_init
        }
        if spec.dendrite_compartments > 0:
            comp = state["comp_buffer"][:, : spec.dendrite_compartments]
            new_plugin_state, p_fired, p_updated, p_potential = (
                spec.soma_update(params, plugin_state, valid, current, t,
                                 comp)
            )
        else:
            new_plugin_state, p_fired, p_updated, p_potential = (
                spec.soma_update(params, plugin_state, valid, current, t)
            )
        if spec.shared_unit_state and c.plugin_shared_max_stride > 1:
            # Shared-unit plugins: the unit is updated once per member per
            # timestep, so each member's stored state advances stride
            # applications total; fired/updated come from its own (first)
            # application. Members with smaller units freeze early.
            stride = a["plugin_shared_stride"]
            st = new_plugin_state
            for j in range(c.plugin_shared_max_stride - 1):
                advanced, _, _, _ = spec.soma_update(
                    params, st, valid, current, t
                )
                st = {
                    var: jnp.where(stride - 1 > j, advanced[var], value)
                    for var, value in st.items()
                }
            new_plugin_state = st
        for var, value in new_plugin_state.items():
            key = f"plugin_{spec.name}_{var}"
            plugin_state_updates[key] = jnp.where(
                is_this, value, state[key]
            )
        fired = fired | (is_this & p_fired)
        updated = updated | (is_this & p_updated.astype(bool))
        potential = jnp.where(is_this, p_potential, potential)

    updated_or_fired = updated | fired

    fired_f = fired.astype(dtype)

    # --- message phase: spike delivery ---
    if prog.dense_delivery:
        # Message phase + roll-up as ONE matvec: the roll-up matrix carries
        # the dense weight/count delivery columns (build_rollup_matrix,
        # build_dense_delivery_columns).
        upd_f = updated_or_fired.astype(dtype)
        lhs = jnp.concatenate([fired_f, upd_f])
        r = lhs @ a["rollup_matrix"] + a["rollup_const"]
        K = prog.n_stats_cols
        n_cores = c.n_cores
        lat0, msg0 = 9, 9 + n_cores
        opt0 = msg0 + n_cores
        total_energy = r[5] + r[6] + r[7] + r[8]
        sim_time = jnp.maximum(
            jnp.max(r[lat0:msg0]), jnp.max(r[msg0:opt0])
        ) + jnp.asarray(prog.sync_delay, dtype=dtype)
        stats = jnp.concatenate(
            [r[:9], jnp.stack([total_energy, sim_time])]
        )
        opt_perf = r[opt0:K] if "perf_col_fired" in a else None
        buffer_current = r[K : K + n]
        any_input = r[K + n :] > 0
        state_delay_ring = None
        state_tap_voltages = None
        state_comp_buffer = None
    elif prog.conv_delivery is not None:
        # Structured conv delivery (ConvDelivery): each conv2d hyperedge is
        # ONE strided convolution; leftover unstructured edges (if any) add
        # their block-matmul contribution on top.
        buffer_current, any_input = _conv_deliver(prog, a, fired_f, dtype)
        if prog.block is not None and prog.block.weights.shape[0] > 0:
            blk_cur, blk_any = _block_deliver(prog, a, fired, fired_f,
                                              dtype, n)
            buffer_current = buffer_current + blk_cur
            any_input = any_input | blk_any
        state_delay_ring = None
        state_tap_voltages = None
        state_comp_buffer = None
    elif prog.block is not None:
        buffer_current, any_input = _block_deliver(prog, a, fired, fired_f,
                                                   dtype, n)
        state_delay_ring = None
        state_tap_voltages = None
        state_comp_buffer = None
    else:
        (
            buffer_current,
            any_input,
            state_delay_ring,
            state_tap_voltages,
            state_comp_buffer,
        ) = _scatter_delivery(prog, a, c, state, fired, dtype, n)

    if prog.dense_delivery:
        pass  # stats/opt_perf already computed in the combined matvec
    elif prog.fused_rollup and defer_rollup:
        # roll-up deferred to one batched matmul after the scan (see
        # docstring); the planes ride the scan outputs instead
        stats = None
        opt_perf = None
    elif prog.fused_rollup:
        # --- fused roll-up: every counter/energy/latency reduction as one
        # matvec against the precomputed coefficient matrix (see
        # build_rollup_matrix). Column order matches the stats rows.
        upd_f = updated_or_fired.astype(dtype)
        lhs = jnp.concatenate([fired_f, upd_f])
        r = lhs @ a["rollup_matrix"] + a["rollup_const"]
        n_cores = c.n_cores
        lat0, msg0 = 9, 9 + n_cores
        opt0 = msg0 + n_cores
        total_energy = r[5] + r[6] + r[7] + r[8]
        sim_time = jnp.maximum(
            jnp.max(r[lat0:msg0]), jnp.max(r[msg0:opt0])
        ) + jnp.asarray(prog.sync_delay, dtype=dtype)
        stats = jnp.concatenate(
            [r[:9], jnp.stack([total_energy, sim_time])]
        )
        opt_perf = r[opt0:] if "perf_col_fired" in a else None
    else:
        # --- counters & energy roll-up from per-neuron aggregates
        # (src/chip.cpp:1028-1051,1171-1261); axon-phase counters use
        # per-neuron aggregates since a neuron's axons all fire together
        # (src/chip.cpp:802-834) ---
        packets = jnp.sum(fired * a["neuron_n_axons"], dtype=jnp.int64)
        total_hops = jnp.sum(fired * a["neuron_axon_hops"], dtype=jnp.int64)
        spike_ops = jnp.sum(fired * a["neuron_spike_ops"], dtype=jnp.int64)
        neurons_updated = jnp.sum(updated_or_fired, dtype=jnp.int64)
        neurons_fired = jnp.sum(fired, dtype=jnp.int64)

        zero_ = zero
        synapse_energy = jnp.sum(fired_f * a["neuron_synapse_energy"])
        dendrite_energy = jnp.sum(
            fired_f * a["neuron_msg_dendrite_energy"]
        ) + jnp.sum(
            jnp.where(
                a["dendrite_in_neuron_phase"], a["dendrite_energy_update"],
                zero_,
            )
        )
        soma_energy = (
            jnp.sum(a["soma_energy_access"])
            + jnp.sum(
                jnp.where(updated_or_fired, a["soma_energy_update"], zero_)
            )
            + jnp.sum(jnp.where(fired, a["soma_energy_spike"], zero_))
        )
        network_energy = jnp.sum(fired_f * a["neuron_axon_energy"])
        total_energy = (
            synapse_energy + dendrite_energy + soma_energy + network_energy
        )

        # --- simple timing model (src/schedule.cpp:61-102) ---
        neuron_lat = (
            a["soma_lat_access"]
            + jnp.where(updated_or_fired, a["soma_lat_update"], zero_)
            + jnp.where(fired, a["soma_lat_spike"], zero_)
            + jnp.where(
                a["dendrite_in_neuron_phase"], a["dendrite_lat_update"], zero_
            )
        )
        n_cores = c.n_cores
        gen_lat = neuron_lat + fired_f * a["neuron_axon_latency_out"]
        if "core_onehot" in a:
            neuron_lat_core = gen_lat @ a["core_onehot"]
            msg_lat_core = fired_f @ a["neuron_proc_lat_core"]
        else:
            neuron_lat_core = _segment_sum(gen_lat, a["core_id"], n_cores)
            fired_axon_f = fired_f[a["axon_src_slot"]]
            msg_lat_core = _segment_sum(
                fired_axon_f * a["axon_const_processing_latency"],
                a["axon_dest_core"],
                n_cores,
            )
        sim_time = jnp.maximum(
            jnp.max(neuron_lat_core), jnp.max(msg_lat_core)
        ) + jnp.asarray(prog.sync_delay, dtype=dtype)
        stats = jnp.stack(
            [
                spike_ops.astype(dtype),
                packets.astype(dtype),
                total_hops.astype(dtype),
                neurons_updated.astype(dtype),
                neurons_fired.astype(dtype),
                synapse_energy.astype(dtype),
                dendrite_energy.astype(dtype),
                soma_energy.astype(dtype),
                network_energy.astype(dtype),
                total_energy.astype(dtype),
                sim_time.astype(dtype),
            ]
        )
        if "perf_col_fired" in a:
            # optional per-tile/core/unit perf columns
            opt_perf = (
                fired_f @ a["perf_col_fired"]
                + updated_or_fired.astype(dtype) @ a["perf_col_updated"]
                + a["perf_col_const"]
            )
        else:
            opt_perf = None

    new_state = {
        "potential": potential,
        "input_current": input_current,
        "refractory": refractory,
        "buffer_current": buffer_current,
        "buffer_valid": any_input,
    }
    if state_delay_ring is not None:
        new_state["delay_ring"] = state_delay_ring
    if state_tap_voltages is not None:
        new_state["tap_voltages"] = state_tap_voltages
    if state_comp_buffer is not None:
        new_state["comp_buffer"] = state_comp_buffer
    new_state.update(plugin_state_updates)

    # Outputs are consolidated into as few tensors as possible: each fetched
    # array pays host-link latency (and the link can stall), and bool
    # tensors take a pathological transfer path. One stats tensor in the
    # program dtype carries everything (counters are exact: < 2^24 per step
    # in float32 programs, < 2^53 in float64).
    if stats is None:
        # deferred roll-up: the chunk runner computes stats/opt_perf from
        # these planes in one batched matmul (dag_chunk.rollup_stats)
        outputs = {"fired_plane": fired, "upd_plane": updated_or_fired}
    else:
        outputs = {"stats": stats}
    if opt_perf is not None:
        # optional per-tile/core/unit perf columns (log_energy/log_latency)
        outputs["opt_perf"] = opt_perf
    if prog.record_spikes and not prog.record_fired_axons:
        # when the fired masks are already streamed (detailed timing), the
        # host derives the spike log from them instead of paying a second
        # per-step transfer (chip.py _process_chunk_outputs).
        fired_log = fired[a["spike_log_slots"]]
        if prog.sparse_spike_k():
            # raw bool row leaves the scan; index extraction happens once
            # post-scan over the whole [T, S] block
            outputs["fired_log"] = fired_log
        else:
            # default: pack to the S/8-byte plane inside the step (packing
            # in-scan stacks 2.3 KB/step instead of an 18 KB bool row —
            # measured 210 vs 230 ms per 500-step DVS chunk on v5e)
            outputs["spike_log_packed"] = _packbits(fired_log)
    if prog.record_potentials:
        outputs["potential_log"] = potential[a["potential_log_slots"]]
    if prog.record_u:
        outputs["u_log"] = input_current[a["u_log_slots"]]
    if prog.record_fired_axons:
        # Bit-packed fired + updated masks in one tensor; the host unpacks
        # and recomputes per-neuron generation latencies in float64.
        outputs["masks_packed"] = _packbits2(
            jnp.stack([fired, updated_or_fired])
        )

    return new_state, outputs


_BIT_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.uint8)


def _packbits(bits):
    """Pack a 1-D bool vector into uint8 bytes (np.unpackbits layout)."""
    n = bits.shape[0]
    n_pad = -(-n // 8) * 8
    padded = jnp.zeros(n_pad, dtype=jnp.uint8).at[:n].set(
        bits.astype(jnp.uint8)
    )
    return (
        padded.reshape(-1, 8) * jnp.asarray(_BIT_WEIGHTS)
    ).sum(axis=1, dtype=jnp.uint8)


def _packbits2(bits):
    """Pack a [R, n] bool matrix into [R, nbytes] uint8 rows in one op."""
    rows, n = bits.shape
    n_pad = -(-n // 8) * 8
    padded = jnp.zeros((rows, n_pad), dtype=jnp.uint8).at[:, :n].set(
        bits.astype(jnp.uint8)
    )
    return (
        padded.reshape(rows, -1, 8) * jnp.asarray(_BIT_WEIGHTS)
    ).sum(axis=2, dtype=jnp.uint8)


def _block_deliver(prog, a, fired, fired_f, dtype, n):
    """MXU block-dense matmul delivery (no per-edge gathers/scatters).
    Returns (buffer_current [n], any_input [n] bool)."""
    blk = prog.block
    fired_pad = jnp.zeros(blk.n_pad, dtype=dtype).at[:n].set(fired_f)
    tiles_f = fired_pad.reshape(blk.n_tiles, blk.tile)
    if blk.weights.shape[0] == 0:
        return (
            jnp.zeros(n, dtype=dtype),
            jnp.zeros(n, dtype=bool),
        )
    if "block_wc" in a:
        # Single matmul delivers weighted currents and input counts
        # together ([weights | counts] columns), halving the dot +
        # segment-sum kernel count on small chips.
        xs = tiles_f[a["block_src_tiles"]]
        y = jnp.einsum(
            "bi,bij->bj", xs, a["block_wc"],
            preferred_element_type=dtype,
        )
        acc_wc = jax.ops.segment_sum(
            y,
            a["block_dest_tiles"],
            num_segments=blk.n_tiles,
            indices_are_sorted=True,
        )
        return (
            acc_wc[:, : blk.tile].reshape(-1)[:n],
            acc_wc[:, blk.tile :].reshape(-1)[:n] > 0,
        )
    if prog.pallas_delivery is not None:
        # activity-gated pallas kernel: inactive weight blocks are never
        # fetched from HBM
        acc = prog.pallas_delivery(tiles_f, a["block_weights"])
    else:
        xs = tiles_f[a["block_src_tiles"]]  # [B, tile] gather
        y = jnp.einsum(
            "bi,bij->bj", xs, a["block_weights"],
            preferred_element_type=dtype,
        )
        acc = jax.ops.segment_sum(
            y,
            a["block_dest_tiles"],
            num_segments=blk.n_tiles,
            indices_are_sorted=True,
        )
    buffer_current = acc.reshape(-1)[:n]
    fired_pad_i8 = (
        jnp.zeros(blk.n_pad, dtype=jnp.int8).at[:n].set(fired.astype(jnp.int8))
    )
    xi = fired_pad_i8.reshape(blk.n_tiles, blk.tile)[a["block_src_tiles"]]
    cnt = jax.lax.dot_general(
        xi,
        a["block_counts"],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    cnt_acc = jax.ops.segment_sum(
        cnt,
        a["block_dest_tiles"],
        num_segments=blk.n_tiles,
        indices_are_sorted=True,
    )
    return buffer_current, cnt_acc.reshape(-1)[:n] > 0


def _conv_deliver(prog, a, fired_f, dtype):
    """Structured conv delivery: one strided convolution per conv2d
    hyperedge (see ConvSpec / ConvDelivery). Returns (buffer_current [n],
    any_input [n] bool) covering the conv-generated edges only."""
    cd = prog.conv_delivery
    results: dict[str, tuple] = {}
    for i, entry in enumerate(cd.entries):
        src_g, dst_g, _, strides, (cin, h, w), (cout, oh, ow) = entry
        x = fired_f[a[f"conv_src_idx_{i}"]]
        x = x.reshape(1, cin, h, w)
        # kernel is HWIO with an appended all-ones output channel: channel
        # `cout` is each destination position's arrival count
        y = jax.lax.conv_general_dilated(
            x,
            a[f"conv_kernel_{i}"],
            window_strides=strides,
            padding="VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        cur = y[:cout].reshape(-1)
        cnt = jnp.broadcast_to(y[cout], (cout, oh, ow)).reshape(-1)
        if dst_g in results:
            pc, pn = results[dst_g]
            results[dst_g] = (pc + cur, pn + cnt)
        else:
            results[dst_g] = (cur, cnt)
    # Concatenate the per-group results in dest_order and invert the slot
    # permutation with ONE gather + mask (slot-run slicing fragments into
    # ~1700 pieces per step at DVS scale); currents and arrival counts
    # share the index, so they gather together as two rows.
    parts_cur = [results[g][0] for g in cd.dest_order]
    parts_cnt = [results[g][1] for g in cd.dest_order]
    g_all = jnp.stack(
        [
            parts_cur[0] if len(parts_cur) == 1
            else jnp.concatenate(parts_cur),
            parts_cnt[0] if len(parts_cnt) == 1
            else jnp.concatenate(parts_cnt),
        ]
    )
    mask = a["conv_out_mask"]
    picked = g_all[:, a["conv_out_gidx"]]
    buffer_current = jnp.where(mask, picked[0], jnp.zeros((), dtype=dtype))
    any_input = mask & (picked[1] > 0)
    return buffer_current, any_input


def _scatter_delivery(prog, a, c, state, fired, dtype, n):
    """Per-edge scatter delivery, used for models with per-edge state
    (delay rings, dendritic taps). Small nets only; large conv nets take
    the block-matmul path."""
    fired_axon = fired[a["axon_src_slot"]]
    active_edge = fired_axon[a["edge_axon"]]
    active_edge_f = active_edge.astype(dtype)
    contribution = a["edge_weight"] * active_edge_f
    any_input = (
        _segment_sum(active_edge.astype(jnp.int32), a["edge_dest_slot"], n) > 0
        if c.n_edges
        else jnp.zeros(n, dtype=bool)
    )

    is_delay_edge = (
        a["edge_dest_dendrite_model"] == DENDRITE_MODEL_ACCUMULATOR_DELAY
    )
    is_tap_edge = a["edge_dest_dendrite_model"] == DENDRITE_MODEL_MULTITAP
    is_comp_edge = (
        a["edge_dest_dendrite_model"] == DENDRITE_MODEL_PLUGIN_COMP
    )
    immediate = contribution * (
        ~(is_delay_edge | is_tap_edge | is_comp_edge)
    ).astype(dtype)
    buffer_current = (
        _segment_sum(immediate, a["edge_dest_slot"], n)
        if c.n_edges
        else jnp.zeros(n, dtype=dtype)
    )

    if c.has_delay_dendrite:
        # AccumulatorWithDelayModel (src/models.cpp:96-131): shift the ring,
        # deliver slot 0, scatter arrivals into their delay slots. The
        # delivered value only reaches the soma when a message arrives (the
        # timestep buffer is written per synaptic access).
        ring = state["delay_ring"]
        delivered = ring[0]
        ring = jnp.concatenate(
            [ring[1:], jnp.zeros((1, n), dtype=dtype)], axis=0
        )
        delay_contrib = contribution * is_delay_edge.astype(dtype)
        flat_idx = (
            a["edge_delay"].astype(jnp.int32) * n + a["edge_dest_slot"]
        )
        ring = ring + _segment_sum(
            delay_contrib, flat_idx, (c.max_delay + 1) * n
        ).reshape(c.max_delay + 1, n)
        is_delay_dest = (
            jnp.asarray(c.dendrite_model) == DENDRITE_MODEL_ACCUMULATOR_DELAY
        )
        buffer_current = jnp.where(
            is_delay_dest & any_input, delivered, buffer_current
        )
        state_delay_ring = ring
    else:
        state_delay_ring = None

    if c.has_multitap:
        # MultiTapModel1D (src/models.cpp:167-259): RC-cable update then
        # input scatter into taps; proximal tap 0 is the output.
        taps = state["tap_voltages"]  # [N, T]
        tc = jnp.asarray(c.tap_time_constants, dtype=dtype)
        sc = jnp.asarray(c.tap_space_constants, dtype=dtype)
        next_v = taps * tc
        if c.max_taps > 1:
            # flows between neighboring taps
            proximal = taps[:, 1:] * sc  # current from tap k+1 to tap k
            distal = taps[:, :-1] * sc  # current from tap k to tap k+1
            next_v = next_v.at[:, :-1].add(proximal)
            next_v = next_v.at[:, 1:].add(-proximal)
            next_v = next_v.at[:, 1:].add(distal)
            next_v = next_v.at[:, :-1].add(-distal)
        tap_contrib = contribution * is_tap_edge.astype(dtype)
        t_max = c.max_taps
        flat_tap_idx = a["edge_dest_slot"] * t_max + jnp.minimum(
            a["edge_tap"], t_max - 1
        )
        next_v = next_v + _segment_sum(
            tap_contrib, flat_tap_idx, n * t_max
        ).reshape(n, t_max)
        is_tap_dest = jnp.asarray(c.dendrite_model) == DENDRITE_MODEL_MULTITAP
        buffer_current = jnp.where(
            is_tap_dest & any_input, next_v[:, 0], buffer_current
        )
        state_tap_voltages = next_v
    else:
        state_tap_voltages = None

    if c.has_plugin_comp:
        # Double-buffered plugin compartments (plugins/neurofem.cpp:200-250):
        # this step's arrivals land in a fresh buffer consumed next step
        k_max = c.max_plugin_comp
        comp_contrib = contribution * is_comp_edge.astype(dtype)
        flat_comp_idx = a["edge_dest_slot"] * k_max + jnp.minimum(
            a["edge_tap"], k_max - 1
        )
        state_comp_buffer = _segment_sum(
            comp_contrib, flat_comp_idx, n * k_max
        ).reshape(n, k_max)
    else:
        state_comp_buffer = None

    return (
        buffer_current,
        any_input,
        state_delay_ring,
        state_tap_voltages,
        state_comp_buffer,
    )
