"""Whole-chunk Pallas TPU kernel: thousands of timesteps per kernel launch.

The XLA ``lax.scan`` step (ops/step.py) costs ~7 us/iteration on small
chips — not compute, just per-iteration kernel dispatch inside the scan
loop. This module runs the ENTIRE chunk inside one Pallas kernel with the
chip state resident in VMEM, so a timestep costs its actual arithmetic
(~0.1-0.3 us): an elementwise soma update over ``[1, Npad]`` VPU rows plus
ONE MXU matvec against an extended roll-up matrix whose lane-aligned
column groups simultaneously yield

- the 9 stats counters/energies (lanes 0..8 of group 0),
- per-core neuron/message latency sums (the simple timing model,
  reference ``src/schedule.cpp:61-102``),
- the dense spike-delivery currents and arrival counts (the message
  phase, reference ``src/chip.cpp:656-708``),
- the fired/updated masks bit-packed into bytes (columns of powers of
  two), and optionally the spike-log bytes,

i.e. message phase + energy roll-up + timing + trace packing are all the
same matmul. Counters accumulate on-device in int32 (exact), energies and
sim_time in compensated (Kahan) float32, so the host fetches ~100 bytes of
sums plus the packed per-step masks per chunk instead of a [T, 11] stats
tensor — the device link (a high-latency tunnel in some deployments) stops
being the bottleneck.

Eligibility mirrors the fused dense-delivery path (small chips, built-in
LIF/TrueNorth/Input models); everything else falls back to the XLA scan.
Stochastic/deterministic per-step inputs (input spike trains, Poisson
draws, LIF noise streams, TrueNorth LFSR draws — reference
``src/models.cpp:578-651,745-760,832-903``) are precomputed OUTSIDE the
kernel as dense [T, Npad] "planes" by vectorized XLA (cheap: only the few
input/noisy neurons are gathered) and streamed in as blocked operands.

This float32/TPU path trades the reference's float64 accumulation order
for on-device sums; the float64 parity path never uses it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..arch import NeuronResetMode
from ..models import SOMA_MODEL_INPUT, SOMA_MODEL_LIF, SOMA_MODEL_TRUENORTH

LANE = 128
# Per-step rows written to the output block; the grid walks TS-step blocks.
DEFAULT_TS = 256

# Parameter-plane row indices ([P_ROWS, Npad] float32 operand)
(
    P_BIAS, P_LEAK_DECAY, P_INPUT_DECAY, P_THRESH, P_RTHRESH, P_RESET,
    P_RRESET, P_REFR_DELAY, P_FORCE, P_IS_LIF, P_IS_TN, P_IS_INPUT,
    P_LEAK, P_LEAK_TZ, P_RM_HARD, P_RM_SOFT, P_RM_SAT, P_RRM_HARD,
    P_RRM_SOFT, P_RRM_SAT,
) = range(20)
P_ROWS = 24  # padded to a multiple of 8 sublanes

# State rows ([8, Npad] float32): potential, input_current, refractory,
# buffer_current, buffer_valid
S_V, S_U, S_REFR, S_CUR, S_VALID = range(5)
S_ROWS = 8

MAX_MATRIX_BYTES = 5 << 20  # VMEM budget for the extended matrix


def _pad_lane(x: int) -> int:
    return -(-x // LANE) * LANE


@dataclass
class ChunkPlan:
    """Static layout of the extended matrix + planes for one program."""

    n: int
    npad: int
    nbytes: int  # mask bytes per row (npad // 8)
    n_cores: int
    matrix: np.ndarray  # [2*npad, M] float32
    const: np.ndarray  # [1, M] float32
    params: np.ndarray  # [P_ROWS, npad] float32
    # column-group lane offsets (all multiples of LANE)
    g_lat: int
    g_msg: int
    g_deliver: int
    g_count: int
    g_pack_fired: int
    g_pack_upd: int
    g_spike: int  # -1 when spike logging off
    sbytes: int
    m_cols: int
    # log selection matvec [2*npad, L] (potential | u columns), or None
    log_sel: Optional[np.ndarray]
    n_plog: int
    n_ulog: int
    # per-step input planes
    need_spike_plane: bool
    need_add_plane: bool
    sync_delay: float
    models: frozenset
    # out-row layout (lane offsets in the per-step f32 output row)
    o_masks: int
    o_spike: int
    o_log: int
    out_cols: int


def plan_chunk(prog) -> Optional[ChunkPlan]:
    """Build the static plan, or None if this program is ineligible."""
    c = prog.compiled
    if prog.dtype != jnp.float32:
        return None
    if not prog.dense_delivery:
        return None
    if c.plugin_specs:
        return None
    builtin = {SOMA_MODEL_LIF, SOMA_MODEL_TRUENORTH, SOMA_MODEL_INPUT}
    if not set(prog.models_present) <= builtin:
        return None
    n = c.n_neurons
    n_cores = c.n_cores
    if n_cores > LANE:
        return None
    npad = _pad_lane(max(n, 1))
    nbytes = -(-n // 8)  # only real neurons get packed/transferred
    if nbytes > LANE:  # keep each pack group within one lane block
        return None
    sbytes = 0
    g_spike = -1
    if prog.record_spikes:
        sbytes = -(-len(c.spike_log_slots) // 8)
        if sbytes > LANE:
            return None
    n_plog = len(c.potential_log_slots) if prog.record_potentials else 0
    n_ulog = len(c.u_log_slots) if prog.record_u else 0
    if n_plog + n_ulog > LANE:
        return None

    # --- column layout (each group starts on a lane boundary) ---
    g_lat = LANE
    g_msg = 2 * LANE
    g_deliver = 3 * LANE
    g_count = g_deliver + npad
    g_pack_fired = g_count + npad
    g_pack_upd = g_pack_fired + LANE
    m_cols = g_pack_upd + LANE
    if prog.record_spikes:
        g_spike = m_cols
        m_cols += LANE
    if 2 * npad * m_cols * 4 > MAX_MATRIX_BYTES:
        return None

    f64 = np.float64
    F = np.zeros((npad, m_cols), dtype=f64)  # fired coefficients
    U = np.zeros((npad, m_cols), dtype=f64)  # updated|fired coefficients
    const = np.zeros((1, m_cols), dtype=f64)

    # group 0: stats lanes — KEEP IN SYNC with ops/step.py
    # build_rollup_matrix rows 0..8 (adding/reordering a stats column
    # must change both builders and the _timestep fused branches)
    F[:n, 0] = c.neuron_spike_ops
    F[:n, 1] = c.neuron_n_axons
    F[:n, 2] = c.neuron_axon_hops
    U[:n, 3] = 1.0
    F[:n, 4] = 1.0
    F[:n, 5] = c.neuron_synapse_energy
    F[:n, 6] = c.neuron_msg_dendrite_energy
    F[:n, 7] = c.soma_energy_spike
    U[:n, 7] = c.soma_energy_update
    F[:n, 8] = c.neuron_axon_energy
    const[0, 6] = float(
        np.sum(
            np.where(c.dendrite_in_neuron_phase, c.dendrite_energy_update, 0.0)
        )
    )
    const[0, 7] = float(np.sum(c.soma_energy_access))

    # groups 1-2: per-core latency sums (simple timing model)
    onehot = np.zeros((n, n_cores), dtype=f64)
    onehot[np.arange(n), c.core_id] = 1.0
    gen_const = c.soma_lat_access + np.where(
        c.dendrite_in_neuron_phase, c.dendrite_lat_update, 0.0
    )
    F[:n, g_lat : g_lat + n_cores] = (
        (c.soma_lat_spike + c.neuron_axon_latency_out)[:, None] * onehot
    )
    U[:n, g_lat : g_lat + n_cores] = c.soma_lat_update[:, None] * onehot
    const[0, g_lat : g_lat + n_cores] = gen_const @ onehot
    F[:n, g_msg : g_msg + n_cores] = c.neuron_proc_lat_core

    # groups 3-4: dense delivery (weights / arrival counts)
    if c.n_edges:
        src = c.axon_src_slot[c.edge_axon]
        dst = c.edge_dest_slot
        np.add.at(F, (src, g_deliver + dst), c.edge_weight)
        np.add.at(F, (src, g_count + dst), 1.0)

    # groups 5-6: bit-packing columns (np.unpackbits MSB-first order);
    # padded lanes can never fire, so only real neurons get pack entries
    rows = np.arange(n)
    F[rows, g_pack_fired + rows // 8] += 2.0 ** (7 - rows % 8)
    U[rows, g_pack_upd + rows // 8] += 2.0 ** (7 - rows % 8)
    # group 7: spike-log bytes
    if prog.record_spikes:
        slots = np.asarray(c.spike_log_slots)
        for j, slot in enumerate(slots):
            F[slot, g_spike + j // 8] += 2.0 ** (7 - j % 8)

    matrix = np.concatenate([F, U], axis=0).astype(np.float32)

    # --- parameter planes ---
    params = np.zeros((P_ROWS, npad), dtype=np.float32)

    def put(row, values):
        params[row, :n] = np.asarray(values, dtype=np.float64)

    put(P_BIAS, c.bias)
    put(P_LEAK_DECAY, c.leak_decay)
    put(P_INPUT_DECAY, c.input_decay)
    put(P_THRESH, c.threshold)
    put(P_RTHRESH, c.reverse_threshold)
    put(P_RESET, c.reset)
    put(P_RRESET, c.reverse_reset)
    put(P_REFR_DELAY, c.refractory_delay)
    put(P_FORCE, c.force_update.astype(np.float64))
    put(P_IS_LIF, (c.soma_model == SOMA_MODEL_LIF).astype(np.float64))
    put(P_IS_TN, (c.soma_model == SOMA_MODEL_TRUENORTH).astype(np.float64))
    put(P_IS_INPUT, (c.soma_model == SOMA_MODEL_INPUT).astype(np.float64))
    put(P_LEAK, c.leak)
    put(P_LEAK_TZ, c.leak_towards_zero.astype(np.float64))
    put(P_RM_HARD, (c.reset_mode == int(NeuronResetMode.HARD)).astype(float))
    put(P_RM_SOFT, (c.reset_mode == int(NeuronResetMode.SOFT)).astype(float))
    put(P_RM_SAT,
        (c.reset_mode == int(NeuronResetMode.SATURATE)).astype(float))
    put(P_RRM_HARD,
        (c.reverse_reset_mode == int(NeuronResetMode.HARD)).astype(float))
    put(P_RRM_SOFT,
        (c.reverse_reset_mode == int(NeuronResetMode.SOFT)).astype(float))
    put(P_RRM_SAT,
        (c.reverse_reset_mode == int(NeuronResetMode.SATURATE)).astype(float))

    # pad-slot guard: padded lanes must never fire or count as updated
    params[P_IS_LIF, n:] = 0.0
    params[P_IS_TN, n:] = 0.0
    params[P_IS_INPUT, n:] = 0.0

    # --- potential/u log selection matvec ---
    log_sel = None
    if n_plog + n_ulog:
        sel = np.zeros((2 * npad, _pad_lane(n_plog + n_ulog)), dtype=f64)
        for j, slot in enumerate(np.asarray(c.potential_log_slots)[: n_plog]):
            sel[slot, j] = 1.0
        for j, slot in enumerate(np.asarray(c.u_log_slots)[: n_ulog]):
            sel[npad + slot, n_plog + j] = 1.0
        log_sel = sel.astype(np.float32)

    need_spike_plane = (
        SOMA_MODEL_INPUT in prog.models_present or c.has_poisson
    )
    need_add_plane = bool(
        ("lif_noise_values" in prog.arrays)
        or (
            c.tn_noise_slots is not None
            and len(c.tn_noise_slots)
            and SOMA_MODEL_TRUENORTH in prog.models_present
        )
    )

    # --- per-step output row layout (sums-only runs emit no rows at all) ---
    out_cols = 0
    o_masks = -1
    if prog.record_fired_axons:
        o_masks = 0
        out_cols = 2 * LANE  # fired bytes block + upd bytes block
    o_spike = -1
    if prog.record_spikes:
        o_spike = out_cols
        out_cols += LANE
    o_log = -1
    if log_sel is not None:
        o_log = out_cols
        out_cols += log_sel.shape[1]

    return ChunkPlan(
        n=n,
        npad=npad,
        nbytes=nbytes,
        n_cores=n_cores,
        matrix=matrix,
        const=const.astype(np.float32),
        params=params,
        g_lat=g_lat,
        g_msg=g_msg,
        g_deliver=g_deliver,
        g_count=g_count,
        g_pack_fired=g_pack_fired,
        g_pack_upd=g_pack_upd,
        g_spike=g_spike,
        sbytes=sbytes,
        m_cols=m_cols,
        log_sel=log_sel,
        n_plog=n_plog,
        n_ulog=n_ulog,
        need_spike_plane=need_spike_plane,
        need_add_plane=need_add_plane,
        sync_delay=prog.sync_delay,
        models=prog.models_present,
        o_masks=o_masks,
        o_spike=o_spike,
        o_log=o_log,
        out_cols=out_cols,
    )


def _kernel(plan: ChunkPlan, ts_block: int, n_blocks: int,
            t0_ref, mat_ref, const_ref, par_ref, state_in_ref,
            *refs):
    """One grid step = ``ts_block`` timesteps; scratch carries the state."""
    idx = 0
    spike_plane_ref = None
    add_plane_ref = None
    if plan.need_spike_plane:
        spike_plane_ref = refs[idx]
        idx += 1
    if plan.need_add_plane:
        add_plane_ref = refs[idx]
        idx += 1
    sel_ref = None
    if plan.log_sel is not None:
        sel_ref = refs[idx]
        idx += 1
    out_ref = refs[idx] if plan.out_cols else None
    idx += 1 if plan.out_cols else 0
    sums_i_ref = refs[idx]
    sums_f_ref = refs[idx + 1]
    state_out_ref = refs[idx + 2]
    st = refs[idx + 3]
    acc_f = refs[idx + 4]  # [2, LANE] f32: Kahan acc + compensation
    acc_i = refs[idx + 5]  # [1, LANE] i32: exact counter sums
    lhs = refs[idx + 6]

    i = pl.program_id(0)
    npad = plan.npad
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        st[:, :] = state_in_ref[:, :]
        acc_f[:, :] = jnp.zeros_like(acc_f)
        acc_i[:, :] = jnp.zeros_like(acc_i)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    counter_mask = (lane < 5).astype(f32)
    energy_mask = ((lane >= 5) & (lane <= 8)).astype(f32)
    core_mask = lane < plan.n_cores
    sim_lane = (lane == 9).astype(f32)
    sync = jnp.asarray(plan.sync_delay, dtype=f32)
    neg = jnp.asarray(-jnp.inf, dtype=f32)

    has_lif = SOMA_MODEL_LIF in plan.models
    has_tn = SOMA_MODEL_TRUENORTH in plan.models
    has_input = SOMA_MODEL_INPUT in plan.models

    def p(row):
        return par_ref[row : row + 1, :]

    def body(j, _):
        t = t0_ref[0, 0] + i * ts_block + j

        v = st[S_V : S_V + 1, :]
        u = st[S_U : S_U + 1, :]
        refr = st[S_REFR : S_REFR + 1, :]
        cur = st[S_CUR : S_CUR + 1, :]
        validb = st[S_VALID : S_VALID + 1, :] > 0.0
        zero = jnp.zeros((1, npad), dtype=f32)
        bias_nz = jnp.abs(p(P_BIAS)) > 0.0
        force = p(P_FORCE) > 0.0

        fired = jnp.zeros((1, npad), dtype=jnp.bool_)
        updated = jnp.zeros((1, npad), dtype=jnp.bool_)
        v2, u2, refr2 = v, u, refr

        add_row = None
        if add_plane_ref is not None:
            add_row = add_plane_ref[pl.ds(j, 1), :]

        if has_lif:
            # LoihiLifModel::update (src/models.cpp:497-567)
            is_lif = p(P_IS_LIF) > 0.0
            upd_l = (jnp.abs(v) > 0.0) | validb | bias_nz | force
            apply_leak = t > 1
            u_l = jnp.where(apply_leak, u * p(P_INPUT_DECAY), u)
            v_l = jnp.where(apply_leak, v * p(P_LEAK_DECAY), v)
            # 64ths fixed-point quantization (src/models.cpp:447-455)
            v_l = jnp.trunc(v_l * 64.0) / 64.0
            if add_row is not None:
                v_l = v_l + add_row
            active = ~(refr > 0.0)
            u_new = u_l + jnp.where(validb, cur, zero)
            v_new = v_l + p(P_BIAS) + u_new
            u_l = jnp.where(active, u_new, u_l)
            fired_l = active & (v_new > p(P_THRESH))
            v_act = jnp.where(
                fired_l & (p(P_RM_HARD) > 0), p(P_RESET), v_new
            )
            v_act = jnp.where(
                fired_l & (p(P_RM_SOFT) > 0), v_act - p(P_THRESH), v_act
            )
            rev = v_act < p(P_RTHRESH)
            v_act = jnp.where(
                rev & (p(P_RRM_SOFT) > 0), v_act - p(P_RTHRESH), v_act
            )
            v_act = jnp.where(rev & (p(P_RRM_HARD) > 0), p(P_RRESET), v_act)
            v_act = jnp.where(rev & (p(P_RRM_SAT) > 0), p(P_RTHRESH), v_act)
            v_l = jnp.where(active, v_act, v_l)
            refr_l = jnp.where(fired_l, p(P_REFR_DELAY), refr)
            refr_l = jnp.maximum(0.0, refr_l - 1.0)
            v2 = jnp.where(is_lif, v_l, v2)
            u2 = jnp.where(is_lif, u_l, u2)
            refr2 = jnp.where(is_lif, refr_l, refr2)
            fired = fired | (is_lif & fired_l)
            updated = updated | (is_lif & upd_l)

        if has_tn:
            # TrueNorthModel::update (src/models.cpp:724-830)
            is_tn = p(P_IS_TN) > 0.0
            upd_t = (jnp.abs(v) > 0.0) | validb | bias_nz | force
            leak_tz = jnp.where(
                v > 0.0, v - p(P_LEAK), jnp.where(v < 0.0, v + p(P_LEAK), v)
            )
            v_t = jnp.where(p(P_LEAK_TZ) > 0, leak_tz, v + p(P_LEAK))
            v_t = v_t + p(P_BIAS) + jnp.where(validb, cur, zero)
            v_cmp = v_t if add_row is None else v_t + add_row
            fired_t = v_cmp >= p(P_THRESH)
            v_after = jnp.where(fired_t & (p(P_RM_HARD) > 0), p(P_RESET), v_t)
            v_after = jnp.where(
                fired_t & (p(P_RM_SOFT) > 0), v_t - p(P_THRESH), v_after
            )
            v_after = jnp.where(
                fired_t & (p(P_RM_SAT) > 0), p(P_THRESH), v_after
            )
            rev_t = (~fired_t) & (v_cmp <= p(P_RTHRESH))
            v_after = jnp.where(
                rev_t & (p(P_RRM_HARD) > 0), p(P_RRESET), v_after
            )
            v_after = jnp.where(
                rev_t & (p(P_RRM_SOFT) > 0), v_t + p(P_RTHRESH), v_after
            )
            v_after = jnp.where(
                rev_t & (p(P_RRM_SAT) > 0), p(P_RTHRESH), v_after
            )
            v2 = jnp.where(is_tn, v_after, v2)
            fired = fired | (is_tn & fired_t)
            updated = updated | (is_tn & upd_t)

        if has_input and spike_plane_ref is not None:
            is_in = p(P_IS_INPUT) > 0.0
            fired = fired | (is_in & (spike_plane_ref[pl.ds(j, 1), :] > 0.0))

        uof = updated | fired
        fired_f = fired.astype(f32)

        # --- the one matvec: delivery + roll-up + packing ---
        lhs[0:1, :npad] = fired_f
        lhs[0:1, npad:] = uof.astype(f32)
        # HIGHEST precision: the default single-pass bf16 MXU matmul loses
        # ~3 decimal digits on the energy/latency/weight columns
        r = (
            jnp.dot(lhs[0:1, :], mat_ref[:, :],
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
            + const_ref[0:1, :]
        )

        st[S_V : S_V + 1, :] = v2
        st[S_U : S_U + 1, :] = u2
        st[S_REFR : S_REFR + 1, :] = refr2
        st[S_CUR : S_CUR + 1, :] = r[0:1, plan.g_deliver : plan.g_deliver + npad]
        st[S_VALID : S_VALID + 1, :] = (
            r[0:1, plan.g_count : plan.g_count + npad] > 0.0
        ).astype(f32)

        head = r[0:1, 0:LANE]
        # counters (integer-valued in f32, exact): int32 accumulation
        acc_i[0:1, :] = acc_i[0:1, :] + jnp.round(
            head * counter_mask
        ).astype(jnp.int32)
        # simple timing model: max over per-core latency sums + sync
        lat = jnp.where(core_mask, r[0:1, plan.g_lat : plan.g_lat + LANE], neg)
        msg = jnp.where(core_mask, r[0:1, plan.g_msg : plan.g_msg + LANE], neg)
        sim_time = jnp.maximum(jnp.max(lat), jnp.max(msg)) + sync
        # Kahan-compensated f32 accumulation of energies + sim_time
        en = head * energy_mask + sim_time * sim_lane
        told = acc_f[0:1, :]
        y = en - acc_f[1:2, :]
        tnew = told + y
        acc_f[1:2, :] = (tnew - told) - y
        acc_f[0:1, :] = tnew

        if out_ref is not None:
            # One aligned store per step: assemble the full output row
            # (Mosaic only supports dynamic-sublane stores at lane 0).
            row_parts = []
            if plan.o_masks >= 0:
                row_parts.append(
                    r[0:1, plan.g_pack_fired : plan.g_pack_fired + LANE]
                )
                row_parts.append(
                    r[0:1, plan.g_pack_upd : plan.g_pack_upd + LANE]
                )
            if plan.o_spike >= 0:
                row_parts.append(r[0:1, plan.g_spike : plan.g_spike + LANE])
            if sel_ref is not None:
                lhs2 = jnp.concatenate([v2, u2], axis=1)
                row_parts.append(
                    jnp.dot(lhs2, sel_ref[:, :], preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
                )
            row = (
                row_parts[0]
                if len(row_parts) == 1
                else jnp.concatenate(row_parts, axis=1)
            )
            out_ref[pl.ds(j, 1), :] = row
        return 0

    jax.lax.fori_loop(0, ts_block, body, 0)

    @pl.when(i == n_blocks - 1)
    def _finish():
        state_out_ref[:, :] = st[:, :]
        sums_f_ref[:, :] = acc_f[:, :]
        sums_i_ref[:, :] = acc_i[:, :]


def _build_planes(prog, plan: ChunkPlan, chunk_len: int, t0, feeds):
    """Vectorized precompute of the per-step input planes (XLA, outside the
    kernel): input-model spikes and additive noise, as [T, Npad] float32."""
    a = prog.arrays
    c = prog.compiled
    npad = plan.npad
    T = chunk_len
    spike_plane = None
    add_plane = None
    ts = t0 + jnp.arange(T, dtype=jnp.int64)

    if plan.need_spike_plane:
        slots = np.flatnonzero(
            np.asarray(c.soma_model) == SOMA_MODEL_INPUT
        ).astype(np.int32)
        k = len(slots)
        if k:
            sl = jnp.asarray(slots)
            idx = (ts[:, None] - 1) * a["input_train_stride"][sl][None, :] + a[
                "input_train_rank"
            ][sl][None, :]
            in_range = idx < a["input_train_len"][sl][None, :]
            gidx = jnp.clip(a["input_train_start"][sl][None, :] + idx, 0, None)
            gidx = jnp.minimum(
                gidx, a["input_trains"].shape[0] - 1
            ).astype(jnp.int32)
            spike = in_range & a["input_trains"][gidx]
            interval = a["input_rate_interval"][sl][None, :]
            spike = spike | (
                (interval > 0) & ((ts[:, None] % jnp.maximum(interval, 1)) == 0)
            )
            spike_plane = (
                jnp.zeros((T, npad), dtype=jnp.float32)
                .at[:, sl]
                .set(spike.astype(jnp.float32))
            )
        else:
            spike_plane = jnp.zeros((T, npad), dtype=jnp.float32)
        if "poisson" in feeds:
            spike_plane = spike_plane.at[:, a["poisson_slots"]].max(
                jnp.asarray(feeds["poisson"], dtype=jnp.float32)
            )

    if plan.need_add_plane:
        add_plane = jnp.zeros((T, npad), dtype=jnp.float32)
        if "lif_noise_values" in a:
            slots = np.flatnonzero(
                np.asarray(prog.compiled.lif_noise_len) > 0
            ).astype(np.int32)
            if len(slots):
                sl = jnp.asarray(slots)
                nidx = (ts[:, None] - 1).astype(jnp.int32) * a[
                    "lif_noise_stride"
                ][sl][None, :] + a["lif_noise_rank"][sl][None, :]
                ln = jnp.maximum(a["lif_noise_len"][sl][None, :], 1)
                noise = a["lif_noise_values"][
                    a["lif_noise_start"][sl][None, :] + nidx % ln
                ]
                add_plane = add_plane.at[:, sl].set(noise)
        if "tn_noise" in feeds:
            add_plane = add_plane.at[:, a["tn_noise_slots"]].set(
                jnp.asarray(feeds["tn_noise"], dtype=jnp.float32)
            )
    return spike_plane, add_plane


def make_pallas_chunk(prog, chunk_len: int, ts_block: int = DEFAULT_TS,
                      interpret: bool = False):
    """Build run(state, t0, feeds) -> (state', outputs) for ``chunk_len``
    timesteps executed inside one Pallas kernel. Returns None if the
    program is ineligible or the chunk doesn't tile."""
    plan = plan_chunk(prog)
    if plan is None:
        return None
    ts_block = min(ts_block, chunk_len)
    if chunk_len % ts_block:
        return None
    # Counters accumulate on-device in int32 over the whole chunk; bound
    # the worst case (every neuron fires every step) so sums cannot wrap.
    c = prog.compiled
    max_per_step = max(
        int(np.sum(c.neuron_spike_ops)),
        int(np.sum(c.neuron_n_axons)),
        int(np.sum(c.neuron_axon_hops)),
        c.n_neurons,
    )
    if chunk_len * max(max_per_step, 1) >= 2**31:
        return None
    n_blocks = chunk_len // ts_block
    npad = plan.npad
    n = plan.n

    grid = (n_blocks,)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((2 * npad, plan.m_cols), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, plan.m_cols), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P_ROWS, npad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S_ROWS, npad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if plan.need_spike_plane:
        in_specs.append(
            pl.BlockSpec((ts_block, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if plan.need_add_plane:
        in_specs.append(
            pl.BlockSpec((ts_block, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if plan.log_sel is not None:
        in_specs.append(
            pl.BlockSpec((2 * npad, plan.log_sel.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    out_shape = []
    out_specs = []
    if plan.out_cols:
        out_shape.append(
            jax.ShapeDtypeStruct((chunk_len, plan.out_cols), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((ts_block, plan.out_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    out_shape += [
        jax.ShapeDtypeStruct((1, LANE), jnp.int32),  # counter sums
        jax.ShapeDtypeStruct((2, LANE), jnp.float32),  # kahan acc + comp
        jax.ShapeDtypeStruct((S_ROWS, npad), jnp.float32),  # final state
    ]
    out_specs += [
        pl.BlockSpec((1, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S_ROWS, npad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    kernel = partial(_kernel, plan, ts_block, n_blocks)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((S_ROWS, npad), jnp.float32),  # state
            pltpu.VMEM((2, LANE), jnp.float32),  # kahan acc + comp
            pltpu.VMEM((1, LANE), jnp.int32),  # counter sums
            pltpu.VMEM((8, 2 * npad), jnp.float32),  # lhs staging
        ],
        interpret=interpret,
    )

    # Device-resident plan constants are passed as jit ARGUMENTS, never
    # closed over: a closure constant is inlined at lowering via a
    # device->host fetch (jax _array_mlir_constant_handler), which over a
    # tunneled device link stalls for minutes and lost the example
    # workload's bench evidence in rounds 4-5.
    mat = jax.device_put(plan.matrix)
    const = jax.device_put(plan.const)
    params = jax.device_put(plan.params)
    sel = (
        jax.device_put(plan.log_sel) if plan.log_sel is not None else None
    )

    nb = plan.nbytes
    sb = plan.sbytes

    @jax.jit
    def run_inner(state, t0, feeds, mat, const, params, sel):
        t0 = jnp.asarray(t0, dtype=jnp.int64)
        state_rows = jnp.zeros((S_ROWS, npad), dtype=jnp.float32)
        state_rows = state_rows.at[S_V, :n].set(
            state["potential"].astype(jnp.float32)
        )
        state_rows = state_rows.at[S_U, :n].set(
            state["input_current"].astype(jnp.float32)
        )
        state_rows = state_rows.at[S_REFR, :n].set(
            state["refractory"].astype(jnp.float32)
        )
        state_rows = state_rows.at[S_CUR, :n].set(
            state["buffer_current"].astype(jnp.float32)
        )
        state_rows = state_rows.at[S_VALID, :n].set(
            state["buffer_valid"].astype(jnp.float32)
        )
        spike_plane, add_plane = _build_planes(
            prog, plan, chunk_len, t0, feeds
        )
        args = [
            t0.astype(jnp.int32).reshape(1, 1),
            mat, const, params, state_rows,
        ]
        if spike_plane is not None:
            args.append(spike_plane)
        if add_plane is not None:
            args.append(add_plane)
        if sel is not None:
            args.append(sel)
        results = call(*args)
        k = 0
        out_rows = None
        if plan.out_cols:
            out_rows = results[0]
            k = 1
        sums_i, sums_f, state_out = results[k], results[k + 1], results[k + 2]

        new_state = dict(state)
        new_state["potential"] = state_out[S_V, :n]
        new_state["input_current"] = state_out[S_U, :n]
        new_state["refractory"] = state_out[S_REFR, :n].astype(jnp.int32)
        new_state["buffer_current"] = state_out[S_CUR, :n]
        new_state["buffer_valid"] = state_out[S_VALID, :n] > 0.0

        # single fetched buffer: [counter sums i32 | energy sums f32 |
        # masks u8 | spike-log u8 | logs f32]
        # Kahan: the best estimate is acc minus the pending compensation
        parts = [
            jax.lax.bitcast_convert_type(sums_i[0], jnp.uint8).reshape(-1),
            jax.lax.bitcast_convert_type(
                (sums_f[0] - sums_f[1]), jnp.uint8
            ).reshape(-1),
        ]
        if out_rows is not None:
            if plan.o_masks >= 0:
                masks = out_rows[:, plan.o_masks : plan.o_masks + LANE][:, :nb]
                upd = out_rows[
                    :, plan.o_masks + LANE : plan.o_masks + 2 * LANE
                ][:, :nb]
                parts.append(masks.astype(jnp.uint8).reshape(-1))
                parts.append(upd.astype(jnp.uint8).reshape(-1))
            if plan.o_spike >= 0:
                parts.append(
                    out_rows[:, plan.o_spike : plan.o_spike + LANE][:, :sb]
                    .astype(jnp.uint8)
                    .reshape(-1)
                )
            if plan.o_log >= 0:
                parts.append(
                    jax.lax.bitcast_convert_type(
                        out_rows[
                            :, plan.o_log : plan.o_log + plan.n_plog
                            + plan.n_ulog
                        ],
                        jnp.uint8,
                    ).reshape(-1)
                )
        packed = jnp.concatenate(parts)
        return new_state, packed

    layout = _packed_layout(plan, chunk_len)

    def run(state, t0, feeds=None):
        new_state, packed = run_inner(
            state, t0, feeds or {}, mat, const, params, sel
        )
        return new_state, {"packed": packed, "packed_layout": layout}

    return run


def _packed_layout(plan: ChunkPlan, T: int) -> dict:
    """Byte offsets of each section in the fetched buffer."""
    layout: dict[str, Any] = {"T": T, "plan": plan}
    off = 0
    layout["counters"] = (off, LANE, np.int32)
    off += LANE * 4
    layout["energies"] = (off, LANE, np.float32)
    off += LANE * 4
    if plan.o_masks >= 0:
        layout["masks_fired"] = (off, (T, plan.nbytes), np.uint8)
        off += T * plan.nbytes
        layout["masks_upd"] = (off, (T, plan.nbytes), np.uint8)
        off += T * plan.nbytes
    if plan.o_spike >= 0:
        layout["spike_log"] = (off, (T, plan.sbytes), np.uint8)
        off += T * plan.sbytes
    if plan.o_log >= 0:
        L = plan.n_plog + plan.n_ulog
        layout["logs"] = (off, (T, L), np.float32)
        off += T * L * 4
    layout["total"] = off
    return layout


def decode_packed(packed: np.ndarray, layout: dict) -> dict:
    """Host-side decode of the single fetched buffer into named arrays."""
    buf = np.ascontiguousarray(packed).view(np.uint8)
    plan: ChunkPlan = layout["plan"]
    out: dict[str, Any] = {}

    def view(key):
        off, shape, dtype = layout[key]
        count = int(np.prod(shape))
        arr = np.frombuffer(
            buf, dtype=dtype, count=count, offset=off
        )
        return arr.reshape(shape)

    counters = view("counters")
    energies = view("energies")
    out["counter_sums"] = counters[:5].astype(np.int64)
    out["energy_sums"] = energies[5:9].astype(np.float64)
    out["sim_time_sum"] = float(energies[9])
    if "masks_fired" in layout:
        fired = view("masks_fired")
        upd = view("masks_upd")
        out["masks_packed"] = np.stack([fired, upd], axis=1)
    if "spike_log" in layout:
        out["spike_log_packed"] = view("spike_log")
    if "logs" in layout:
        logs = view("logs")
        out["potential_log"] = logs[:, : plan.n_plog]
        out["u_log"] = logs[:, plan.n_plog : plan.n_plog + plan.n_ulog]
    return out
