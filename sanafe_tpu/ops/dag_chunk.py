"""Feed-forward (DAG) chunk execution: levels over the time axis.

The generic chunk path runs ``lax.scan`` over timesteps, paying the whole
chip's op graph once per step. But most large SNN workloads — including
the DVS-gesture acceptance net (reference ``snn/dvs.yaml``: conv chain
0→1→2→3→4 plus a dense head 4→5) — are feed-forward: every connection
goes from one neuron group to a strictly later one, and a spike sent at
timestep t is consumed at t+1 (reference pipeline semantics,
src/chip.cpp:656-708 — delivery lands in the destination's input buffer
for the next neuron phase).

For such a DAG the time loop factorizes by topological level:

  fired[level 0][t]  depends only on level-0 state          (tiny scan)
  input[level l][t]  = deliver_l(fired[<l][t-1])            (BATCHED!)
  fired[level l][t]  = soma(state_l, input_l[t])            (tiny scan)

so each conv hyperedge runs as ONE batched convolution over all T
timesteps (an MXU-shaped op ~T× larger than the per-step conv), and the
only sequential work left is the per-level membrane recurrence — an
elementwise scan over [level_size] lanes, a few % of the chip. The
per-step stats roll-up becomes one [T, 2N] @ [2N, K] matmul.

Measured on v5e at DVS-gesture scale this cuts the device chunk cost
~3-4x vs the step scan. Numerics are unchanged: the same
``_lif_update`` / ``_input_update`` / ``_conv_deliver`` /
``_block_deliver`` / roll-up formulas run on the same dtype, only
batched differently; LIF potentials stay on their exact 1/64 grid so
spike rasters remain byte-identical (tests/test_reference_parity.py).

Eligibility is decided statically by :func:`plan_dag`; ineligible
programs (cyclic nets, plugins, TrueNorth noise, per-edge state) fall
back to the step scan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import SOMA_MODEL_INPUT, SOMA_MODEL_LIF

# per-slot array keys consumed by the level soma updates (sliced per
# level); pool arrays (flat value stores indexed via start offsets) pass
# through whole
_LIF_SLOT_KEYS = (
    "soma_model", "bias", "force_update", "input_decay", "leak_decay",
    "threshold", "reset_mode", "reset", "reverse_threshold",
    "reverse_reset_mode", "reverse_reset", "refractory_delay",
    "lif_noise_stride", "lif_noise_rank", "lif_noise_len",
    "lif_noise_start",
)
_INPUT_SLOT_KEYS = (
    "input_train_stride", "input_train_rank", "input_train_len",
    "input_train_start", "input_rate_interval",
)
_POOL_KEYS = ("lif_noise_values", "input_trains")


@dataclass
class _Level:
    slots: np.ndarray              # int32 slot ids of this level
    conv_entries: list             # conv entry ids delivering INTO it
    conv_src_local: dict           # entry id -> (src_level, local idx)
    out_gidx: np.ndarray           # level-local inverse permutation
    out_mask: np.ndarray
    has_leftover: bool             # block (non-conv) edges end here
    has_lif: bool
    has_input: bool


@dataclass
class DagPlan:
    levels: list                   # topological order


def plan_dag(prog) -> Optional[DagPlan]:
    """Static feasibility + level partition, or None when the program
    must take the generic step scan."""
    if os.environ.get("SANAFE_TPU_DAG", "1") == "0":
        return None
    c = prog.compiled
    cd = prog.conv_delivery
    if cd is None or not prog.fused_rollup or prog.dense_delivery:
        return None
    if c.plugin_specs or c.has_poisson:
        return None
    if getattr(prog, "pallas_delivery", None) is not None:
        # the activity-gated pallas block kernel is not exercised under
        # vmap; such programs keep the step scan
        return None
    if c.tn_noise_slots is not None and len(c.tn_noise_slots):
        return None
    models = {int(m) for m in np.unique(np.asarray(c.soma_model))}
    if not models <= {SOMA_MODEL_LIF, SOMA_MODEL_INPUT}:
        return None

    group_names = list(c.groups)
    gid = {g: i for i, g in enumerate(group_names)}
    n_groups = len(group_names)

    # group-level edge set: conv hyperedges + leftover (non-conv) edges
    edges = {(gid[e[0]], gid[e[1]]) for e in cd.entries}
    slot2gid = np.full(c.n_neurons, -1, dtype=np.int64)
    for g, slots in c.groups.items():
        slot2gid[np.asarray(slots)] = gid[g]
    leftover_dst_gids: set = set()
    mask = ~np.asarray(c.edge_from_conv)
    if mask.any():
        src_g = slot2gid[
            np.asarray(c.axon_src_slot)[np.asarray(c.edge_axon)[mask]]
        ]
        dst_g = slot2gid[np.asarray(c.edge_dest_slot)[mask]]
        for s, d in zip(src_g, dst_g):
            edges.add((int(s), int(d)))
            leftover_dst_gids.add(int(d))

    # longest-path levels; None on any cycle (incl. self-loops)
    adj = [[] for _ in range(n_groups)]
    indeg = [0] * n_groups
    for s, d in edges:
        if s == d:
            return None
        adj[s].append(d)
        indeg[d] += 1
    level_of = [0] * n_groups
    ready = [i for i in range(n_groups) if indeg[i] == 0]
    seen = 0
    while ready:
        g = ready.pop()
        seen += 1
        for d in adj[g]:
            level_of[d] = max(level_of[d], level_of[g] + 1)
            indeg[d] -= 1
            if indeg[d] == 0:
                ready.append(d)
    if seen != n_groups:
        return None  # cycle

    n_levels = max(level_of) + 1
    by_level = [[] for _ in range(n_levels)]
    for i, lv in enumerate(level_of):
        by_level[lv].append(group_names[i])

    # local position of every slot within its level
    level_slots = [
        np.sort(
            np.concatenate(
                [np.asarray(c.groups[g], dtype=np.int64) for g in names]
            )
        )
        for names in by_level
    ]
    slot_level = np.full(c.n_neurons, -1, dtype=np.int64)
    slot_local = np.zeros(c.n_neurons, dtype=np.int64)
    for lv, slots in enumerate(level_slots):
        slot_level[slots] = lv
        slot_local[slots] = np.arange(len(slots))
    if (slot_level < 0).any():
        # slots outside any group (e.g. parallel padding) — the step scan
        # handles those programs
        return None

    soma_model = np.asarray(c.soma_model)
    levels = []
    for lv, slots in enumerate(level_slots):
        entries = [
            i for i, e in enumerate(cd.entries)
            if level_of[gid[e[1]]] == lv
        ]
        src_local = {}
        for i in entries:
            src_slots = np.asarray(c.groups[cd.entries[i][0]])
            src_lv = level_of[gid[cd.entries[i][0]]]
            # conv input gather: reference neuron order within the source
            # group, expressed in the source level's local positions
            src_local[i] = (src_lv, slot_local[src_slots].astype(np.int32))
        # level-local inverse permutation for this level's conv dests
        dests = sorted({cd.entries[i][1] for i in entries})
        base, off = {}, 0
        for g in dests:
            base[g] = off
            off += len(c.groups[g])
        out_gidx = np.zeros(len(slots), dtype=np.int32)
        out_mask = np.zeros(len(slots), dtype=bool)
        for g in dests:
            gs = np.asarray(c.groups[g])
            out_gidx[slot_local[gs]] = base[g] + np.arange(
                len(gs), dtype=np.int32
            )
            out_mask[slot_local[gs]] = True
        has_leftover = any(
            level_of[d] == lv for d in leftover_dst_gids
        )
        lv_models = set(soma_model[slots].tolist())
        levels.append(_Level(
            slots=slots.astype(np.int32),
            conv_entries=entries,
            conv_src_local=src_local,
            out_gidx=out_gidx,
            out_mask=out_mask,
            has_leftover=has_leftover,
            has_lif=SOMA_MODEL_LIF in lv_models,
            has_input=SOMA_MODEL_INPUT in lv_models,
        ))
    return DagPlan(levels=levels)


def rollup_stats(prog, a, fired_f, upd_f):
    """Batched fused roll-up: ONE [T, 2N] @ [2N, K] matmul computes every
    per-step counter/energy/latency reduction (column layout:
    ``build_rollup_matrix``), then the simple-timing step time as the max
    over the per-core latency sums (reference src/schedule.cpp:61-102).

    Shared by the DAG body and the step scan's deferred roll-up
    (``make_scan``) so both engines produce bit-identical stats — and so
    the [2N, K] coefficient matrix is read from HBM once per CHUNK instead
    of once per step.

    Returns ``(stats [T, 11], opt_perf [T, n_opt] | None)``.
    """
    dtype = fired_f.dtype
    lhs = jnp.concatenate([fired_f, upd_f], axis=1)
    r = lhs @ a["rollup_matrix"] + a["rollup_const"][None]
    n_cores = prog.compiled.n_cores
    lat0, msg0 = 9, 9 + n_cores
    opt0 = msg0 + n_cores
    total_energy = r[:, 5] + r[:, 6] + r[:, 7] + r[:, 8]
    sim_time = jnp.maximum(
        jnp.max(r[:, lat0:msg0], axis=1),
        jnp.max(r[:, msg0:opt0], axis=1),
    ) + jnp.asarray(prog.sync_delay, dtype=dtype)
    stats = jnp.concatenate(
        [r[:, :9], total_energy[:, None], sim_time[:, None]], axis=1
    )
    opt_perf = r[:, opt0:] if "perf_col_fired" in a else None
    return stats, opt_perf


def _slice_arrays(arrays, slots) -> dict:
    a = {}
    for k in _LIF_SLOT_KEYS + _INPUT_SLOT_KEYS:
        if k in arrays:
            a[k] = arrays[k][slots]
    for k in _POOL_KEYS:
        if k in arrays:
            a[k] = arrays[k]
    return a


def make_dag_body(prog, plan: DagPlan, chunk_len: int):
    """Build ``(arrays, state, ts, feeds) -> (state', outputs)`` with the
    same state/output contract as the per-step scan body stack (so the
    wire consolidation, sparse spike transform, and device-sweep
    composition in make_scan apply unchanged)."""
    from .step import (
        _block_deliver, _conv_deliver, _input_update, _lif_update,
        _packbits, _packbits2,
    )

    c = prog.compiled
    cd = prog.conv_delivery
    dtype = prog.dtype
    n = c.n_neurons
    T = chunk_len

    def run(arrays, state, ts, feeds):
        del feeds  # plan_dag rejects programs needing per-step feeds
        a = arrays
        asm_fired = jnp.zeros((T, n), dtype=bool)
        asm_updated = jnp.zeros((T, n), dtype=bool)
        asm_fired_f = jnp.zeros((T, n), dtype=dtype)
        fired_cols: dict[int, jnp.ndarray] = {}
        v_cols: dict[int, jnp.ndarray] = {}
        u_cols: dict[int, jnp.ndarray] = {}
        end_state = {
            "potential": state["potential"],
            "input_current": state["input_current"],
            "refractory": state["refractory"],
        }

        for li, lv in enumerate(plan.levels):
            slots = jnp.asarray(lv.slots)
            size = len(lv.slots)
            # --- delivery into this level, batched over the chunk ---
            # row 0 consumes the chunk-initial buffer (previous chunk's
            # delivery); rows 1..T-1 consume fired[t-1]
            cur0 = state["buffer_current"][slots][None]
            val0 = state["buffer_valid"][slots][None]
            parts_cur, parts_val = [cur0], [val0]
            if lv.conv_entries and T > 1:
                results: dict[str, tuple] = {}
                for i in lv.conv_entries:
                    (src_g, dst_g, _, strides,
                     (cin, h, w), (cout, oh, ow)) = cd.entries[i]
                    src_lv, local = lv.conv_src_local[i]
                    x = fired_cols[src_lv][:-1, jnp.asarray(local)]
                    x = x.reshape(T - 1, cin, h, w)
                    y = jax.lax.conv_general_dilated(
                        x,
                        a[f"conv_kernel_{i}"],
                        window_strides=strides,
                        padding="VALID",
                        dimension_numbers=("NCHW", "HWIO", "NCHW"),
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    cur = y[:, :cout].reshape(T - 1, -1)
                    cnt = jnp.broadcast_to(
                        y[:, cout:cout + 1], (T - 1, cout, oh, ow)
                    ).reshape(T - 1, -1)
                    if dst_g in results:
                        pc, pn = results[dst_g]
                        results[dst_g] = (pc + cur, pn + cnt)
                    else:
                        results[dst_g] = (cur, cnt)
                dests = sorted(results)
                g_cur = (results[dests[0]][0] if len(dests) == 1 else
                         jnp.concatenate([results[g][0] for g in dests], 1))
                g_cnt = (results[dests[0]][1] if len(dests) == 1 else
                         jnp.concatenate([results[g][1] for g in dests], 1))
                mask = jnp.asarray(lv.out_mask)
                gidx = jnp.asarray(lv.out_gidx)
                conv_cur = jnp.where(
                    mask, g_cur[:, gidx], jnp.zeros((), dtype=dtype)
                )
                conv_val = mask & (g_cnt[:, gidx] > 0)
                parts_cur.append(conv_cur)
                parts_val.append(conv_val)
            if lv.has_leftover and T > 1:
                blk_cur, blk_val = jax.vmap(
                    lambda fb, ff: _block_deliver(prog, a, fb, ff, dtype, n)
                )(asm_fired[:-1], asm_fired_f[:-1])
                lc, lval = blk_cur[:, slots], blk_val[:, slots]
                if len(parts_cur) > 1:
                    parts_cur[1] = parts_cur[1] + lc
                    parts_val[1] = parts_val[1] | lval
                else:
                    parts_cur.append(lc)
                    parts_val.append(lval)
            if len(parts_cur) > 1:
                cur_seq = jnp.concatenate(parts_cur, axis=0)
                val_seq = jnp.concatenate(parts_val, axis=0)
            else:
                cur_seq = jnp.broadcast_to(
                    jnp.zeros((), dtype=dtype), (T, size)
                ).at[0].set(cur0[0])
                val_seq = jnp.zeros((T, size), dtype=bool).at[0].set(
                    val0[0]
                )

            # --- soma phase for this level ---
            la = _slice_arrays(a, slots)
            is_lif = la["soma_model"] == SOMA_MODEL_LIF
            fired_lv = jnp.zeros((T, size), dtype=bool)
            updated_lv = jnp.zeros((T, size), dtype=bool)
            if lv.has_input:
                is_input = la["soma_model"] == SOMA_MODEL_INPUT
                fired_in = jax.vmap(
                    lambda t: _input_update(prog, la, t)
                )(ts)
                fired_lv = fired_lv | (is_input[None] & fired_in)
            if lv.has_lif:
                v0 = state["potential"][slots]
                u0 = state["input_current"][slots]
                r0 = state["refractory"][slots]

                def body(carry, xs):
                    v, u, refr = carry
                    t, valid, current = xs
                    st = {"potential": v, "input_current": u,
                          "refractory": refr}
                    v2, u2, r2, upd, fired = _lif_update(
                        prog, la, st, valid, current, t
                    )
                    return (v2, u2, r2), (fired, upd, v2, u2)

                (vT, uT, rT), (f_seq, upd_seq, v_seq, u_seq) = (
                    jax.lax.scan(body, (v0, u0, r0),
                                 (ts, val_seq, cur_seq))
                )
                fired_lv = fired_lv | (is_lif[None] & f_seq)
                updated_lv = updated_lv | (is_lif[None] & upd_seq)
                end_state["potential"] = end_state["potential"].at[
                    slots
                ].set(jnp.where(is_lif, vT, end_state["potential"][slots]))
                end_state["input_current"] = end_state["input_current"].at[
                    slots
                ].set(jnp.where(is_lif, uT,
                                end_state["input_current"][slots]))
                end_state["refractory"] = end_state["refractory"].at[
                    slots
                ].set(jnp.where(is_lif, rT,
                                end_state["refractory"][slots]))
                if prog.record_potentials:
                    v_cols[li] = jnp.where(
                        is_lif[None], v_seq,
                        state["potential"][slots][None]
                    )
                if prog.record_u:
                    u_cols[li] = jnp.where(
                        is_lif[None], u_seq,
                        state["input_current"][slots][None]
                    )
            else:
                if prog.record_potentials:
                    v_cols[li] = jnp.broadcast_to(
                        state["potential"][slots][None], (T, size)
                    )
                if prog.record_u:
                    u_cols[li] = jnp.broadcast_to(
                        state["input_current"][slots][None], (T, size)
                    )

            fired_cols[li] = fired_lv.astype(dtype)
            asm_fired = asm_fired.at[:, slots].set(fired_lv)
            asm_updated = asm_updated.at[:, slots].set(updated_lv)
            asm_fired_f = asm_fired_f.at[:, slots].set(fired_cols[li])

        # --- chunk-final delivery: the buffer the NEXT chunk consumes ---
        last_f = asm_fired_f[-1]
        buffer_current, any_input = _conv_deliver(prog, a, last_f, dtype)
        if prog.block is not None and prog.block.weights.shape[0] > 0:
            blk_cur, blk_any = _block_deliver(
                prog, a, asm_fired[-1], last_f, dtype, n
            )
            buffer_current = buffer_current + blk_cur
            any_input = any_input | blk_any
        new_state = dict(end_state)
        new_state["buffer_current"] = buffer_current
        new_state["buffer_valid"] = any_input

        # --- fused roll-up, one [T, 2N] @ [2N, K] matmul ---
        upd_or_fired = asm_updated | asm_fired
        stats, opt_perf = rollup_stats(
            prog, a, asm_fired_f, upd_or_fired.astype(dtype)
        )
        outputs = {"stats": stats}
        if opt_perf is not None:
            outputs["opt_perf"] = opt_perf

        if prog.record_spikes and not prog.record_fired_axons:
            fired_log = asm_fired[:, a["spike_log_slots"]]
            if prog.sparse_spike_k():
                outputs["fired_log"] = fired_log
            else:
                outputs["spike_log_packed"] = jax.vmap(_packbits)(
                    fired_log
                )
        if prog.record_potentials:
            asm_v = jnp.zeros((T, n), dtype=dtype)
            for li, lv in enumerate(plan.levels):
                asm_v = asm_v.at[:, jnp.asarray(lv.slots)].set(v_cols[li])
            outputs["potential_log"] = asm_v[:, a["potential_log_slots"]]
        if prog.record_u:
            asm_u = jnp.zeros((T, n), dtype=dtype)
            for li, lv in enumerate(plan.levels):
                asm_u = asm_u.at[:, jnp.asarray(lv.slots)].set(u_cols[li])
            outputs["u_log"] = asm_u[:, a["u_log_slots"]]
        if prog.record_fired_axons:
            outputs["masks_packed"] = jax.vmap(
                lambda f, ufd: _packbits2(jnp.stack([f, ufd]))
            )(asm_fired, upd_or_fired)
        return new_state, outputs

    return run
