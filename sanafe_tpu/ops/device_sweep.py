"""On-device detailed-timing sweep (opt-in tier).

Reformulates the reference's serial semi-analytical NoC congestion sweep
(src/schedule.cpp:208-611) as a jit-compiled event loop that runs on the
accelerator, batched over all timesteps of a chunk with ``jax.vmap`` —
timesteps are independent (the tracked NoC state resets every timestep),
which is the parallelism the reference's pipelined scheduler threads
exploit (src/schedule.hpp:47-167) and a TPU exploits far better: the
while-loop executes one *event* per iteration but processes every
timestep's event lane simultaneously.

Semantics match the exact host sweep (``ops/timing.py`` /
``native_src/scheduler.cpp``) with two documented deviations, both within
the north star's <=1% energy/latency budget (BASELINE.json):

- **Tie order.** Equal sent-timestamps pop in core-id order (argmin),
  not libstdc++ heap-sift order; retirement pops in receive-time order,
  not dest-core-id order. Both only reorder float round-off.
- **Arithmetic.** On TPU the sweep runs in float32 (the device program's
  dtype); the host tiers keep bit-exact float64. The incremental
  rolling-mean formulas themselves are the reference's
  (src/schedule.cpp:449-476).

The exact host sweep remains the default; enable this tier with
``SpikingChip.sim(..., device_sweep=True)`` or
``SANAFE_TPU_DEVICE_SWEEP=1``. A per-timestep message-count overflow flag
accompanies the result; the caller falls back to the host sweep for any
chunk that exceeds the static message capacity (the packed masks stay
device-resident so the fallback costs one extra fetch, only when hit).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import CompiledChip
from .timing import NDIRECTIONS, MessageRecord, NocModel


def _route_table(c: CompiledChip) -> tuple[np.ndarray, int]:
    """Per-axon dimension-order route links, padded to the longest route.

    Reuses NocModel's link enumeration (the reference's noc_get_links,
    src/schedule.cpp:478-553) so the three route consumers (host sweep,
    native sweep, device sweep) share one definition.
    """
    noc = NocModel(c)
    n_axons = len(c.axon_src_slot)
    m = MessageRecord(mid=0, timestep=0, src_neuron_group="", src_neuron_offset=0,
                      generation_delay=0.0)
    routes: list[list[int]] = []
    r_max = 1
    for a in range(n_axons):
        m.src_x = int(c.axon_src_x[a])
        m.src_y = int(c.axon_src_y[a])
        m.dest_x = int(c.axon_dest_x[a])
        m.dest_y = int(c.axon_dest_y[a])
        m.src_core_offset = int(c.axon_src_core_offset[a])
        links = noc._route_links(m)
        routes.append(links)
        r_max = max(r_max, len(links))
    table = np.full((n_axons, r_max), -1, dtype=np.int32)
    for a, links in enumerate(routes):
        table[a, : len(links)] = links
    return table, noc.width * noc.height * noc.links_per_tile


def build_sweep_tables(c: CompiledChip) -> dict:
    """Static per-axon / per-core / per-neuron arrays the sweep needs.

    Cached on the compiled chip (pure geometry + costs; independent of the
    program dtype).
    """
    cached = getattr(c, "_sweep_tables", None)
    if cached is not None:
        return cached
    n_cores = c.n_cores
    n_axons = len(c.axon_src_slot)

    routes, n_links = _route_table(c)

    core_slot_lo = np.full(n_cores, -1, dtype=np.int32)
    core_slot_hi = np.full(n_cores, -1, dtype=np.int32)
    for core in c.cores:
        if core.neuron_slots:
            core_slot_lo[core.core_id] = core.neuron_slots[0]
            core_slot_hi[core.core_id] = core.neuron_slots[-1]
    # Axon ids are allocated core-major (compile.py), so per-core axon
    # ranges are contiguous: CSR offsets via a counting pass.
    core_ax_start = np.zeros(n_cores + 1, dtype=np.int32)
    np.add.at(core_ax_start, np.asarray(c.axon_src_core, dtype=np.int64) + 1, 1)
    core_ax_start = np.cumsum(core_ax_start).astype(np.int32)
    # per-slot core lower bound (for generation-delay segment resets)
    slot_core_lo = np.zeros(c.n_neurons, dtype=np.int32)
    for core in c.cores:
        if core.neuron_slots:
            slot_core_lo[core.neuron_slots] = core.neuron_slots[0]
    # Only slots that can EMIT a message reset the generation-delay
    # accumulator (src/chip.cpp:624-654): a fired neuron with no axons
    # keeps accumulating into the next message / placeholder.
    slot_has_axon = np.zeros(c.n_neurons, dtype=bool)
    slot_has_axon[np.asarray(c.axon_src_slot, dtype=np.int64)] = True

    tables = {
        "routes": routes,
        "n_links": n_links,
        "adj": (1.0 / (2.0 + np.asarray(c.axon_hops, dtype=np.float64))),
        "dest_core": np.asarray(c.axon_dest_core, dtype=np.int32),
        "proc": np.asarray(c.axon_const_processing_latency, dtype=np.float64),
        "min_hop": np.asarray(c.axon_min_hop_delay, dtype=np.float64),
        "latency_out": np.asarray(c.axon_latency_out, dtype=np.float64),
        "hops": np.asarray(c.axon_hops, dtype=np.int32),
        "src_slot": np.asarray(c.axon_src_slot, dtype=np.int32),
        "ordinal": np.asarray(c.axon_ordinal_in_neuron, dtype=np.int32),
        # per-neuron generation-latency components (process_neuron,
        # src/chip.cpp:710-736) — identical to NativeScheduler's
        "lat_base": np.asarray(
            c.soma_lat_access
            + c.dendrite_in_neuron_phase * c.dendrite_lat_update,
            dtype=np.float64,
        ),
        "lat_update": np.asarray(c.soma_lat_update, dtype=np.float64),
        "lat_spike": np.asarray(c.soma_lat_spike, dtype=np.float64),
        "core_slot_lo": core_slot_lo,
        "core_slot_hi": core_slot_hi,
        "core_ax_start": core_ax_start,
        "slot_core_lo": slot_core_lo,
        "slot_has_axon": slot_has_axon,
        "buffer_size": float(c.arch.noc_buffer_size),
        "n_axons": n_axons,
    }
    c._sweep_tables = tables
    return tables


def default_message_cap(c: CompiledChip) -> int:
    """Static per-timestep message capacity: every axon firing plus one
    placeholder per core, clamped by SANAFE_TPU_SWEEP_CAP (default 16384,
    comfortably above DVS-gesture's ~3.4k messages/step; floor 4)."""
    cap = int(os.environ.get("SANAFE_TPU_SWEEP_CAP", "16384"))
    return min(len(c.axon_src_slot) + c.n_cores, max(cap, 4))


def make_device_sweep(
    c: CompiledChip,
    sync_delay: float,
    dtype,
    m_cap: Optional[int] = None,
):
    """Return a jittable ``(fired [T, N] bool, updated [T, N] bool) ->
    (sim_time [T] dtype, overflow [T] bool)`` detailed-timing function."""
    t = build_sweep_tables(c)
    if m_cap is None:
        m_cap = default_message_cap(c)
    M = int(m_cap)
    n_cores = c.n_cores

    f = lambda x: jnp.asarray(x, dtype=dtype)  # noqa: E731
    routes = jnp.asarray(t["routes"])          # [A, R] i32, -1 padded
    adj = f(t["adj"])
    dest_core = jnp.asarray(t["dest_core"])
    proc = f(t["proc"])
    min_hop = f(t["min_hop"])
    latency_out = f(t["latency_out"])
    hops_p1 = f(t["hops"] + 1)
    src_slot = jnp.asarray(t["src_slot"])
    ordinal0 = jnp.asarray(t["ordinal"] == 0)
    lat_base = f(t["lat_base"])
    lat_update = f(t["lat_update"])
    lat_spike = f(t["lat_spike"])
    core_slot_lo = jnp.asarray(t["core_slot_lo"])
    core_slot_hi = jnp.asarray(t["core_slot_hi"])
    core_ax_start = jnp.asarray(t["core_ax_start"])
    slot_core_lo = jnp.asarray(t["slot_core_lo"])
    slot_has_axon = jnp.asarray(t["slot_has_axon"])
    ax_src_core = jnp.asarray(c.axon_src_core, dtype=jnp.int32)
    buffer_size = float(t["buffer_size"])
    n_links = int(t["n_links"])
    n_axons = int(t["n_axons"])
    inf = jnp.asarray(np.inf, dtype=dtype)
    ax_ids = jnp.arange(n_axons, dtype=jnp.int32)

    def build_messages(fired_n, updated_n):
        """One timestep's global message table in core-major creation order
        (src/chip.cpp:624-654,802-834): per-core fired axons in slot order,
        then a trailing placeholder when leftover neuron-processing latency
        remains (mid=-1 in the reference)."""
        lat = lat_base + jnp.where(updated_n, lat_update, 0) + jnp.where(
            fired_n, lat_spike, 0
        )
        cl0 = jnp.concatenate([jnp.zeros(1, dtype=dtype), jnp.cumsum(lat)])
        fired_ax = fired_n[src_slot]                     # [A]
        cum_f0 = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(fired_ax.astype(jnp.int32), dtype=jnp.int32)]
        )                                                # exclusive prefix
        # previous message-emitting slot within the same core (or
        # core_lo - 1); only fired slots WITH axons emit
        slot_idx = jnp.arange(c.n_neurons, dtype=jnp.int32)
        marker = jnp.where(
            fired_n & slot_has_axon, slot_idx, jnp.int32(-1)
        )
        pf_incl = jax.lax.cummax(marker)
        pf_excl = jnp.concatenate([jnp.full(1, -1, jnp.int32), pf_incl[:-1]])
        prev_eff = jnp.maximum(pf_excl, slot_core_lo - 1)
        gen_slot = cl0[slot_idx + 1] - cl0[prev_eff + 1]
        # per-core placeholder remainder
        hi = jnp.maximum(core_slot_hi, 0)
        last_eff = jnp.maximum(pf_incl[hi], core_slot_lo - 1)
        rem = cl0[hi + 1] - cl0[last_eff + 1]
        ph = (rem != 0) & (core_slot_lo >= 0)
        ph_excl = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(ph.astype(jnp.int32), dtype=jnp.int32)]
        )
        msg_start = cum_f0[core_ax_start[:-1]] + ph_excl[:-1]      # [C]
        msg_end = cum_f0[core_ax_start[1:]] + ph_excl[1:]          # [C]
        total = msg_end[-1]
        # scatter fired axons to their global message positions
        pos = cum_f0[ax_ids] + ph_excl[ax_src_core]
        pos = jnp.where(fired_ax, pos, M)                # dropped when off
        msg_axon = jnp.full(M, -1, jnp.int32).at[pos].set(
            ax_ids, mode="drop"
        )
        gen_ax = jnp.where(ordinal0, gen_slot[src_slot], 0) + latency_out
        msg_gen = jnp.zeros(M, dtype=dtype).at[pos].set(gen_ax, mode="drop")
        # placeholder rows (msg_axon stays -1 there)
        ph_pos = jnp.where(ph, msg_end - 1, M)
        msg_gen = msg_gen.at[ph_pos].set(rem, mode="drop")
        return msg_axon, msg_gen, msg_start, msg_end, total > M

    def sweep_one(msg_axon, msg_gen, msg_start, msg_end):
        """The event loop. Each iteration either retires the earliest
        in-flight message (when its receive time precedes the next event,
        noc_update_all_tracked_messages src/schedule.cpp:380-400) or pops
        and handles the next message (schedule_handle_message
        src/schedule.cpp:306-358)."""
        head0 = msg_start
        has0 = head0 < msg_end
        sent0 = jnp.where(
            has0, msg_gen[jnp.minimum(head0, M - 1)], inf
        )
        carry = dict(
            head=head0,
            sent_next=sent0,
            density=jnp.zeros(n_links, dtype=dtype),
            fin=jnp.zeros(n_cores, dtype=dtype),
            mean=jnp.zeros((), dtype=dtype),
            n_inflight=jnp.zeros((), dtype=dtype),
            fleet_head=jnp.full(n_cores, -1, jnp.int32),
            fleet_tail=jnp.full(n_cores, -1, jnp.int32),
            head_recv=jnp.full(n_cores, np.inf, dtype=dtype),
            entry_recv=jnp.zeros(M, dtype=dtype),
            entry_next=jnp.full(M, -1, jnp.int32),
            last_ts=jnp.zeros((), dtype=dtype),
        )

        def cond(s):
            return jnp.isfinite(jnp.min(s["sent_next"]))

        def body(s):
            sent_next = s["sent_next"]
            t_ev = jnp.min(sent_next)
            c_star = jnp.argmin(sent_next).astype(jnp.int32)
            head_recv = s["head_recv"]
            r_min = jnp.min(head_recv)
            d_star = jnp.argmin(head_recv).astype(jnp.int32)
            active = jnp.isfinite(t_ev)
            do_retire = active & (r_min <= t_ev)
            do_handle = active & ~do_retire

            density = s["density"]
            mean = s["mean"]
            n_fl = s["n_inflight"]
            fleet_head = s["fleet_head"]
            fleet_tail = s["fleet_tail"]
            entry_recv = s["entry_recv"]
            entry_next = s["entry_next"]
            fin = s["fin"]
            head = s["head"]
            last_ts = s["last_ts"]

            # ---- retire the earliest-received in-flight message ----
            e = fleet_head[d_star]
            e_safe = jnp.maximum(e, 0)
            ea = jnp.maximum(msg_axon[e_safe], 0)
            r_links = routes[ea]                         # [R]
            r_valid = (r_links >= 0) & do_retire
            density = density.at[jnp.maximum(r_links, 0)].add(
                jnp.where(r_valid, -adj[ea], 0)
            )
            x = proc[ea]
            mean_rm = jnp.where(
                n_fl > 1, mean + (mean - x) / (n_fl - 1), 0.0
            )
            mean = jnp.where(do_retire, mean_rm, mean)
            n_fl = n_fl - jnp.where(do_retire, 1, 0).astype(dtype)
            is_tail = e == fleet_tail[d_star]
            nxt = jnp.where(is_tail, jnp.int32(-1), entry_next[e_safe])
            fleet_head = fleet_head.at[d_star].set(
                jnp.where(do_retire, nxt, fleet_head[d_star])
            )
            nxt_recv = jnp.where(
                nxt >= 0, entry_recv[jnp.maximum(nxt, 0)], inf
            )
            head_recv = head_recv.at[d_star].set(
                jnp.where(do_retire, nxt_recv, head_recv[d_star])
            )

            # ---- pop + handle the next message ----
            i = head[c_star]
            i_safe = jnp.minimum(i, M - 1)
            a = msg_axon[i_safe]
            is_msg = do_handle & (a >= 0)
            aa = jnp.maximum(a, 0)
            h_links = routes[aa]
            h_valid = h_links >= 0
            flow = jnp.sum(
                jnp.where(h_valid, density[jnp.maximum(h_links, 0)], 0)
            )
            cap = hops_p1[aa] * buffer_size
            block = jnp.where(flow > cap, (flow - cap) * mean, 0.0)
            sent_adj = t_ev + jnp.where(is_msg, block, 0.0)
            congestion = flow * mean / hops_p1[aa]
            net = jnp.maximum(min_hop[aa], congestion)
            earliest = sent_adj + net
            d = dest_core[aa]
            fin_d = fin[d]
            recv = jnp.maximum(fin_d, earliest)
            fin_new = recv + proc[aa]
            fin = fin.at[d].set(jnp.where(is_msg, fin_new, fin_d))
            last_ts = jnp.maximum(last_ts, jnp.where(active, t_ev, 0))
            last_ts = jnp.maximum(
                last_ts, jnp.where(is_msg, fin_new, 0)
            )
            density = density.at[jnp.maximum(h_links, 0)].add(
                jnp.where(h_valid & is_msg, adj[aa], 0)
            )
            mean = jnp.where(
                is_msg, mean + (proc[aa] - mean) / (n_fl + 1), mean
            )
            n_fl = n_fl + jnp.where(is_msg, 1, 0).astype(dtype)
            # fleet append (arrival order per dest core)
            fh = fleet_head[d]
            was_empty = fh < 0
            entry_recv = entry_recv.at[i_safe].set(
                jnp.where(is_msg, recv, entry_recv[i_safe])
            )
            tail = jnp.maximum(fleet_tail[d], 0)
            entry_next = entry_next.at[tail].set(
                jnp.where(is_msg & ~was_empty, i, entry_next[tail])
            )
            fleet_head = fleet_head.at[d].set(
                jnp.where(is_msg & was_empty, i, fleet_head[d])
            )
            fleet_tail = fleet_tail.at[d].set(
                jnp.where(is_msg, i, fleet_tail[d])
            )
            head_recv = head_recv.at[d].set(
                jnp.where(is_msg & was_empty, recv, head_recv[d])
            )
            # advance the popped core: its next message is sent right after
            # this one finished sending (src/schedule.cpp:360-378)
            h_new = i + 1
            exhausted = h_new >= msg_end[c_star]
            g_next = msg_gen[jnp.minimum(h_new, M - 1)]
            sent_new = jnp.where(exhausted, inf, sent_adj + g_next)
            sent_next = sent_next.at[c_star].set(
                jnp.where(do_handle, sent_new, sent_next[c_star])
            )
            head = head.at[c_star].set(
                jnp.where(do_handle, h_new, head[c_star])
            )

            return dict(
                head=head, sent_next=sent_next, density=density, fin=fin,
                mean=mean, n_inflight=n_fl, fleet_head=fleet_head,
                fleet_tail=fleet_tail, head_recv=head_recv,
                entry_recv=entry_recv, entry_next=entry_next,
                last_ts=last_ts,
            )

        out = jax.lax.while_loop(cond, body, carry)
        return out["last_ts"] + jnp.asarray(sync_delay, dtype=dtype)

    def sweep_chunk(fired, updated):
        """fired/updated: [T, n_neurons] bool -> (sim_time [T], overflow [T])."""
        msg_axon, msg_gen, msg_start, msg_end, overflow = jax.vmap(
            build_messages
        )(fired, updated)
        sim = jax.vmap(sweep_one)(msg_axon, msg_gen, msg_start, msg_end)
        return sim, overflow

    # exposed for tests/debugging
    sweep_chunk.build_messages = jax.vmap(build_messages)
    sweep_chunk.sweep_one = jax.vmap(sweep_one)
    return sweep_chunk


def unpack_masks(masks_packed, n_neurons: int):
    """Device-side inverse of ops.step._packbits2: [T, 2, nbytes] uint8 ->
    (fired [T, N] bool, updated [T, N] bool)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (masks_packed[..., None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(masks_packed.shape[0], 2, -1)[:, :, :n_neurons]
    return bits[:, 0].astype(bool), bits[:, 1].astype(bool)
