"""Timing models: per-timestep message scheduling.

Three tiers, mirroring the reference (``src/schedule.cpp``):

- **simple**: computed fully on device inside the step kernel
  (``ops/step.py``) as segment reductions (src/schedule.cpp:61-102).
- **detailed**: semi-analytical NoC congestion sweep
  (src/schedule.cpp:208-611). The device streams per-step fired-axon tensors
  and generation latencies; by default the host replays the exact serial
  event sweep (this module / native_src/scheduler.cpp). Two on-device
  reformulations exist as opt-in tiers (``ops/device_sweep.py``,
  ``ops/merge_sweep.py`` — ``device_sweep=True``), raster-identical with a
  measured sim_time deviation band (TPU_PARITY.json).
- **cycle**: flit-level cycle-accurate NoC model, implemented natively in
  ``native_src/cycle_noc.h`` and run via ``native.run_chunk_cycle`` (see
  chip.py). The reference's external Booksim2 fork is not fetchable in this
  environment; the model is pinned by hand-traced flit schedules instead
  (tests/test_cycle_noc.py). Without the native toolchain, ``cycle`` falls
  back to the detailed model with a warning.

Message records produced here feed messages.csv / the in-memory message trace.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..compile import CompiledChip

# Link index layout per tile: 4 directions + one link per core
# (src/schedule.hpp:171-204)
NORTH, EAST, SOUTH, WEST = 0, 1, 2, 3
NDIRECTIONS = 4


@dataclass
class MessageRecord:
    """One scheduled spike message (src/message.hpp:18-62)."""

    mid: int
    timestep: int
    src_neuron_group: str
    src_neuron_offset: int
    generation_delay: float
    processing_delay: float = 0.0
    network_delay: float = 0.0
    min_hop_delay: float = 0.0
    blocking_delay: float = 0.0
    sent_timestamp: float = -np.inf
    received_timestamp: float = -np.inf
    processed_timestamp: float = -np.inf
    messages_along_route: float = 0.0
    spikes: int = 0
    hops: int = 0
    src_x: int = 0
    src_y: int = 0
    dest_x: int = 0
    dest_y: int = 0
    src_tile_id: int = 0
    src_core_id: int = 0
    src_core_offset: int = 0
    dest_tile_id: int = 0
    dest_core_id: int = 0
    dest_core_offset: int = 0
    dest_axon_id: int = 0
    placeholder: bool = True
    in_noc: bool = False


def build_timestep_messages(
    compiled: CompiledChip,
    fired_axons: np.ndarray,
    neuron_gen_latency: np.ndarray,
    timestep: int,
    mid_start: int,
) -> tuple[list[list[MessageRecord]], int]:
    """Reconstruct the per-core message lists for one timestep from the
    device outputs, replicating message construction order and generation
    delays (src/chip.cpp:624-654,802-834).

    Returns (messages_per_core, next_mid).
    """
    c = compiled
    messages: list[list[MessageRecord]] = [[] for _ in range(c.n_cores)]
    mid = mid_start

    fired_axon_ids = np.nonzero(fired_axons)[0]
    # Axon ids are allocated core-major, neuron-major, ordinal-major, so they
    # are already in per-core message creation order.
    slot_labels = compiled.neurons

    # Per-core accumulated generation delay tracking
    for core in c.cores:
        core_id = core.core_id
        slots = core.neuron_slots
        if not slots:
            continue
        lo, hi = slots[0], slots[-1]
        # axons from this core
        axon_ids = fired_axon_ids[
            (c.axon_src_core[fired_axon_ids] == core_id)
            if fired_axon_ids.size
            else slice(0, 0)
        ]
        acc = 0.0
        next_slot = lo  # next unaccounted neuron slot in this core
        core_msgs = messages[core_id]
        for axon_id in axon_ids:
            src_slot = int(c.axon_src_slot[axon_id])
            ordinal = int(c.axon_ordinal_in_neuron[axon_id])
            if ordinal == 0:
                # Account latency of all neurons up to and including src.
                # Strictly SEQUENTIAL accumulation (cumsum, not np.sum whose
                # pairwise tree rounds differently): the reference folds one
                # neuron's latency at a time into the core accumulator
                # (src/chip.cpp:727-728) and sim_time must match to the bit.
                seg = neuron_gen_latency[next_slot : src_slot + 1]
                if seg.size:
                    acc += float(np.cumsum(seg)[-1])
                next_slot = src_slot + 1
            ref = slot_labels[src_slot]
            rec = MessageRecord(
                mid=mid,
                timestep=timestep,
                src_neuron_group=ref.group_name,
                src_neuron_offset=ref.offset,
                generation_delay=acc + float(c.axon_latency_out[axon_id]),
                processing_delay=float(
                    c.axon_const_processing_latency[axon_id]
                ),
                min_hop_delay=float(c.axon_min_hop_delay[axon_id]),
                spikes=int(c.axon_fanout[axon_id]),
                hops=int(c.axon_hops[axon_id]),
                src_x=int(c.axon_src_x[axon_id]),
                src_y=int(c.axon_src_y[axon_id]),
                dest_x=int(c.axon_dest_x[axon_id]),
                dest_y=int(c.axon_dest_y[axon_id]),
                src_tile_id=int(
                    c.cores[int(c.axon_src_core[axon_id])].tile_id
                ),
                src_core_id=int(c.axon_src_core[axon_id]),
                src_core_offset=int(c.axon_src_core_offset[axon_id]),
                dest_tile_id=int(c.axon_dest_tile[axon_id]),
                dest_core_id=int(c.axon_dest_core[axon_id]),
                dest_core_offset=int(c.axon_dest_core_offset[axon_id]),
                dest_axon_id=0,
                placeholder=False,
            )
            acc = 0.0
            mid += 1
            core_msgs.append(rec)
        # Remaining neuron processing becomes a placeholder message
        # (src/chip.cpp:640-652); sequential accumulation as above
        tail = neuron_gen_latency[next_slot : hi + 1]
        remainder = float(np.cumsum(tail)[-1]) if tail.size else 0.0
        if remainder != 0.0:
            last_ref = slot_labels[hi]
            placeholder = MessageRecord(
                mid=-1,
                timestep=timestep,
                src_neuron_group=last_ref.group_name,
                src_neuron_offset=last_ref.offset,
                generation_delay=remainder,
                src_x=int(c.arch.tiles[core.tile_id].x),
                src_y=int(c.arch.tiles[core.tile_id].y),
                src_tile_id=core.tile_id,
                src_core_id=core_id,
                src_core_offset=core.offset_within_tile,
                placeholder=True,
            )
            core_msgs.append(placeholder)

    return messages, mid


def write_message_rows_fast(
    compiled: CompiledChip,
    fields: dict[str, np.ndarray],
    timestep: int,
    mid_start: int,
    sink,
    sort_perm=None,
) -> int:
    """Stream one timestep's messages.csv rows straight from the native
    scheduler's flat field arrays — byte-identical to the
    MessageRecord/write_message_row path (same %g formatting and the same
    libstdc++ sort permutation for placeholder ordering) without building
    a Python object per message. Returns the next message id.

    Seven of the sixteen columns are per-axon constants; their formatted
    fragments are cached on the compiled chip.
    """
    from ..trace import fmt_g

    c = compiled
    cache = getattr(c, "_msg_row_cache", None)
    if cache is None:
        ax_frag = []
        minhop_str = []
        for a in range(len(c.axon_src_slot)):
            ref = c.neurons[int(c.axon_src_slot[a])]
            src_core = c.cores[int(c.axon_src_core[a])]
            ax_frag.append(
                f"{ref.group_name}.{ref.offset},"
                f"{src_core.tile_id}.{int(c.axon_src_core_offset[a])},"
                f"{int(c.axon_dest_tile[a])}."
                f"{int(c.axon_dest_core_offset[a])},"
                f"{int(c.axon_hops[a])},{int(c.axon_fanout[a])},"
            )
            minhop_str.append(fmt_g(float(c.axon_min_hop_delay[a])))
        core_frag = []
        for core in c.cores:
            if core.neuron_slots:
                last_ref = c.neurons[core.neuron_slots[-1]]
                core_frag.append(
                    f"{last_ref.group_name}.{last_ref.offset},"
                    f"{core.tile_id}.{core.offset_within_tile},x.x,0,0,"
                )
            else:
                core_frag.append("")
        cache = (ax_frag, minhop_str, core_frag)
        c._msg_row_cache = cache
    ax_frag, minhop_str, core_frag = cache

    axons = fields["axon"].tolist()
    src_cores = fields["src_core"].tolist()
    gen = fields["generation_delay"].tolist()
    procd = fields["processing_delay"].tolist()
    net = fields["network_delay"].tolist()
    block = fields["blocking_delay"].tolist()
    sent = fields["sent_timestamp"].tolist()
    recv = fields["received_timestamp"].tolist()
    proc_ts = fields["processed_timestamp"].tolist()
    route = fields["route_density"].tolist()

    mids = []
    placeholders = []
    mid = mid_start
    for a in axons:
        if a >= 0:
            mids.append(mid)
            mid += 1
            placeholders.append(False)
        else:
            mids.append(-1)
            placeholders.append(True)
    if sort_perm is not None:
        perm = sort_perm(mids, placeholders)
    else:
        perm = sorted(
            range(len(mids)), key=lambda k: (placeholders[k], mids[k])
        )

    rows = []
    for k in perm:
        a = axons[k]
        if a >= 0:
            rows.append(
                f"{timestep},{mids[k]},{ax_frag[a]}"
                f"{fmt_g(sent[k])},{fmt_g(recv[k])},{fmt_g(proc_ts[k])},"
                f"{fmt_g(gen[k])},{fmt_g(procd[k])},{fmt_g(net[k])},"
                f"{fmt_g(block[k])},{minhop_str[a]},{fmt_g(route[k])}\n"
            )
        else:
            rows.append(
                f"{timestep},-1,{core_frag[src_cores[k]]}"
                f"{fmt_g(sent[k])},-inf,-inf,{fmt_g(gen[k])},0,0,0,0,0\n"
            )
    sink.write("".join(rows))
    return mid


def records_from_native(
    compiled: CompiledChip,
    fields: dict[str, np.ndarray],
    timestep: int,
    mid_start: int,
) -> tuple[list[list[MessageRecord]], int]:
    """Convert the native scheduler's flat per-message field arrays (creation
    order, core-major) into per-core MessageRecord lists with mids."""
    c = compiled
    messages: list[list[MessageRecord]] = [[] for _ in range(c.n_cores)]
    mid = mid_start
    axons = fields["axon"]
    for k in range(len(axons)):
        axon_id = int(axons[k])
        src_core = int(fields["src_core"][k])
        if axon_id >= 0:
            src_slot = int(c.axon_src_slot[axon_id])
            ref = c.neurons[src_slot]
            core = c.cores[src_core]
            rec = MessageRecord(
                mid=mid,
                timestep=timestep,
                src_neuron_group=ref.group_name,
                src_neuron_offset=ref.offset,
                generation_delay=float(fields["generation_delay"][k]),
                processing_delay=float(fields["processing_delay"][k]),
                network_delay=float(fields["network_delay"][k]),
                min_hop_delay=float(c.axon_min_hop_delay[axon_id]),
                blocking_delay=float(fields["blocking_delay"][k]),
                sent_timestamp=float(fields["sent_timestamp"][k]),
                received_timestamp=float(fields["received_timestamp"][k]),
                processed_timestamp=float(fields["processed_timestamp"][k]),
                messages_along_route=float(fields["route_density"][k]),
                spikes=int(c.axon_fanout[axon_id]),
                hops=int(c.axon_hops[axon_id]),
                src_x=int(c.axon_src_x[axon_id]),
                src_y=int(c.axon_src_y[axon_id]),
                dest_x=int(c.axon_dest_x[axon_id]),
                dest_y=int(c.axon_dest_y[axon_id]),
                src_tile_id=int(c.cores[src_core].tile_id),
                src_core_id=src_core,
                src_core_offset=int(c.axon_src_core_offset[axon_id]),
                dest_tile_id=int(c.axon_dest_tile[axon_id]),
                dest_core_id=int(c.axon_dest_core[axon_id]),
                dest_core_offset=int(c.axon_dest_core_offset[axon_id]),
                dest_axon_id=0,
                placeholder=False,
            )
            mid += 1
        else:
            core = c.cores[src_core]
            hi = core.neuron_slots[-1]
            last_ref = c.neurons[hi]
            tile = c.arch.tiles[core.tile_id]
            rec = MessageRecord(
                mid=-1,
                timestep=timestep,
                src_neuron_group=last_ref.group_name,
                src_neuron_offset=last_ref.offset,
                generation_delay=float(fields["generation_delay"][k]),
                sent_timestamp=float(fields["sent_timestamp"][k]),
                src_x=int(tile.x),
                src_y=int(tile.y),
                src_tile_id=core.tile_id,
                src_core_id=src_core,
                src_core_offset=core.offset_within_tile,
                placeholder=True,
            )
        messages[src_core].append(rec)
    return messages, mid


class NocModel:
    """Tracked NoC state for the detailed timing model
    (src/schedule.hpp:171-204, src/schedule.cpp:294-611)."""

    def __init__(self, compiled: CompiledChip):
        arch = compiled.arch
        self.width = arch.noc_width_in_tiles
        self.height = arch.noc_height_in_tiles
        self.buffer_size = arch.noc_buffer_size
        self.core_count = compiled.n_cores
        self.max_cores_per_tile = max(arch.max_cores_per_tile, 1)
        self.links_per_tile = NDIRECTIONS + self.max_cores_per_tile
        self.density = np.zeros(
            self.width * self.height * self.links_per_tile
        )
        self.core_finished_receiving = np.zeros(self.core_count)
        self.messages_received: list[list[MessageRecord]] = [
            [] for _ in range(self.core_count)
        ]
        self.mean_in_flight_receive_delay = 0.0
        self.messages_in_noc = 0

    def idx(self, x: int, y: int, link: int) -> int:
        return (x * self.height + y) * self.links_per_tile + link

    def _route_links(self, m: MessageRecord):
        """Links along m's dimension-order (x then y) route
        (src/schedule.cpp:478-553)."""
        links = []
        x_inc = 1 if m.src_x < m.dest_x else -1
        y_inc = 1 if m.src_y < m.dest_y else -1
        prev_direction = NDIRECTIONS + m.src_core_offset
        x = m.src_x
        while x != m.dest_x:
            direction = EAST if x_inc > 0 else WEST
            if x == m.src_x:
                links.append(
                    self.idx(x, m.src_y, NDIRECTIONS + m.src_core_offset)
                )
            else:
                links.append(self.idx(x, m.src_y, direction))
            prev_direction = direction
            x += x_inc
        y = m.src_y
        while y != m.dest_y:
            direction = NORTH if y_inc > 0 else SOUTH
            if m.src_x == m.dest_x and y == m.src_y:
                links.append(
                    self.idx(m.dest_x, y, NDIRECTIONS + m.src_core_offset)
                )
            else:
                links.append(self.idx(m.dest_x, y, prev_direction))
            prev_direction = direction
            y += y_inc
        if m.src_x == m.dest_x and m.src_y == m.dest_y:
            links.append(
                self.idx(m.dest_x, m.dest_y, NDIRECTIONS + m.src_core_offset)
            )
        else:
            links.append(self.idx(m.dest_x, m.dest_y, prev_direction))
        return links

    def route_congestion(self, m: MessageRecord) -> float:
        return float(sum(self.density[l] for l in self._route_links(m)))

    def update_message_density(self, m: MessageRecord, entering: bool) -> None:
        adjust = 1.0 / (2.0 + m.hops)
        if not entering:
            adjust = -adjust
        for link in self._route_links(m):
            self.density[link] += adjust

    def update_rolling_averages(self, m: MessageRecord, entering: bool) -> None:
        if entering:
            self.mean_in_flight_receive_delay += (
                m.processing_delay - self.mean_in_flight_receive_delay
            ) / (self.messages_in_noc + 1.0)
            self.messages_in_noc += 1
        else:
            if self.messages_in_noc > 1:
                self.mean_in_flight_receive_delay += (
                    self.mean_in_flight_receive_delay - m.processing_delay
                ) / (self.messages_in_noc - 1.0)
            else:
                self.mean_in_flight_receive_delay = 0.0
            self.messages_in_noc -= 1

    def retire_messages_before(self, t: float) -> None:
        """noc_update_all_tracked_messages (src/schedule.cpp:380-400)."""
        for queue in self.messages_received:
            kept = []
            for m in queue:
                if m.in_noc and t >= m.received_timestamp:
                    m.in_noc = False
                    self.update_message_density(m, False)
                    self.update_rolling_averages(m, False)
                else:
                    kept.append(m)
            queue[:] = kept


class LibstdcxxMinHeap:
    """Replica of libstdc++'s std::priority_queue heap algorithms
    (bits/stl_heap.h ``__push_heap`` / ``__pop_heap`` / ``__adjust_heap``)
    with the reference's comparator, which orders ONLY by sent timestamp
    (CompareMessagesBySentTime, src/message.cpp:61-65). Python's ``heapq``
    sifts differently, and the reference's results depend on how EQUAL
    timestamps happen to be ordered by the sift — so the exact algorithm is
    reproduced here. Entries are (key, payload); comparisons never look at
    the payload."""

    __slots__ = ("_v",)

    def __init__(self):
        self._v: list = []

    def __bool__(self):
        return bool(self._v)

    def push(self, key: float, payload) -> None:
        v = self._v
        v.append((key, payload))
        # __push_heap(first, hole=len-1, top=0, value)
        hole = len(v) - 1
        value = v[hole]
        parent = (hole - 1) // 2
        while hole > 0 and v[parent][0] > value[0]:
            v[hole] = v[parent]
            hole = parent
            parent = (hole - 1) // 2
        v[hole] = value

    def pop(self):
        v = self._v
        top = v[0]
        value = v.pop()
        length = len(v)
        if length == 0:
            return top
        # __adjust_heap(first, hole=0, len, value)
        hole = 0
        second = hole
        while second < (length - 1) // 2:
            second = 2 * (second + 1)
            if v[second][0] > v[second - 1][0]:
                second -= 1
            v[hole] = v[second]
            hole = second
        if (length & 1) == 0 and second == (length - 2) // 2:
            second = 2 * (second + 1)
            v[hole] = v[second - 1]
            hole = second - 1
        # trailing __push_heap with the displaced value
        parent = (hole - 1) // 2
        while hole > 0 and v[parent][0] > value[0]:
            v[hole] = v[parent]
            hole = parent
            parent = (hole - 1) // 2
        v[hole] = value
        return top


def schedule_timestep_detailed(
    compiled: CompiledChip,
    messages_per_core: list[list[MessageRecord]],
    sync_delay: float,
) -> float:
    """The detailed semi-analytical sweep (src/schedule.cpp:208-292).

    Mutates the message records with delays/timestamps; returns sim_time.
    """
    noc = NocModel(compiled)
    queues = [list(core_msgs) for core_msgs in messages_per_core]
    heads = [0] * len(queues)

    heap = LibstdcxxMinHeap()
    last_timestamp = 0.0

    def push_next(core_id: int, base_ts: Optional[float]) -> float:
        i = heads[core_id]
        heads[core_id] += 1
        m = queues[core_id][i]
        if base_ts is None:
            sent = m.generation_delay
        else:
            sent = base_ts + m.generation_delay
        m.sent_timestamp = sent
        heap.push(sent, (core_id, i))
        return sent

    for core_id, queue in enumerate(queues):
        if queue:
            last = push_next(core_id, None)
            last_timestamp = max(last_timestamp, last)

    while heap:
        sent_ts, (core_id, msg_idx) = heap.pop()
        m = queues[core_id][msg_idx]
        last_timestamp = max(last_timestamp, m.sent_timestamp)
        noc.retire_messages_before(m.sent_timestamp)

        if not m.placeholder:
            # schedule_handle_message (src/schedule.cpp:306-358)
            dest_core = m.dest_core_id
            m.messages_along_route = noc.route_congestion(m)
            path_capacity = (m.hops + 1) * noc.buffer_size
            if m.messages_along_route > path_capacity:
                m.blocking_delay = (
                    m.messages_along_route - path_capacity
                ) * noc.mean_in_flight_receive_delay
                m.sent_timestamp += m.blocking_delay
            else:
                m.blocking_delay = 0.0
            congestion_delay = (
                m.messages_along_route
                * noc.mean_in_flight_receive_delay
                / (m.hops + 1.0)
            )
            m.network_delay = max(m.min_hop_delay, congestion_delay)
            earliest_received = m.sent_timestamp + m.network_delay
            m.received_timestamp = max(
                noc.core_finished_receiving[dest_core], earliest_received
            )
            noc.core_finished_receiving[dest_core] = max(
                noc.core_finished_receiving[dest_core] + m.processing_delay,
                earliest_received + m.processing_delay,
            )
            m.processed_timestamp = noc.core_finished_receiving[dest_core]
            last_timestamp = max(last_timestamp, m.processed_timestamp)
            m.in_noc = True
            noc.messages_received[dest_core].append(m)
            noc.update_message_density(m, True)
            noc.update_rolling_averages(m, True)

        # push this core's next message, sent right after the current one
        # finished sending (src/schedule.cpp:360-378) — note the base is the
        # current message's (possibly blocking-adjusted) sent timestamp
        if heads[core_id] < len(queues[core_id]):
            next_sent = push_next(core_id, m.sent_timestamp)
            last_timestamp = max(last_timestamp, next_sent)

    return last_timestamp + sync_delay


def schedule_timestep_simple_messages(
    messages_per_core: list[list[MessageRecord]],
) -> None:
    """Fill per-message delay fields for the simple model
    (src/schedule.cpp:78-87); sim_time itself comes from the device."""
    for queue in messages_per_core:
        for m in queue:
            m.blocking_delay = 0.0
            m.network_delay = m.min_hop_delay
