"""Exact cycle-count validation of the flit-level cmesh NoC
(sanafe_tpu/native_src/cycle_noc.h), the cycle timing tier standing in for the
reference's Booksim2 fork (src/schedule.cpp:104-167, config
src/schedule.hpp:228-255).

Every expected value below is a hand-traced schedule of the router
microarchitecture: per-cycle injection (one offer per source core per
cycle, blocked on full input buffers), switch allocation (head flits
eligible router_delay cycles after arrival, one winner per output port by
round-robin), commits (ejection serialized on the destination core;
link traversal consumes a credit in the next router's input buffer).

Defaults: router_delay=2, link_delay=1, buffer_size=8 flits.
A packet that never contends finishes at
    3*hops + router_delay + 1 + proc_cycles.
"""

import numpy as np
import pytest

try:
    from sanafe_tpu.native import NativeUnavailable, cycle_noc_run
except ImportError:  # pragma: no cover
    pytest.skip("native module unavailable", allow_module_level=True)


def run(pkts, **kwargs):
    cols = list(zip(*pkts))
    try:
        return cycle_noc_run(
            np.array(cols[0]), np.array(cols[1]), np.array(cols[2]),
            np.array(cols[3]), np.array(cols[4]), np.array(cols[5]),
            **kwargs,
        )
    except NativeUnavailable:  # pragma: no cover
        pytest.skip("C++ toolchain unavailable")


# packet = (src_router, dest_router, src_core, dest_core, ready, proc)


def test_zero_hop_ejection():
    """Inject at cycle 0; head flit becomes eligible at cycle 2
    (router_delay); the commit starts processing at cycle 3:
    done = 3 + proc."""
    last, done = run([(0, 0, 0, 0, 0, 5)])
    assert done.tolist() == [8]
    assert last == 8


@pytest.mark.parametrize("hops", [1, 2, 3])
def test_hop_latency(hops):
    """Each hop costs router_delay (2) + link_delay (1); the final router
    adds router_delay + 1 before processing starts:
    done = 3*hops + 3 + proc."""
    # travel east: router x*height+y with height=4 -> +4 per x hop
    last, done = run([(0, 4 * hops, 0, 0, 0, 7)])
    assert done.tolist() == [3 * hops + 3 + 7]


def test_round_robin_arbitration_and_ejection_serialization():
    """Two cores on router 0 race for the east port toward one dest core.

    Cycle 2: the east output's round-robin pointer (0) picks local input
    port 4 (core 0); cycle 3: pointer advanced past it picks port 5
    (core 1). Packet A arrives at router 1 at cycle 3, ejects at cycle 5
    (start 6, proc 2 -> done 8, core busy until 8). Packet B arrives
    cycle 4, eligible cycle 6, but the dest core is busy until cycle 8;
    the eject commits at cycle 8 -> start max(9, 8) = 9 -> done 11."""
    last, done = run([
        (0, 4, 0, 4, 0, 2),
        (0, 4, 1, 4, 0, 2),
    ])
    assert done.tolist() == [8, 11]
    assert last == 11


def test_same_source_injection_serializes():
    """One packet injected per source per cycle; both share the local
    input buffer. Head ejects with start 3 (done 3, proc 0); the second
    (injected cycle 1, eligible cycle 3) commits at cycle 3 with
    start max(4, core_free=3) = 4."""
    last, done = run([
        (0, 0, 0, 1, 0, 0),
        (0, 0, 0, 1, 0, 0),
    ])
    assert done.tolist() == [3, 4]


def test_injection_backpressure_single_flit_buffer():
    """buffer_size=1: the second packet cannot inject until the first
    leaves the local buffer at cycle 2, so it injects at cycle 3,
    becomes eligible at 5, and starts at 6."""
    last, done = run(
        [
            (0, 0, 0, 1, 0, 0),
            (0, 0, 0, 1, 0, 0),
        ],
        buffer_size=1,
    )
    assert done.tolist() == [3, 6]


def test_link_credit_backpressure_chain():
    """buffer_size=1, three cores on router 0 -> one busy dest core one
    hop east (proc 10). The single-slot input buffer at router 1 holds
    each flit until the previous ejection frees it, so the east link
    stalls on credits: completions at 16, 27, 38."""
    last, done = run(
        [
            (0, 4, 0, 4, 0, 10),
            (0, 4, 1, 4, 0, 10),
            (0, 4, 2, 4, 0, 10),
        ],
        buffer_size=1,
    )
    assert done.tolist() == [16, 27, 38]
    assert last == 38


def test_placeholder_and_idle_jump():
    """A placeholder (dest_router -1) only occupies generation; with
    nothing in flight the clock jumps straight to its ready cycle."""
    last, done = run([(0, -1, 0, 0, 7, 0)])
    assert done.tolist() == [7]
    assert last == 7


def test_ready_cycle_delays_injection():
    """A packet not ready until cycle 10 injects then (idle jump), so
    done = 10 + 3 + proc for a zero-hop trip."""
    last, done = run([(0, 0, 0, 0, 10, 4)])
    assert done.tolist() == [17]


# ---------------------------------------------------------------------------
# Bounding property tests (PARITY.md "cycle tier"): the reference's Booksim2
# fork is unfetchable here, so beyond the hand-traced schedules above, the
# tier is pinned by analytic invariants any correct flit-level cmesh must
# satisfy. src/schedule.cpp:104-167 drives the same per-packet quantities.
# ---------------------------------------------------------------------------


def _hops(src_router, dest_router, height=4):
    sx, sy = src_router // height, src_router % height
    dx, dy = dest_router // height, dest_router % height
    return abs(sx - dx) + abs(sy - dy)


def _random_batch(rng, n, width=8, height=4, cores_per_router=4):
    pkts = []
    for _ in range(n):
        sr = int(rng.integers(0, width * height))
        dr = int(rng.integers(0, width * height))
        sc = sr * cores_per_router + int(rng.integers(0, cores_per_router))
        dc = dr * cores_per_router + int(rng.integers(0, cores_per_router))
        ready = int(rng.integers(0, 20))
        proc = int(rng.integers(1, 12))
        pkts.append((sr, dr, sc, dc, ready, proc))
    return pkts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_batch_respects_min_hop_bound(seed):
    """Every packet's completion is >= its uncontended analytic latency
    ready + 3*hops + router_delay + 1 + proc (equality proven by the
    hand-traced single-packet tests): congestion only adds cycles."""
    rng = np.random.default_rng(seed)
    pkts = _random_batch(rng, 64)
    last, done = run(pkts)
    for (sr, dr, sc, dc, ready, proc), d in zip(pkts, done):
        lower = ready + 3 * _hops(sr, dr) + 3 + proc
        assert d >= lower, (sr, dr, ready, proc, d, lower)
    assert last == done.max()


@pytest.mark.parametrize("seed", [0, 7])
def test_ejection_serialization_throughput_bound(seed):
    """All packets to ONE destination core: ejection+processing is serial
    there, so the batch cannot finish before min_uncontended_arrival +
    sum(proc) - proc_first, and the makespan is >= sum(proc) + 3."""
    rng = np.random.default_rng(seed)
    pkts = _random_batch(rng, 32)
    pkts = [(sr, 0, sc, 0, ready, proc)
            for (sr, _, sc, _, ready, proc) in pkts]
    last, done = run(pkts)
    total_proc = sum(p[5] for p in pkts)
    min_ready = min(p[4] for p in pkts)
    assert last >= min_ready + 3 + total_proc


@pytest.mark.parametrize("seed", [0, 5])
def test_added_load_never_speeds_completion(seed):
    """Makespan is monotone in offered load: running a subset of a batch
    never finishes later than the full batch."""
    rng = np.random.default_rng(seed)
    pkts = _random_batch(rng, 48)
    last_full, _ = run(pkts)
    last_half, _ = run(pkts[:24])
    assert last_half <= last_full


# ---------------------------------------------------------------------------
# subnets = 2 (booksim.config): two physical subnetwork copies; injection
# and ejection cores stay shared. Assignment is per-source round-robin over
# routed packets (cycle_noc::Params::subnets documents the model and the
# remaining fork-internal uncertainty).
# ---------------------------------------------------------------------------


def test_subnets_single_packet_identical():
    """An uncontended packet sees one network either way: the zero-load
    latency formula holds for any subnet count."""
    for subnets in (1, 2, 4):
        last, done = run([(0, 8, 0, 35, 0, 7)], subnets=subnets)
        assert done.tolist() == [3 * 2 + 3 + 7]


def test_subnets_round_robin_assignment_pipelines_one_source():
    """Two packets from one source to the same router (different dest
    cores): the second rides subnet 1, so both trees are uncontended and
    the only serialization left is the shared generation pipeline (one
    injection offer per cycle). Hand-trace, router_delay=2, link_delay=1:
    p0 injects at 0, crosses east at 2, arrives 3, ejects at 5 (starts 6);
    p1 injects at 1 (own subnet), crosses at 3, arrives 4, ejects at 6
    (starts 7). done = start + proc."""
    pkts = [(0, 4, 0, 16, 0, 5), (0, 4, 0, 17, 0, 5)]
    last1, done1 = run(pkts, subnets=1)
    last2, done2 = run(pkts, subnets=2)
    assert done2.tolist() == [11, 12]
    # with one subnet the shared input buffer gives the same 1-cycle
    # stagger here — congestion-free pipelines are subnet-insensitive
    assert done1.tolist() == done2.tolist()


def test_subnets_halve_congested_link_throughput():
    """All four cores of router 0 streaming across the same east link
    (offered load 4 flits/cycle): the link moves 1 flit/cycle/subnet, so
    doubling subnets roughly halves the makespan once the link saturates
    (per-source round-robin splits each source's stream evenly)."""
    n = 40
    pkts = [(0, 28, i % 4, 112 + (i % 4), 0, 1) for i in range(n)]
    last1, _ = run(pkts, subnets=1, n_cores=128)
    last2, _ = run(pkts, subnets=2, n_cores=128)
    assert last2 < last1
    # saturated-link bound: n flits over one link ~ n cycles; two subnets
    # need only ~n/2 + pipeline depth
    assert last1 >= n
    assert last2 <= last1 - n // 4


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_subnets_random_batch_bounds(seed):
    """Random batches under subnets=2 keep the per-packet zero-load lower
    bound, stay deterministic call-to-call, and never finish later than
    the single-subnet run (more physical links, same shared cores)."""
    rng = np.random.default_rng(seed)
    pkts = _random_batch(rng, 64)
    last1, _ = run(pkts, subnets=1)
    last2a, done2a = run(pkts, subnets=2)
    last2b, done2b = run(pkts, subnets=2)
    assert last2a == last2b and done2a.tolist() == done2b.tolist()
    for (sr, dr, sc, dc, ready, proc), d in zip(pkts, done2a):
        assert d >= ready + 3 * _hops(sr, dr) + 3 + proc
    assert last2a <= last1


def test_subnets_shared_ejection_still_serializes():
    """Packets split across subnets but aimed at ONE destination core:
    the core is physical, so total processing still lower-bounds the
    makespan regardless of subnet count."""
    rng = np.random.default_rng(3)
    pkts = [(sr, 0, sc, 0, ready, proc)
            for (sr, _, sc, _, ready, proc) in _random_batch(rng, 24)]
    last, _ = run(pkts, subnets=2)
    total_proc = sum(p[5] for p in pkts)
    min_ready = min(p[4] for p in pkts)
    assert last >= min_ready + 3 + total_proc


def test_proc_cycles_monotone():
    """Growing one packet's processing time cannot shrink the makespan."""
    rng = np.random.default_rng(11)
    pkts = _random_batch(rng, 16)
    last_a, _ = run(pkts)
    bumped = [(sr, dr, sc, dc, ready, proc + 50) if i == 7 else p
              for i, p in enumerate(pkts)
              for (sr, dr, sc, dc, ready, proc) in [p]]
    last_b, _ = run(bumped)
    assert last_b >= last_a
