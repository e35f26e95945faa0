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
