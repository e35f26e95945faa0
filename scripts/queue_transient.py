"""Transient queue-occupancy model for NoC link buffers.

Port of /root/reference/scripts/queue_transient.py: a small discrete-event
simulation of one bounded FIFO (a link buffer in the detailed timing
model) under either Poisson or bursty arrivals with fixed or
exponentially distributed service times, plotting queue occupancy over
time. The reference re-sorts its event list on every iteration; this
version uses a heap.

Usage:
  python scripts/queue_transient.py [--arrivals bursty|poisson]
      [--messages 200] [--buffer-size 60] [--out queue.png]
"""

from __future__ import annotations

import argparse
import heapq
import random


def make_arrivals(mode: str, messages: int, arrival_rate: float,
                  rng: random.Random) -> list[float]:
    if mode == "poisson":
        return [rng.expovariate(arrival_rate) for _ in range(messages)]
    # bursty: quick 6-message bursts at the wire rate, then a longer gap
    burst = [5.1e-9] * 6 + [rng.uniform(30e-9, 90e-9)]
    times = (burst * ((messages // len(burst)) + 1))[:messages]
    return times


def make_service(mode: str, messages: int, server_rate: float,
                 rng: random.Random) -> list[float]:
    if mode == "poisson":
        return [rng.expovariate(server_rate) for _ in range(messages)]
    return [70e-9] * messages


def simulate(interarrival: list[float], service: list[float],
             buffer_size: int) -> tuple[list[float], list[int]]:
    """Bounded single-server FIFO: arrivals beyond the buffer are dropped;
    the head of the queue schedules its service on entry."""
    service = list(service)
    events: list[tuple[float, int]] = []
    t = 0.0
    for gap in interarrival:
        assert gap > 0
        t += gap
        events.append((t, +1))
    heapq.heapify(events)

    times = [0.0]
    queue_sizes = [0]
    queue_len = 0
    while events:
        t, kind = heapq.heappop(events)
        if kind == +1:  # arrival
            if queue_len < buffer_size:
                queue_len += 1
                if queue_len == 1:
                    heapq.heappush(events, (t + service.pop(0), -1))
        else:  # service completion
            queue_len -= 1
            if queue_len > 0:
                heapq.heappush(events, (t + service.pop(0), -1))
        times.append(t)
        queue_sizes.append(queue_len)
    return times, queue_sizes


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arrivals", choices=("bursty", "poisson"),
                        default="bursty")
    parser.add_argument("--messages", type=int, default=200)
    parser.add_argument("--buffer-size", type=int, default=60)
    parser.add_argument("--arrival-rate", type=float, default=1.0)
    parser.add_argument("--server-rate", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--out", default=None,
                        help="save the plot here instead of showing it")
    args = parser.parse_args(argv)

    rng = random.Random(args.seed)
    interarrival = make_arrivals(
        args.arrivals, args.messages, args.arrival_rate, rng
    )
    service = make_service(
        args.arrivals, args.messages, args.server_rate, rng
    )
    times, queue_sizes = simulate(interarrival, service, args.buffer_size)
    print(f"max occupancy {max(queue_sizes)} over {len(times) - 1} events")

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.plot(times, queue_sizes, "-")
    plt.xlabel("Time (s)")
    plt.ylabel("Queue occupancy (messages)")
    if args.out:
        plt.savefig(args.out)
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
