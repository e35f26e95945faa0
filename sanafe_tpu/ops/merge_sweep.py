"""Exact-order detailed-timing NoC sweep as a Pallas TPU kernel.

Second-generation device sweep tier. The reference's detailed timing model
(``src/schedule.cpp:208-611``) is a serial event loop: messages pop from a
priority queue keyed by sent-timestamp, and each pop updates globally
coupled NoC state (per-link density, rolling mean of in-flight processing
delays, per-destination-core finish chains, retirement of received
messages). The first-generation device tier (``ops/device_sweep.py``)
vmapped that loop over chunk timesteps but relied on per-lane
gather/scatter, which TPUs serialize lane-by-lane — measured superlinear
in the lane count and far too slow at DVS scale.

This version keeps the EXACT dynamic event order and eliminates every
per-lane gather/scatter:

- The priority queue is a k-way merge over per-core message chains: the
  per-core candidate keys live in a dense ``[lanes, n_cores]`` block and
  the pop is an argmin. (A core's next message is sent only after its
  previous one, reference ``src/schedule.cpp:360-378``, so at most one
  candidate per core exists at any time.)
- Per-link density updates use arithmetic one-hot masks built from the
  message's route GEOMETRY: a dimension-order route is exactly {entry
  link} + {a contiguous X-range of east/west links} + {a contiguous
  Y-range of north/south links} (``noc_get_links``,
  ``src/schedule.cpp:478-553``), so the ``[lanes, n_links]`` delta is
  three broadcast range/one-hot products — no scatter.
- In-flight messages live in a dense ring ``[lanes, F]``; retirement pops
  the min-receive-time entry via argmin + one-hot.
- The only data-dependent memory accesses are one small per-lane column
  read of the popped message's fields — bounded, unrolled over the lanes.

Timesteps are independent (the tracked NoC state resets every step,
``src/schedule.cpp:380-400``), so kernel lanes = timesteps. A chunk's
steps are sorted by message count into waves of ``LANES`` (balancing each
wave) and the kernel runs the waves through the Pallas grid pipeline —
per-event cost is a few hundred VPU ops on VMEM-resident state with zero
kernel-launch overhead, while the next wave's message tables stream into
VMEM in the background.

Deviations vs the bit-exact host sweep, all within the ≤1% north-star
budget (measured on DVS-gesture: total sim_time +0.03% over 100 steps in
f64, +0.04% over 200 steps in f32; spike rasters and energies are
unaffected by the timing tier):

- Ties pop by core id (argmin) instead of libstdc++ heap-sift order, and
  retirement processes in receive-time order instead of dest-core order.
- Message generation delays come from prefix-sum differences instead of
  the reference's sequential per-slot accumulation — same values up to
  summation-order round-off.
- On TPU the sweep arithmetic is float32.

The round-off deviations are not always round-off-sized per step: the
blocking heuristic is a hinge (``flow > capacity`` ⇒ add a blocking
delay, src/schedule.cpp:322-333), so a one-ulp difference in a sent
timestamp can flip the hinge on a congested step and move that step's
sim_time by a few percent. Uncongested steps (the hinge never close to
tripping — all small configs, and the majority of DVS steps) reproduce
the host sweep to float round-off; congested steps deviate up to ~3%
per step in either direction, cancelling to ≤0.1% in total. Callers
needing bit-exact per-step times (messages.csv) use the host sweep.

Steps whose message count exceeds the static capacity, or whose in-flight
ring overflows, are flagged in ``need_host`` and re-swept exactly on the
host — the packed masks are already fetched for the spike trace, so the
fallback costs only the sweep of the flagged steps.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import CompiledChip
from .device_sweep import build_sweep_tables

# f32 field columns per message
F_KEY, F_ADJ, F_PROC, F_MINHOP, F_CAP, F_HOPS1 = range(6)
NF_F = 6
# i32 field columns per message
I_DEST, I_GEO = range(2)
NF_I = 2
# packed single-table layout (default): every float field bitcast to the
# same-width int so ONE aligned 128-row load per lane per iteration feeds
# the whole event — the extra F_KEYNXT column is msg_gen shifted left by
# one, replacing the second load at position p+1. One-hot extraction sums
# integers (exact bit transport; float sums would canonicalize NaN
# payloads such as dest == -1).
(P_KEY, P_ADJ, P_PROC, P_MINHOP, P_CAP, P_HOPS1, P_KEYNXT, P_DEST,
 P_GEO) = range(9)
NF_P = 9


def _pack_geo(c: CompiledChip) -> np.ndarray:
    """Per-axon packed route geometry: 6 bits each of src_x, src_y,
    dest_x, dest_y plus 7 bits of source core offset — enough for every
    reference arch (largest mesh is 32 tiles per side)."""
    sx = np.asarray(c.axon_src_x, dtype=np.int64)
    sy = np.asarray(c.axon_src_y, dtype=np.int64)
    dx = np.asarray(c.axon_dest_x, dtype=np.int64)
    dy = np.asarray(c.axon_dest_y, dtype=np.int64)
    off = np.asarray(c.axon_src_core_offset, dtype=np.int64)
    if (max(sx.max(initial=0), sy.max(initial=0), dx.max(initial=0),
            dy.max(initial=0)) > 63 or off.max(initial=0) > 127):
        raise ValueError("mesh too large for packed route geometry")
    geo = sx | (sy << 6) | (dx << 12) | (dy << 18) | (off << 24)
    return geo.astype(np.int32)


def _route_mask(geo, lid_x, lid_y, lid_d):
    """[lanes, L] boolean route-membership mask from packed geometry
    [lanes, 1]. Mirrors native_src/scheduler.cpp for_route_links
    (kNorth=0 kEast=1 kSouth=2 kWest=3, entry link 4+core_offset)."""
    sx = geo & 63
    sy = (geo >> 6) & 63
    dx = (geo >> 12) & 63
    dy = (geo >> 18) & 63
    off = (geo >> 24) & 127
    east = dx >= sx
    north = dy >= sy
    dirx = jnp.where(east, 1, 3)
    diry = jnp.where(north, 0, 2)
    lo_x = jnp.where(east, sx + 1, dx)
    hi_x = jnp.where(east, dx, sx - 1)
    lo_y = jnp.where(north, sy + 1, dy)
    hi_y = jnp.where(north, dy, sy - 1)
    entry = (lid_x == sx) & (lid_y == sy) & (lid_d == 4 + off)
    xs = ((lid_d == dirx) & (lid_y == sy)
          & (lid_x >= lo_x) & (lid_x <= hi_x))
    ys = ((lid_d == diry) & (lid_x == dx)
          & (lid_y >= lo_y) & (lid_y <= hi_y))
    return entry | xs | ys


def _wave_kernel_fn(C, L, LN, M, F, noc_h, lpt, fdt, packed):
    """Build the kernel body for one (lanes, capacity) configuration.

    ``packed=True`` (default) takes ONE int table whose float fields are
    bitcast — a single aligned 128-row load per lane per event;
    ``packed=False`` keeps the original split f32/i32 tables (fallback
    knob ``SANAFE_TPU_MERGE_PACKED=0`` in case the bitcast does not lower
    on some backend)."""
    from jax.experimental import pallas as pl

    inf = float(np.inf)
    idt = jnp.int64 if jnp.dtype(fdt).itemsize == 8 else jnp.int32

    def kernel(*refs):
        if packed:
            (tb_ref, start_ref, end_ref, cand0_ref,
             sim_ref, ovf_ref,
             density, fin, cand, head, r_recv, r_proc, r_adj, r_geo,
             regs) = refs
        else:
            (ff_ref, fi_ref, start_ref, end_ref, cand0_ref,
             sim_ref, ovf_ref,
             density, fin, cand, head, r_recv, r_proc, r_adj, r_geo,
             regs) = refs
        # iotas are generated in-kernel (pallas kernels cannot capture
        # array constants)
        lid = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        lid_x = lid // (noc_h * lpt)
        lid_y = (lid // lpt) % noc_h
        lid_d = lid % lpt
        ioC = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        ioF = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)

        density[:] = jnp.zeros((LN, L), fdt)
        fin[:] = jnp.zeros((LN, C), fdt)
        cand[:] = cand0_ref[0]
        head[:] = start_ref[0]
        r_recv[:] = jnp.full((LN, F), inf, fdt)
        r_proc[:] = jnp.zeros((LN, F), fdt)
        r_adj[:] = jnp.zeros((LN, F), fdt)
        r_geo[:] = jnp.zeros((LN, F), jnp.int32)
        # regs columns: 0 mean, 1 n_fl, 2 last_ts, 3 ring_overflow
        regs[:] = jnp.zeros((LN, 128), fdt)

        def cond(carry):
            it, alive = carry
            return (alive > 0) & (it < 3 * M + 1024)

        def body(carry):
            it, _ = carry
            cd = cand[:]
            t_ev = jnp.min(cd, axis=1, keepdims=True)          # [LN,1]
            cstar = jnp.argmin(cd, axis=1)                     # [LN]
            activ = t_ev < inf
            rr = r_recv[:]
            m1 = jnp.min(rr, axis=1, keepdims=True)
            jstar = jnp.argmin(rr, axis=1)
            oh_j = ioF == jstar[:, None]                       # [LN,F]
            do_ret = activ & (m1 <= t_ev)
            m2 = jnp.min(jnp.where(oh_j, inf, rr), axis=1, keepdims=True)
            # handle this event unless more retirements remain due
            do_handle = activ & ~(do_ret & (m2 <= t_ev))

            mean = regs[:, 0:1]
            n_fl = regs[:, 1:2]
            last_ts = regs[:, 2:3]
            ring_ovf = regs[:, 3:4]

            # ---- retire the min-recv in-flight entry (masked) ----
            selr = oh_j & do_ret
            selr_f = jnp.where(selr, 1.0, 0.0)
            rp = jnp.sum(selr_f * r_proc[:], axis=1, keepdims=True)
            ra = jnp.sum(selr_f * r_adj[:], axis=1, keepdims=True)
            rg = jnp.sum(jnp.where(selr, r_geo[:], 0), axis=1,
                         keepdims=True)
            rmask = _route_mask(rg, lid_x, lid_y, lid_d)       # [LN,L]
            dens = density[:] - jnp.where(do_ret & rmask, ra, 0.0)
            mean = jnp.where(
                do_ret,
                jnp.where(n_fl > 1.0,
                          mean + (mean - rp) / (n_fl - 1.0), 0.0),
                mean,
            )
            n_fl = n_fl - jnp.where(do_ret, 1.0, 0.0)
            rr = jnp.where(selr, inf, rr)

            # ---- pop + handle the argmin candidate (masked) ----
            # head position of the popped core, via one-hot reduction
            # (dynamic scalar VMEM reads are not lowerable on TPU)
            oh_c = ioC == cstar[:, None]                       # [LN,C]
            pos = jnp.sum(jnp.where(oh_c, head[:], 0), axis=1,
                          keepdims=True)                       # [LN,1] i32
            # field row loads: a 128-aligned slice around the position
            # (provably aligned via pl.multiple_of), element extracted by
            # one-hot — mosaic cannot load at an arbitrary minor-dim index
            io128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            if packed:
                # one load per lane: the whole field table is one int
                # tensor (floats bitcast at build time; the F_KEYNXT
                # column replaces the old second load at position p+1);
                # one-hot extraction sums INTEGERS, which transports the
                # bit patterns exactly
                rows = []
                for ln in range(LN):
                    p = pos[ln, 0]
                    p0 = jnp.minimum(p, M - 1)
                    a0 = pl.multiple_of((p0 // 128) * 128, 128)
                    sel0 = io128 == (p0 - a0)[None, None]      # [1,128]
                    r0 = tb_ref[0, ln, :, pl.ds(a0, 128)]      # [NF_P,128]
                    # pin the accumulator dtype: numpy-style promotion
                    # widens int32 sums to int64 under x64, which would
                    # derail the width-preserving bitcast below
                    rows.append(
                        jnp.sum(jnp.where(sel0, r0, 0), axis=1, dtype=idt)
                    )
                R = jnp.stack(rows)                            # [LN,NF_P]
                RF = jax.lax.bitcast_convert_type(
                    R[:, :P_KEYNXT + 1], fdt
                )                                              # [LN,7]
                adj_m = RF[:, P_ADJ:P_ADJ + 1]
                proc_m = RF[:, P_PROC:P_PROC + 1]
                min_hop = RF[:, P_MINHOP:P_MINHOP + 1]
                cap = RF[:, P_CAP:P_CAP + 1]
                hops1 = RF[:, P_HOPS1:P_HOPS1 + 1]
                key_next = RF[:, P_KEYNXT:P_KEYNXT + 1]
                dest = R[:, P_DEST:P_DEST + 1].astype(jnp.int32)
                geo = R[:, P_GEO:P_GEO + 1].astype(jnp.int32)
            else:
                rows_f = []
                rows_i = []
                for ln in range(LN):
                    p = pos[ln, 0]
                    p0 = jnp.minimum(p, M - 1)
                    a0 = pl.multiple_of((p0 // 128) * 128, 128)
                    sel0 = io128 == (p0 - a0)[None, None]      # [1,128]
                    r0 = ff_ref[0, ln, :, pl.ds(a0, 128)]      # [NF_F,128]
                    i0 = fi_ref[0, ln, :, pl.ds(a0, 128)]      # [NF_I,128]
                    row_f = jnp.sum(jnp.where(sel0, r0, 0.0), axis=1)
                    row_i = jnp.sum(jnp.where(sel0, i0, 0), axis=1)
                    p1 = jnp.minimum(p + 1, M - 1)
                    a1 = pl.multiple_of((p1 // 128) * 128, 128)
                    sel1 = io128 == (p1 - a1)[None, None]
                    r1 = ff_ref[0, ln, 0:1, pl.ds(a1, 128)]    # [1,128]
                    key_nxt = jnp.sum(jnp.where(sel1, r1, 0.0), axis=1)
                    rows_f.append(jnp.concatenate([row_f, key_nxt]))
                    rows_i.append(row_i)
                RF = jnp.stack(rows_f)                         # [LN,NF_F+1]
                RI = jnp.stack(rows_i)                         # [LN,NF_I]
                adj_m = RF[:, F_ADJ:F_ADJ + 1]
                proc_m = RF[:, F_PROC:F_PROC + 1]
                min_hop = RF[:, F_MINHOP:F_MINHOP + 1]
                cap = RF[:, F_CAP:F_CAP + 1]
                hops1 = RF[:, F_HOPS1:F_HOPS1 + 1]
                key_next = RF[:, NF_F:NF_F + 1]
                dest = RI[:, I_DEST:I_DEST + 1]
                geo = RI[:, I_GEO:I_GEO + 1]
            is_real = (dest >= 0) & do_handle

            hmask = _route_mask(geo, lid_x, lid_y, lid_d)      # [LN,L]
            flow = jnp.sum(jnp.where(hmask, dens, 0.0), axis=1,
                           keepdims=True)
            blockd = jnp.where(flow > cap, (flow - cap) * mean, 0.0)
            sent = t_ev + jnp.where(is_real, blockd, 0.0)
            # divide (not multiply-by-inverse): the rounding must match
            # the host sweep or the blocking hinge flips on
            # near-threshold steps
            congestion = flow * mean / hops1
            net = jnp.maximum(min_hop, congestion)
            earliest = sent + net
            oh_d = ioC == dest                                 # [LN,C]
            fn = fin[:]
            fin_d = jnp.sum(jnp.where(oh_d, fn, 0.0), axis=1,
                            keepdims=True)
            recv_new = jnp.maximum(fin_d, earliest)
            fin_new = jnp.maximum(fin_d + proc_m, earliest + proc_m)
            fin[:] = jnp.where(oh_d & is_real, fin_new, fn)
            dens = dens + jnp.where(
                is_real & hmask, adj_m, 0.0
            )
            density[:] = dens
            mean = jnp.where(
                is_real, mean + (proc_m - mean) / (n_fl + 1.0), mean
            )
            n_fl = n_fl + jnp.where(is_real, 1.0, 0.0)
            # ring insert at the first free slot
            free = rr == inf                                   # [LN,F]
            any_free = jnp.any(free, axis=1, keepdims=True)
            # mosaic argmax only lowers f32 operands
            jf = jnp.argmax(jnp.where(free, 1.0, 0.0), axis=1)
            oh_f = (ioF == jf[:, None]) & is_real & any_free
            ring_ovf = jnp.maximum(
                ring_ovf, jnp.where(is_real & ~any_free, 1.0, 0.0)
            )
            r_recv[:] = jnp.where(oh_f, recv_new, rr)
            r_proc[:] = jnp.where(oh_f, proc_m, r_proc[:])
            r_adj[:] = jnp.where(oh_f, adj_m, r_adj[:])
            r_geo[:] = jnp.where(oh_f, geo, r_geo[:])

            # ---- advance the popped core's chain ----
            end_c = jnp.sum(jnp.where(oh_c, end_ref[0], 0), axis=1,
                            keepdims=True)
            exhausted = (pos + 1) >= end_c
            nxt = jnp.where(exhausted, inf, sent + key_next)
            cand[:] = jnp.where(oh_c & do_handle, nxt, cd)
            head[:] = jnp.where(oh_c & do_handle, pos + 1, head[:])

            last_ts = jnp.maximum(last_ts, jnp.where(activ, t_ev, 0.0))
            last_ts = jnp.maximum(
                last_ts, jnp.where(is_real, jnp.maximum(fin_new, sent),
                                   0.0)
            )
            last_ts = jnp.maximum(
                last_ts,
                jnp.where(do_handle & (nxt < inf), nxt, 0.0),
            )
            regs[:, 0:1] = mean
            regs[:, 1:2] = n_fl
            regs[:, 2:3] = last_ts
            regs[:, 3:4] = ring_ovf

            alive = jnp.any(cand[:] < inf).astype(jnp.int32)
            return it + jnp.int32(1), alive

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
        # outputs are [LN, 128] tiles (TPU block-shape minimum); column 0
        # carries the value
        sim_ref[0] = jnp.broadcast_to(regs[:, 2:3], (LN, 128))
        ovf_ref[0] = jnp.broadcast_to(
            (regs[:, 3:4] > 0.0).astype(jnp.int32), (LN, 128)
        )

    return kernel


def _make_wave_call(C, L, LN, M, F, noc_h, lpt, n_waves, fdt,
                    interpret, packed):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _wave_kernel_fn(C, L, LN, M, F, noc_h, lpt, fdt, packed)
    if packed:
        table_specs = [
            pl.BlockSpec((1, LN, NF_P, M), lambda w: (w, 0, 0, 0)),
        ]
    else:
        table_specs = [
            pl.BlockSpec((1, LN, NF_F, M), lambda w: (w, 0, 0, 0)),
            pl.BlockSpec((1, LN, NF_I, M), lambda w: (w, 0, 0, 0)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(n_waves,),
        in_specs=table_specs + [
            pl.BlockSpec((1, LN, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, LN, C), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, LN, C), lambda w: (w, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, LN, 128), lambda w: (w, 0, 0)),
            pl.BlockSpec((1, LN, 128), lambda w: (w, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_waves, LN, 128), fdt),
            jax.ShapeDtypeStruct((n_waves, LN, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LN, L), fdt),    # density
            pltpu.VMEM((LN, C), fdt),    # fin
            pltpu.VMEM((LN, C), fdt),    # cand
            pltpu.VMEM((LN, C), jnp.int32),      # head
            pltpu.VMEM((LN, F), fdt),    # ring recv
            pltpu.VMEM((LN, F), fdt),    # ring proc
            pltpu.VMEM((LN, F), fdt),    # ring adj
            pltpu.VMEM((LN, F), jnp.int32),      # ring geo
            pltpu.VMEM((LN, 128), fdt),  # regs
        ],
        # At DVS scale the double-buffered message-table block alone is
        # ~12 MB, over XLA's default 16 MB scoped-VMEM cap (observed OOM
        # on v5e at M=20480, LN=8: stack = 20.15 MB ~= 3.4x the
        # single-buffered block estimate). Budget 4x + headroom; v5e has
        # 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                4 * _wave_vmem_bytes(C, L, LN, M, F, fdt, packed)
                + 8 * 1024 * 1024,
            ),
        ) if not interpret else None,
        interpret=interpret,
    )


def _wave_vmem_bytes(C, L, LN, M, F, fdt, packed) -> int:
    """Single-buffered VMEM bytes for one wave's blocks + scratch."""
    isz = fdt.itemsize
    table = LN * (NF_P if packed else NF_F + NF_I) * M * isz
    per_core = 3 * LN * C * isz
    outs = 2 * LN * 128 * 4
    scratch = (
        LN * L * isz + 3 * LN * C * isz + LN * C * 4
        + 3 * LN * F * isz + LN * F * 4 + LN * 128 * isz
    )
    return table + per_core + outs + scratch


def default_merge_cap(c: CompiledChip) -> int:
    """Static per-step message capacity for the merge kernel. DVS-gesture
    bursts reach ~19k messages/step; 20480 covers them with margin while
    keeping the wave block ~10 MB of VMEM (double-buffered). Honors
    SANAFE_TPU_SWEEP_CAP (the shared device-sweep capacity knob) when the
    merge-specific override is unset."""
    cap = int(
        os.environ.get(
            "SANAFE_TPU_MERGE_CAP",
            os.environ.get("SANAFE_TPU_SWEEP_CAP", "20480"),
        )
    )
    return min(len(c.axon_src_slot) + c.n_cores, max(cap, 4))


def make_merge_sweep(
    c: CompiledChip,
    sync_delay: float,
    dtype=None,
    lanes: Optional[int] = None,
    m_cap: Optional[int] = None,
    f_cap: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Return a jittable ``(fired [T,N] bool, updated [T,N] bool) ->
    (sim_time [T] f32, need_host [T] bool)`` merge-sweep function.

    ``need_host`` marks steps the kernel could not cover (message count
    over capacity, in-flight ring overflow); the caller re-sweeps those
    exactly on the host.
    """
    from .device_sweep import make_device_sweep

    if interpret is None:
        # pallas TPU lowering needs a TPU backend; anywhere else (the
        # float64 CPU parity lane, tests) runs the interpreter
        interpret = jax.default_backend() != "tpu"
    if dtype is None:
        # mosaic argmin/argmax lowers float32 only; the interpreter path
        # uses float64 when x64 is on (tightest match to the host sweep)
        dtype = (jnp.float64 if interpret and jax.config.jax_enable_x64
                 else jnp.float32)
    fdt = jnp.dtype(dtype)

    t = build_sweep_tables(c)
    LN = int(lanes or int(os.environ.get("SANAFE_TPU_MERGE_LANES", "8")))
    cap_req = int(m_cap or default_merge_cap(c))
    # aligned field-row loads need 128-multiples; steps above the
    # REQUESTED capacity still fall back to the host
    M = -(-cap_req // 128) * 128
    F = int(f_cap or int(os.environ.get("SANAFE_TPU_MERGE_RING", "1024")))
    C = c.n_cores
    L = int(t["n_links"])
    noc_h = c.arch.noc_height_in_tiles
    lpt = 4 + max(c.arch.max_cores_per_tile, 1)

    # the message-table builder from the first-generation tier (exact
    # creation-order messages, placeholders included)
    gen1 = make_device_sweep(c, sync_delay, fdt, m_cap=M)
    build_messages = gen1.build_messages

    A = len(c.axon_src_slot)
    pad = lambda v, fill: np.concatenate([[fill], np.asarray(v)])  # noqa: E731
    adj_t = jnp.asarray(pad(t["adj"], 0.0), dtype=fdt)
    proc_t = jnp.asarray(pad(t["proc"], 0.0), dtype=fdt)
    minhop_t = jnp.asarray(pad(t["min_hop"], 0.0), dtype=fdt)
    hops1 = np.asarray(t["hops"], dtype=np.float64) + 1.0
    cap_t = jnp.asarray(pad(hops1 * t["buffer_size"], np.inf),
                        dtype=fdt)
    hops1_t = jnp.asarray(pad(hops1, 1.0), dtype=fdt)
    dest_t = jnp.asarray(pad(t["dest_core"], -1), dtype=jnp.int32)
    geo_t = jnp.asarray(pad(_pack_geo(c), 0), dtype=jnp.int32)
    inf32 = fdt.type(np.inf)

    packed = os.environ.get("SANAFE_TPU_MERGE_PACKED", "1") != "0"
    idt = jnp.int64 if fdt.itemsize == 8 else jnp.int32

    def sweep_chunk(fired, updated):
        T = fired.shape[0]
        n_waves = -(-T // LN)
        Tp = n_waves * LN
        wave_call = _make_wave_call(C, L, LN, M, F, noc_h, lpt, n_waves,
                                    fdt, interpret, packed)
        msg_axon, msg_gen, msg_start, msg_end, build_ovf = build_messages(
            fired, updated
        )
        msg_gen = msg_gen.astype(fdt)
        counts = msg_end[:, -1]                                # [T]
        idx = msg_axon + 1                                     # [T,M]
        if packed:
            bc = lambda v: jax.lax.bitcast_convert_type(v, idt)  # noqa: E731
            key_next_col = jnp.concatenate(
                [msg_gen[:, 1:], msg_gen[:, -1:]], axis=1
            )
            tb = jnp.stack(
                [
                    bc(msg_gen),
                    bc(jnp.take(adj_t, idx)),
                    bc(jnp.take(proc_t, idx)),
                    bc(jnp.take(minhop_t, idx)),
                    bc(jnp.take(cap_t, idx)),
                    bc(jnp.take(hops1_t, idx)),
                    bc(key_next_col),
                    jnp.take(dest_t, idx).astype(idt),
                    jnp.take(geo_t, idx).astype(idt),
                ],
                axis=1,
            )                                                  # [T,NF_P,M]
        else:
            ff = jnp.stack(
                [
                    msg_gen,
                    jnp.take(adj_t, idx),
                    jnp.take(proc_t, idx),
                    jnp.take(minhop_t, idx),
                    jnp.take(cap_t, idx),
                    jnp.take(hops1_t, idx),
                ],
                axis=1,
            )                                                  # [T,NF_F,M]
            fi = jnp.stack(
                [jnp.take(dest_t, idx), jnp.take(geo_t, idx)], axis=1
            )                                                  # [T,NF_I,M]
        s0 = jnp.minimum(msg_start, M - 1)
        cand0 = jnp.where(
            msg_start < msg_end,
            jnp.take_along_axis(msg_gen, s0, axis=1)[:, :C],
            inf32,
        )                                                      # [T,C]

        # balance waves: steps sorted by message count
        order = jnp.argsort(counts)                            # [T]
        order_p = jnp.concatenate(
            [order, jnp.zeros(Tp - T, dtype=order.dtype)]
        )
        lane_valid = jnp.arange(Tp) < T
        active = (lane_valid & ~build_ovf[order_p]
                  & (counts[order_p] <= cap_req))
        start_p = msg_start[order_p]
        end_p = jnp.where(active[:, None], msg_end[order_p], start_p)
        cand0_p = jnp.where(
            active[:, None] & (start_p < end_p), cand0[order_p], inf32
        )
        if packed:
            tables = (tb[order_p].reshape(n_waves, LN, NF_P, M),)
        else:
            tables = (
                ff[order_p].reshape(n_waves, LN, NF_F, M),
                fi[order_p].reshape(n_waves, LN, NF_I, M),
            )
        sim_p, ovf_p = wave_call(
            *tables,
            start_p.reshape(n_waves, LN, C),
            end_p.reshape(n_waves, LN, C),
            cand0_p.reshape(n_waves, LN, C),
        )
        sim_flat = sim_p[:, :, 0].reshape(Tp) + fdt.type(sync_delay)
        ovf_flat = ovf_p[:, :, 0].reshape(Tp) > 0
        scatter_idx = jnp.where(lane_valid, order_p, T)
        sim = jnp.zeros(T, fdt).at[scatter_idx].set(
            sim_flat, mode="drop"
        )
        need = jnp.ones(T, bool).at[scatter_idx].set(
            ~active | ovf_flat, mode="drop"
        )
        return sim, need

    return sweep_chunk
