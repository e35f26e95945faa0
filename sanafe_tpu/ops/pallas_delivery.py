"""Pallas TPU kernel: activity-gated block-dense spike delivery.

The XLA path multiplies every (src-tile, dest-tile) weight block each step;
at DVS-gesture scale that streams ~314 MB of weights per timestep even
though only ~26-84% of source tiles contain a fired neuron. This kernel
compacts the active blocks to the front of the grid each step (scalar
prefetch drives the block index maps, so inactive weight blocks are never
fetched from HBM) and accumulates per-dest-tile partial sums in VMEM.

TPU block shapes must tile to (8, 128) for f32, so the per-tile source and
destination rows travel in 8-row groups; the kernel dynamically selects the
source row and accumulation row within the group (scalar-prefetched sublane
indices).

Grid ordering invariants:
- blocks are dest-major sorted at compile time and the stable compaction
  preserves that order, so every output row group is visited in one
  consecutive run (revisits only ever hit the immediately preceding index);
- padding grid steps re-fetch the last active block (no new DMA) and
  accumulate into a trash row group past `n_tiles`, keeping the output
  index map monotonic.

Exactness: inactive blocks contribute exactly zero (their source rows are
zero), so skipping them changes nothing; active blocks accumulate in the
same dest-major order as the XLA segment-sum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # f32 sublane granularity


def _delivery_kernel(
    w_idx_ref, src_grp_ref, src_sub_ref, dest_grp_ref, dest_sub_ref,
    first_ref, x_ref, w_ref, out_ref,
):
    g = pl.program_id(0)

    @pl.when(first_ref[g] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x_row = x_ref[pl.ds(src_sub_ref[g], 1), :]  # (1, T)
    y = jnp.dot(x_row, w_ref[0], preferred_element_type=out_ref.dtype)
    row = pl.ds(dest_sub_ref[g], 1)
    out_ref[row, :] += y


def make_delivery_fn(block, dtype, interpret=False):
    """Returns delivery(fired_tiles, weights) -> [n_tiles, tile] dest sums,
    skipping weight blocks whose source tile has no fired neuron."""
    n_blocks = int(block.weights.shape[0])
    tile = int(block.tile)
    n_tiles = int(block.n_tiles)
    groups_in = -(-n_tiles // GROUP)
    # +1 trash row past n_tiles for padding grid steps
    groups_out = -(-(n_tiles + 1) // GROUP)
    src_tiles = jnp.asarray(np.asarray(block.src_tiles), dtype=jnp.int32)
    dest_tiles = jnp.asarray(np.asarray(block.dest_tiles), dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (GROUP, tile),
                lambda g, w_idx, sg, ss, dg, ds, first: (sg[g], 0),
            ),
            pl.BlockSpec(
                (1, tile, tile),
                lambda g, w_idx, sg, ss, dg, ds, first: (w_idx[g], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (GROUP, tile),
            lambda g, w_idx, sg, ss, dg, ds, first: (dg[g], 0),
        ),
    )
    call = pl.pallas_call(
        _delivery_kernel,
        out_shape=jax.ShapeDtypeStruct((groups_out * GROUP, tile), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    @functools.partial(jax.named_call, name="pallas_delivery")
    def delivery(fired_tiles, weights):
        # weights arrive as an argument (not a closure constant) so the
        # [B, T, T] tensor stays a device buffer instead of being inlined
        # into the compile payload
        # compact active blocks to the front, preserving dest-major order
        active_src = jnp.sum(fired_tiles, axis=1) > 0
        block_active = active_src[src_tiles]
        order = jnp.argsort(~block_active, stable=True).astype(jnp.int32)
        n_active = jnp.sum(block_active, dtype=jnp.int32)
        g = jnp.arange(n_blocks, dtype=jnp.int32)
        is_pad = g >= n_active
        last_active = order[jnp.maximum(n_active - 1, 0)]
        w_idx = jnp.where(is_pad, last_active, order)
        src_of = src_tiles[w_idx]
        dest_of = jnp.where(is_pad, n_tiles, dest_tiles[order])
        src_grp = src_of // GROUP
        src_sub = src_of % GROUP
        dest_grp = dest_of // GROUP
        dest_sub = dest_of % GROUP
        first = jnp.concatenate(
            [
                jnp.ones(1, dtype=jnp.int32),
                (dest_grp[1:] != dest_grp[:-1]).astype(jnp.int32),
            ]
        )
        n_pad_rows = groups_in * GROUP - n_tiles
        x = jnp.pad(fired_tiles, ((0, n_pad_rows), (0, 0)))
        out = call(w_idx, src_grp, src_sub, dest_grp, dest_sub, first,
                   x, weights)
        # dest tiles with no active block were never visited
        # (uninitialized or stale VMEM) — mask them to zero
        visited = (
            jax.ops.segment_sum(
                block_active.astype(jnp.int32),
                dest_tiles,
                num_segments=n_tiles,
                indices_are_sorted=True,
            )
            > 0
        )
        return jnp.where(visited[:, None], out[:n_tiles], 0)

    return delivery
