"""Tile binning: triangle slots -> sorted per-tile work lists, pure XLA.

The GPU's rasterizer front-end distributes triangles to screen tiles in
hardware; here it becomes sort-based dataflow (SURVEY.md §7 "hard parts" #1):

1. per-slot tile bbox from the clamped screen bbox
2. expansion to (tile, slot) pairs WITHOUT scatter: an exclusive-cumsum of
   per-slot tile counts + searchsorted turns "repeat each slot count_i times"
   into a gather
3. one stable sort by tile id groups pairs per tile (stability preserves
   draw order -> depth-tie semantics match the sequential reference)
4. searchsorted against the sorted tile ids yields per-tile [start, end)

Everything is static-shaped: the pair buffer has a fixed capacity and a
sentinel tile id (== num_tiles) floats invalid/overflow pairs to the end.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from arctic_tpu.ops.raster import TriSetup

Array = jnp.ndarray


class BinnedPairs(NamedTuple):
    sorted_slot: Array  # (pair_cap,) i32 slot id per pair, grouped by tile
    tile_start: Array  # (num_tiles + 1,) i32 segment offsets into sorted_slot
    total_pairs: Array  # i32 scalar — actual pairs generated (for overflow checks)


def bin_triangles(
    setup: TriSetup,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    pair_capacity: int,
) -> BinnedPairs:
    num_tiles = tiles_x * tiles_y
    x0, y0, x1, y1 = (setup.bbox[:, i] for i in range(4))
    valid = setup.valid

    tx0 = jnp.clip((x0 / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip((y0 / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    # bbox is exclusive at x1/y1 in pixel terms; a bbox ending exactly on a
    # tile boundary doesn't cover the next tile's pixel centers.
    tx1 = jnp.clip(((x1 - 1e-3) / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty1 = jnp.clip(((y1 - 1e-3) / tile_h).astype(jnp.int32), 0, tiles_y - 1)

    w = jnp.where(valid, tx1 - tx0 + 1, 1)
    h = jnp.where(valid, ty1 - ty0 + 1, 1)
    counts = jnp.where(valid, w * h, 0)

    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1]
    pos = jnp.arange(pair_capacity, dtype=jnp.int32)
    slot = jnp.searchsorted(cum, pos, side="right").astype(jnp.int32)
    ok = (pos < total) & (slot < setup.capacity)
    slot_c = jnp.minimum(slot, setup.capacity - 1)
    base = cum[slot_c] - counts[slot_c]
    k = pos - base
    wk = jnp.maximum(w[slot_c], 1)
    tile = (ty0[slot_c] + k // wk) * tiles_x + (tx0[slot_c] + k % wk)
    tile = jnp.where(ok, tile, num_tiles)

    sorted_tile, sorted_slot = jax.lax.sort((tile, slot_c), num_keys=1, is_stable=True)
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return BinnedPairs(sorted_slot=sorted_slot, tile_start=tile_start, total_pairs=total)


def pack_raster_rows(setup: TriSetup) -> Array:
    """Per-slot kernel rows (P, 16) f32.

    Layout: [A0 B0 C0  A1 B1 C1  A2 B2 C2  Az Bz Cz  slot_bits 0 0 0] where
    slot_bits is the slot id bitcast to f32 (the kernel writes it to the
    visibility buffer). 16-wide keeps DMA rows aligned.
    """
    p = setup.capacity
    e = setup.edges.reshape(p, 9)
    slot_bits = jax.lax.bitcast_convert_type(
        jnp.arange(p, dtype=jnp.int32), jnp.float32
    )[:, None]
    pad = jnp.zeros((p, 3), jnp.float32)
    return jnp.concatenate([e, setup.zplane, slot_bits, pad], axis=1)
