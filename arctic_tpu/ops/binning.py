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


CUMMAX_ASSOC = False  # associative_scan variant (measured: no win in-pipeline)


def _cummax(x):
    if CUMMAX_ASSOC:
        return jax.lax.associative_scan(jnp.maximum, x)
    return jax.lax.cummax(x)


class BinnedPairs(NamedTuple):
    sorted_slot: Array  # (pair_cap,) i32 slot id per pair, grouped by tile
    tile_start: Array  # (num_tiles + 1,) i32 segment offsets into sorted_slot
    total_pairs: Array  # i32 scalar — actual pairs generated (for overflow checks)


class AlignedSegments(NamedTuple):
    """Per-tile work lists re-laid-out so every segment starts 8-row aligned.

    TPU DMA slices must be full-lane: the kernel's triangle table is stored
    as (rows/8, 128) f32 (8 logical 16-float rows per lane row), so segment
    starts are padded to multiples of 8. ``slot`` indexes an (extended) slot
    table whose last entry is a dead row for the padding."""

    slot: Array  # (cap_aligned,) i32
    seg_start: Array  # (num_tiles,) i32, 8-aligned row offsets
    seg_len: Array  # (num_tiles,) i32 true (unpadded) lengths


def align_segments(pairs: BinnedPairs, num_tiles: int, dead_slot: int, align: int = 8) -> AlignedSegments:
    pair_cap = pairs.sorted_slot.shape[0]
    seg_len = jnp.diff(pairs.tile_start)  # (num_tiles,)
    padded = (seg_len + (align - 1)) // align * align
    astart = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded, dtype=jnp.int32)])
    cap_aligned = pair_cap + align * num_tiles
    pos = jnp.arange(cap_aligned, dtype=jnp.int32)

    # Monotone per-position quantities via ONE scatter-max + cummax: both
    # aligned-start - original-start and the segment-end positions are
    # non-decreasing over tiles, so they ride one scatter op as a 2-wide
    # update row (scatters are latency-bound per UPDATE, ~9 ns — two
    # separate scatters paid that twice per pass).
    at = jnp.clip(astart[:-1], 0, cap_aligned)
    upd = jnp.stack([astart[:-1] - pairs.tile_start[:-1], pairs.tile_start[1:]], axis=1)
    both0 = jnp.zeros((cap_aligned + 1, 2), jnp.int32).at[at].max(upd)
    both = jax.lax.cummax(both0[:cap_aligned], axis=0)
    delta = both[:, 0]  # astart[t] - tile_start[t]
    end = both[:, 1]  # tile_start[t + 1]

    src = pos - delta
    ok = src < end
    slot = jnp.where(ok, pairs.sorted_slot[jnp.clip(src, 0, pair_cap - 1)], dead_slot)
    return AlignedSegments(slot=slot, seg_start=astart[:-1], seg_len=seg_len)


def _tile_footprints(
    setup: TriSetup,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    tile_row0=0,
    rect=None,
):
    """Per-slot tile bbox + pair counts: (counts, tx0, ty0, w).

    ``rect`` (rx0, ry0, rx1, ry1) — traced inclusive GLOBAL tile coords —
    intersects every slot's tile bbox (sun-frustum shadow culling,
    ops/cull.py): pairs for tiles outside the rect are never generated, and
    in-rect tiles receive exactly the same pair list in the same order.
    An empty rect (rx1 < rx0) culls everything.
    """
    x0, y0, x1, y1 = setup.bbox
    valid = setup.valid

    tx0 = jnp.clip((x0 / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    # bbox is exclusive at x1/y1 in pixel terms; a bbox ending exactly on a
    # tile boundary doesn't cover the next tile's pixel centers.
    tx1 = jnp.clip(((x1 - 1e-3) / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.maximum((y0 / tile_h).astype(jnp.int32) - tile_row0, 0)
    ty1 = jnp.minimum(
        ((y1 - 1e-3) / tile_h).astype(jnp.int32) - tile_row0, tiles_y - 1
    )

    if rect is not None:
        rx0, ry0, rx1, ry1 = rect
        tx0 = jnp.maximum(tx0, rx0)
        tx1 = jnp.minimum(tx1, rx1)
        ty0 = jnp.maximum(ty0, ry0 - tile_row0)
        ty1 = jnp.minimum(ty1, ry1 - tile_row0)
        valid = valid & (tx1 >= tx0)
        tx0 = jnp.minimum(tx0, tiles_x - 1)  # empty-rect clamp for meta bits

    in_rows = ty1 >= ty0
    valid = valid & in_rows
    ty0 = jnp.clip(ty0, 0, tiles_y - 1)
    ty1 = jnp.clip(ty1, 0, tiles_y - 1)

    w = jnp.where(valid, tx1 - tx0 + 1, 1)
    h = jnp.where(valid, ty1 - ty0 + 1, 1)
    counts = jnp.where(valid, w * h, 0)
    return counts, tx0, ty0, w


def count_pairs(
    setup: TriSetup,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    tile_row0=0,
    rect=None,
) -> Array:
    """Total (tile, triangle) pairs this frame would generate (i32 scalar).

    Sort-free — used by pipeline.autotune_pair_caps to size the pair buffer
    to the scene instead of the worst-case formula."""
    counts, _, _, _ = _tile_footprints(
        setup, tiles_x, tiles_y, tile_w, tile_h, tile_row0, rect
    )
    return jnp.sum(counts, dtype=jnp.int32)


def bin_triangles(
    setup: TriSetup,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    pair_capacity: int,
    tile_row0=0,
    rect=None,
) -> BinnedPairs:
    """Bin into the tile window rows [tile_row0, tile_row0 + tiles_y).

    ``tile_row0`` may be traced (device's slice offset under shard_map);
    tile ids in the output are window-local. ``rect`` culls tiles outside
    an inclusive global tile rect (see _tile_footprints).
    """
    num_tiles = tiles_x * tiles_y
    counts, tx0, ty0, w = _tile_footprints(
        setup, tiles_x, tiles_y, tile_w, tile_h, tile_row0, rect
    )

    # Expansion without per-pair binary search: pair -> slot is a TWO-LEVEL
    # run-length decode. Scatters are latency-bound at ~9 ns/UPDATE, so the
    # round-2 per-slot scatter paid 9 ns x slot CAPACITY (~4.4 ms per pass
    # at 503k slots). Level 1 scatters only per GROUP of slots (~8k
    # updates): group ends -> cummax recovers each pair's group and the
    # group's first pair position. Level 2 resolves the slot within the
    # group from ONE dense 128-lane row per group (consecutive pairs repeat
    # rows, so the gather runs at cache speed): lanes [0:G) carry the
    # group's local-inclusive-cumsum (two lane reduces give
    # slot = #{local cums <= off} and the slot's local start) and lanes
    # [G:2G) the packed bbox META of the group's G slots, resolved by a
    # lane one-hot at slot_local — G = 64 so both halves share one row and
    # one gather (separate 128-lane loc/meta gathers + a split select
    # fusion cost ~2x: r3h per-HLO 0.59 + 0.88 + 0.59 ms on the shadow
    # pass; the scalar meta[slot] form before that, ~7 ns/pair, 2.34 ms).
    G = 64
    cap = setup.capacity
    cum = jnp.cumsum(counts, dtype=jnp.int32)  # inclusive
    total = cum[-1]
    pos = jnp.arange(pair_capacity, dtype=jnp.int32)
    cap_pad = (cap + G - 1) // G * G
    if cap_pad != cap:  # pad with empty slots (cum stays flat)
        cum = jnp.concatenate(
            [cum, jnp.broadcast_to(total, (cap_pad - cap,))]
        )
    n_groups = cap_pad // G

    cum_g = cum[G - 1 :: G]  # (n_groups,) inclusive pair count per group end
    pos_bits = max(int(pair_capacity - 1).bit_length(), 1)
    if n_groups.bit_length() + pos_bits <= 31:
        # One scan recovers BOTH maxima: pack (group << pos_bits) | pos into
        # a single non-negative i32 — monotone in scatter order, so cummax
        # of the packed value carries the latest (group, pos) pair.
        # Scatter packs the PAIR position of each group end with its group
        # id; positions are the scatter targets themselves.
        m0 = jnp.full(pair_capacity + 1, -1, jnp.int32)
        at = jnp.clip(cum_g, 0, pair_capacity)
        m0 = m0.at[at].max(
            (jnp.arange(n_groups, dtype=jnp.int32) << pos_bits) | at
        )
        mm = _cummax(m0[:pair_capacity])
        group = (mm >> pos_bits) + 1  # arithmetic shift: -1 -> 0
        gbase = jnp.where(mm < 0, 0, mm & ((1 << pos_bits) - 1))
    else:  # huge buffers: fall back to two scans
        m0 = jnp.full(pair_capacity + 1, -1, jnp.int32)
        m0 = m0.at[jnp.clip(cum_g, 0, pair_capacity)].max(
            jnp.arange(n_groups, dtype=jnp.int32)
        )
        mm = m0[:pair_capacity]
        group = _cummax(mm) + 1  # group containing pair `pos`
        gbase = _cummax(jnp.where(mm >= 0, pos, 0))  # group's first pair
    off = pos - gbase  # pair offset within the group

    # Combined group rows: lanes [0:G) local cumsum, [G:2G) packed bbox
    # meta (tx0: 9 bits, ty0: 13 bits, w: 9 bits — up to 16k x 256k px).
    assert tiles_x <= 512 and tiles_y <= 8192
    meta = tx0 | (ty0 << 9) | (w << 22)
    if cap_pad != cap:
        meta = jnp.concatenate([meta, jnp.zeros((cap_pad - cap,), meta.dtype)])
    gstart = jnp.concatenate([jnp.zeros(1, jnp.int32), cum_g[:-1]])
    loc = cum.reshape(n_groups, G) - gstart[:, None]
    combined = jnp.concatenate([loc, meta.reshape(n_groups, G)], axis=1)
    group_c = jnp.minimum(group, n_groups - 1)
    row = combined[group_c]  # (pair_cap, 2G) — consecutive pairs repeat rows
    locr = row[:, :G]
    le = locr <= off[:, None]
    # locr is a non-decreasing cumsum, so `le` is a prefix mask: the meta
    # lane to select (lane slot_local = popcount(le)) is the FIRST 0 lane —
    # expressible as le[k-1] & ~le[k] WITHOUT the popcount, which breaks the
    # reduce -> one-hot dependency and lets XLA fuse all three lane reduces
    # into ONE pass over the (cap, 128) rows (the split form re-read the
    # 168 MB buffer twice: 0.44 + 0.34 ms at the bench shadow cap).
    le_sh = jnp.concatenate([jnp.ones_like(le[:, :1]), le[:, :-1]], axis=1)
    sel = le_sh & ~le  # one-hot at lane slot_local (all-zero iff le all-1s)
    slot_local = jnp.sum(le, axis=1, dtype=jnp.int32)
    start_local = jnp.max(jnp.where(le, locr, 0), axis=1)
    slot = group_c * G + slot_local
    k = off - start_local
    # slot_local of a valid pair is < G (its group's total exceeds off), so
    # `sel` always hits a real meta lane there; invalid pairs may select
    # nothing (m = 0, matching the old lane_g == G no-match) and are masked
    # by `ok`.
    m = jnp.sum(jnp.where(sel, row[:, G:], 0), axis=1, dtype=jnp.int32)
    ok = (pos < total) & (slot < setup.capacity)
    slot_c = jnp.minimum(slot, setup.capacity - 1)
    mtx0 = m & 0x1FF
    mty0 = (m >> 9) & 0x1FFF
    mw = jnp.maximum(m >> 22, 1)
    tile = (mty0 + k // mw) * tiles_x + (mtx0 + k % mw)
    tile = jnp.where(ok, tile, num_tiles)

    bits_s = max(int(setup.capacity - 1).bit_length(), 1)
    if num_tiles.bit_length() + bits_s <= 31:
        # Single-array sort of (tile << bits_s | slot): pairs are emitted in
        # slot-ascending order, so the stable-by-tile sort's within-tile
        # order IS slot-ascending — the packed key reproduces it exactly
        # while sorting one array instead of three (XLA adds an iota
        # operand for stability; measured 0.45 ms for the 3-array form at
        # the 327680 bench cap).
        packed = (tile << bits_s) | slot_c
        sp = jax.lax.sort(packed)
        sorted_tile = sp >> bits_s
        sorted_slot = sp & ((1 << bits_s) - 1)
    else:  # huge scenes: keep the stable 2-key form
        sorted_tile, sorted_slot = jax.lax.sort(
            (tile, slot_c), num_keys=1, is_stable=True
        )
    tile_start = _tile_starts(sorted_tile, num_tiles)
    return BinnedPairs(sorted_slot=sorted_slot, tile_start=tile_start, total_pairs=total)


def _tile_starts(sorted_tile: Array, num_tiles: int) -> Array:
    """searchsorted(sorted_tile, arange(num_tiles + 1), 'left'), two-level.

    The flat jnp.searchsorted lowers to a log2(pair_cap)-iteration while
    loop (19 gather+compare rounds at the bench caps, each latency/dispatch
    bound — ~1.1 ms/frame across both passes). Two levels cut the serial
    depth: a coarse searchsorted over the 128-strided row heads (a tiny
    array, log2(cap / 128) rounds), then ONE dense (Q, 128) row gather +
    lane reduce resolves the exact offset. Correctness: with r =
    max(coarse - 1, 0), every element before row r is < t, so
    first_index(>= t) = 128 * r + #(row_r < t) (the count saturating to
    128 lands exactly at row `coarse`'s head).
    """
    cap = sorted_tile.shape[0]
    if cap % 128 != 0:  # tiny test buffers: keep the flat form
        return jnp.searchsorted(
            sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    view = sorted_tile.reshape(cap // 128, 128)
    t = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    # coarse[t] = #{row heads < t}: the queries are EVERY tile id in order,
    # so searchsorted collapses to a histogram + exclusive cumsum (head
    # values are in [0, num_tiles]). The log2(rows)-iteration searchsorted
    # while-loop was latency-bound at ~0.7 ms/frame across both passes; the
    # scatter is ~9 ns x rows.
    hist = jnp.zeros(num_tiles + 1, jnp.int32).at[view[:, 0]].add(
        1, mode="drop", indices_are_sorted=True
    )
    coarse = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(hist)])[
        : num_tiles + 1
    ]
    r = jnp.maximum(coarse - 1, 0)
    rows = view[r]  # (Q, 128) — dense row gather from a <=2 MB table
    cnt = jnp.sum((rows < t[:, None]).astype(jnp.int32), axis=1)
    return 128 * r + cnt


def raster_row_comps(setup: TriSetup):
    """The 16 dense (P' + pad,) component planes of pack_raster_rows,
    padded with dead rows (zero planes, masked by the kernel's range
    checks) to a multiple of 8 past the one dead slot at row P'.

    Feeds raster_tiles.pack_raster_rows_packed, which writes the packed
    (rows/8, 128) gather table directly (no column-major intermediate)."""
    p = setup.capacity
    assert p < (1 << 24), "slot ids must be exactly representable in f32"
    comps = [c for e in setup.edges for c in e]  # A0 B0 C0 A1 ... C2
    comps += list(setup.zplane)
    comps.append(jnp.arange(p, dtype=jnp.float32))
    z = jnp.zeros((p,), jnp.float32)
    comps += [z, z, z]
    # Pad slots to a 4096 multiple so the packed table has a 512-multiple
    # row count (the transpose-pack kernel's block size); covers the one
    # dead slot at row P'. Extra dead rows cost 64 B each.
    n_pad = -(p + 1) % 4096 + 1
    return [jnp.pad(c, (0, n_pad)) for c in comps], p + n_pad


def pack_raster_rows(setup: TriSetup) -> Array:
    """Per-slot kernel rows (P + pad, 16) f32, with one trailing dead row.

    Layout: [A0 B0 C0  A1 B1 C1  A2 B2 C2  Az Bz Cz  slot_f32 0 0 0] where
    slot_f32 is the slot id as an exact f32 value (slot counts stay far below
    2^24; Mosaic has no scalar bitcast, so value-encoding beats bit-punning).
    Row P is the dead row used for segment-alignment padding; total rows are
    padded to a multiple of 8 so the table reshapes to (rows/8, 128) for
    full-lane TPU DMA.
    """
    p = setup.capacity
    assert p < (1 << 24), "slot ids must be exactly representable in f32"
    comps = [c for e in setup.edges for c in e]  # A0 B0 C0 A1 ... C2
    comps += list(setup.zplane)
    comps.append(jnp.arange(p, dtype=jnp.float32))
    z = jnp.zeros((p,), jnp.float32)
    comps += [z, z, z]
    # Dense (P,) components stack straight into the row table — XLA fuses
    # the component math into this concat, so no tile-padded small-minor
    # intermediates are ever materialized.
    rows = jnp.stack(comps, axis=1)
    n_pad = (-(p + 1)) % 8 + 1
    return jnp.pad(rows, ((0, n_pad), (0, 0)))
