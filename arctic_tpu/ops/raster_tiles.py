"""Tiled Pallas rasterizer — the TPU's "hardware rasterizer".

Consumes the per-tile work lists from ops/binning.py and runs one grid step
per screen tile: triangle rows are DMA'd HBM->SMEM in double-buffered chunks
while the VPU evaluates edge/depth planes for the whole (tile_h x tile_w)
pixel block per triangle and maintains the z/visibility buffers in VMEM.
Depth semantics match the brute-force rasterizer exactly (LESS + draw-order
ties), which is what the equivalence tests assert.

Pixel layout: each tile's pixels are flattened row-major into an
(S=tile_h*tile_w/128, 128) block; the host-side unshuffle at the end restores
(H, W). This keeps every VPU op fully lane-aligned regardless of tile shape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.ops import binning
from arctic_tpu.ops.raster import TriSetup

Array = jnp.ndarray


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _raster_kernel(
    # scalar prefetch
    tile_start_ref,
    # inputs
    rows_hbm,
    # outputs
    zref,
    iref,
    # scratch
    rows_smem,
    sems,
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    n = end - start

    sublanes = tile_h * tile_w // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (sublanes, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (sublanes, 128), 0)
    p = sub * 128 + lane  # row-major pixel index within the tile
    tx = t % tiles_x
    ty = t // tiles_x
    px = (tx * tile_w + p % tile_w).astype(jnp.float32) + 0.5
    py = (ty * tile_h + p // tile_w).astype(jnp.float32) + 0.5

    zref[0] = jnp.ones((sublanes, 128), jnp.float32)
    iref[0] = jnp.full((sublanes, 128), -1, jnp.int32)

    def chunk_dma(c, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * chunk, chunk)],
            rows_smem.at[slot],
            sems.at[slot],
        )

    num_chunks = pl.cdiv(n, chunk)

    @pl.when(n > 0)
    def _():
        chunk_dma(0, 0).start()

        def chunk_body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_dma(c + 1, 1 - slot).start()

            chunk_dma(c, slot).wait()
            m = jnp.minimum(n - c * chunk, chunk)

            def tri_body(k, _):
                r = lambda j: rows_smem[slot, k, j]
                e0 = r(0) * px + r(1) * py + r(2)
                e1 = r(3) * px + r(4) * py + r(5)
                e2 = r(6) * px + r(7) * py + r(8)
                z = r(9) * px + r(10) * py + r(11)
                zbuf = zref[0]
                ok = (
                    (e0 >= 0.0)
                    & (e1 >= 0.0)
                    & (e2 >= 0.0)
                    & (z >= 0.0)
                    & (z <= 1.0)
                    & (z < zbuf)
                )
                sid = jax.lax.bitcast_convert_type(r(12), jnp.int32)
                zref[0] = jnp.where(ok, z, zbuf)
                iref[0] = jnp.where(ok, sid, iref[0])
                return 0

            jax.lax.fori_loop(0, m, tri_body, 0)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _untile(buf: Array, tiles_y: int, tiles_x: int, tile_h: int, tile_w: int) -> Array:
    """(num_tiles, S, 128) row-major tile pixels -> (Hp, Wp)."""
    return (
        buf.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tile_h, tiles_x * tile_w)
    )


def rasterize_tiled(
    setup: TriSetup,
    height: int,
    width: int,
    config: RenderConfig,
    tile_h: int | None = None,
    tile_w: int | None = None,
) -> Tuple[Array, Array]:
    """Binned tiled rasterization; drop-in replacement for the brute force."""
    th = tile_h or config.tile_h
    tw = tile_w or config.tile_w
    assert (th * tw) % 128 == 0, "tile pixel count must fill whole lanes"
    tiles_x = -(-width // tw)
    tiles_y = -(-height // th)
    num_tiles = tiles_x * tiles_y
    sublanes = th * tw // 128
    chunk = config.raster_chunk
    pair_cap = config.pair_capacity(setup.capacity)

    pairs = binning.bin_triangles(setup, tiles_x, tiles_y, tw, th, pair_cap)
    rows = binning.pack_raster_rows(setup)[pairs.sorted_slot]  # (pair_cap, 16)
    # Tail guard: the DMA may read up to `chunk` rows past a segment end.
    rows = jnp.pad(rows, ((0, chunk), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((1, sublanes, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sublanes, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, chunk, 16), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _raster_kernel, tiles_x=tiles_x, tile_h=th, tile_w=tw, chunk=chunk
    )
    zt, it = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, sublanes, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, sublanes, 128), jnp.int32),
        ],
        interpret=_interpret(),
    )(pairs.tile_start, rows)

    zbuf = _untile(zt, tiles_y, tiles_x, th, tw)[:height, :width]
    ibuf = _untile(it, tiles_y, tiles_x, th, tw)[:height, :width]
    return zbuf, ibuf
