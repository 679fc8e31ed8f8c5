"""Multi-chip rendering: screen-tile-row sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2 end, §5.8) — this module
is the TPU-native scaling story that replaces nothing-in-the-reference:

- geometry/scene params are replicated (small);
- each device bins and rasterizes only its horizontal slab of screen tiles
  (the binning sort shrinks per device: bbox/row-window rejection happens
  before pair expansion);
- the shadow map is rendered slab-parallel too, then ``all_gather``-ed over
  ICI because PCF sampling needs the whole map on every device (each device
  then builds its own PCF window LUT from the gathered map — redundant
  energy but fully parallel, so no wall-clock cost; gathering the 4x-larger
  LUT instead would trade ICI bytes for that energy);
- shading/tonemap stay slab-local, and the final u8 frame comes out
  row-sharded (one device->host copy per slab, or leave it on-device).

SPMD via shard_map: XLA inserts exactly one collective (the shadow-map
all-gather); everything else is embarrassingly parallel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import SceneBuffers, SceneParams, Settings
from arctic_tpu.models import pipeline
from arctic_tpu.ops import raster, tonemap

Array = jnp.ndarray

AXIS = "tiles"


def make_mesh(num_devices: int | None = None, devices: Sequence | None = None) -> Mesh:
    devs = list(devices or jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(devs, (AXIS,))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _rasterize_slab(setup, viewport_h, viewport_w, config, row0_tiles, tile_rows, y0_px, rows_px):
    """Rasterize one device's slab; returns (zbuf, ibuf) of (rows_px, vw)."""
    if config.force_bruteforce:
        return raster.rasterize_bruteforce(
            setup, rows_px, viewport_w, config.raster_chunk, y_offset=y0_px
        )
    from arctic_tpu.ops import raster_tiles

    zb, ib = raster_tiles.rasterize_tiled(
        setup,
        viewport_h,
        viewport_w,
        config,
        tile_row0=row0_tiles,
        tile_rows=tile_rows,
        crop=False,
        vma=(AXIS,),
    )
    return zb[:, :viewport_w], ib[:, :viewport_w]


def render_frame_sharded(
    buffers: SceneBuffers,
    params: SceneParams,
    settings: Settings,
    config: RenderConfig,
    mesh: Mesh,
    check_vma: bool = True,
) -> Array:
    """Full frame over every device in ``mesh``; returns (H, W, 3) u8,
    row-sharded across the mesh axis."""
    ndev = mesh.shape[AXIS]
    th = config.tile_h
    h, w, s = config.height, config.width, config.shadow_size

    cam_tile_rows = _round_up(-(-h // th), ndev)
    cam_rows_dev = cam_tile_rows // ndev
    sh_tile_rows = _round_up(-(-s // th), ndev)
    sh_rows_dev = sh_tile_rows // ndev

    def device_frame(buffers, params, settings):
        d = jax.lax.axis_index(AXIS)
        geom = buffers.geometry
        world = pipeline.vertex_world_positions(geom)
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris

        # Shadow slab -> all-gather to the full map (the one ICI collective).
        sun_pv = params.sun.proj_view()
        sh_clip = pipeline.to_clip(world, sun_pv)
        sh_clipped = raster.near_clip_triangles(sh_clip, geom.indices, tri_valid)
        sh_setup = raster.setup_screen_triangles(sh_clipped, s, s, cull="front")
        sh_z, _ = _rasterize_slab(
            sh_setup, s, s, config, d * sh_rows_dev, sh_rows_dev,
            (d * sh_rows_dev * th).astype(jnp.float32), sh_rows_dev * th,
        )
        shadow_map = jax.lax.all_gather(sh_z, AXIS, axis=0, tiled=True)[:s, :s]

        # Camera slab.
        cam_pv = params.camera.proj_view()
        clip = pipeline.to_clip(world, cam_pv)
        clipped = raster.near_clip_triangles(clip, geom.indices, tri_valid)
        setup = raster.setup_screen_triangles(clipped, w, h, cull="back")
        y0 = (d * cam_rows_dev * th).astype(jnp.float32)
        _, ibuf = _rasterize_slab(
            setup, h, w, config, d * cam_rows_dev, cam_rows_dev, y0, cam_rows_dev * th
        )
        hdr = pipeline.shade(
            buffers, params, setup, ibuf, world, shadow_map, sun_pv, config, y0=y0
        )
        if config.hdr_half_round:
            hdr = hdr.astype(jnp.float16).astype(jnp.float32)
        ldr = tonemap.tonemap(hdr, settings.tm_method, settings.gamma, settings.exposure)
        return tonemap.to_unorm8(ldr)

    # check_vma=False is needed for the Pallas-tiled path in interpret mode
    # (jax 0.9's pallas interpreter mixes varying/unvarying internally);
    # correctness either way is covered by the sharded-vs-single tests.
    fn = jax.shard_map(
        device_frame,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(AXIS),
        check_vma=check_vma,
    )
    img = fn(buffers, params, settings)  # (cam_tile_rows * th, W, 3) row-sharded
    return img[:h]


def make_sharded_renderer(config: RenderConfig, mesh: Mesh, check_vma: bool = True):
    return jax.jit(
        functools.partial(
            render_frame_sharded, config=config, mesh=mesh, check_vma=check_vma
        )
    )
