"""lut_rows shadow raster: row-major depth straight into the LUT input.

pipeline.shadow_pass(lut_rows=True) emits the window-LUT build's input
layout from the raster kernel (pair-of-64-px-tiles lane merges — see
raster_tiles.bin_and_rasterize), skipping the untile transpose + retile
copies. These tests pin (1) the assembled rows against the tile-major
untile, and (2) the full frame against the classic path.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import raster, raster_tiles

S = 192  # 3x3 shadow tiles of 64; padded to 8 tile cols (tps = 8)


def _setup(bufs, params, config):
    geom = bufs.geometry
    sun_pv = params.sun.proj_view()
    wc = pipeline.world_corners(geom)
    sun_clip = pipeline.corners_clip(wc, sun_pv)
    tri_valid = jnp.arange(geom.capacity) < geom.num_tris
    clipped = raster.near_clip_corners(sun_clip, tri_valid)
    return raster.setup_screen_triangles(clipped, S, S, cull="front")


def test_lut_rows_matches_untile():
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    params = default_scene_params()
    config = RenderConfig(width=128, height=128, shadow_size=S)
    setup = _setup(bufs, params, config)

    zt, _, _, _, _ = raster_tiles.bin_and_rasterize(
        setup, S, config, 3, 3, 64, 64, 0, kind="shadow", depth_only=True
    )
    ref = raster_tiles._untile(zt, 3, 3, 64, 64)  # (192, 192)
    zflat, _, _, _, _ = raster_tiles.bin_and_rasterize(
        setup, S, config, 3, 3, 64, 64, 0, kind="shadow", depth_only=True,
        lut_rows=True,
    )
    assert zflat.shape == (192, 512)
    np.testing.assert_array_equal(
        np.asarray(zflat)[:S, :S], np.asarray(ref)[:S, :S]
    )
    # Padded tile columns carry the 1.0 clear.
    assert (np.asarray(zflat)[:, 192:] == 1.0).all()


def test_lut_rows_frame_bit_identical():
    # pcf_row_cap forces the quant-LUT path on CPU; tiles_per_step parity
    # toggles the lut_rows gate (odd tps = classic path) without changing
    # results (tps is a pure scheduling knob).
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    params = dataclasses.replace(
        default_scene_params(aspect=1.0),
        camera=dataclasses.replace(
            default_scene_params().camera,
            eye=jnp.asarray([0.0, 4.0, 3.0]),
            rotation=jnp.asarray([-25.0, -90.0]),
        ),
    )
    settings = default_settings()
    base = RenderConfig(
        width=128, height=128, shadow_size=S, pcf_row_cap=4096
    )
    cfg_classic = dataclasses.replace(base, tiles_per_step=7)
    cfg_rows = dataclasses.replace(base, tiles_per_step=8)
    img_a, stats_a = pipeline.render_frame_stats(bufs, params, settings, cfg_classic)
    img_b, stats_b = pipeline.render_frame_stats(bufs, params, settings, cfg_rows)
    pipeline.check_stats(stats_a)
    pipeline.check_stats(stats_b)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
