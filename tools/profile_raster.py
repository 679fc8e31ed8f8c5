"""Substage timing of raster_gbuffer + shadow pass on the bench scene (TPU)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import default_scene_params
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import binning, raster, raster_tiles

    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    W, H = map(int, res.split("x"))
    config = RenderConfig(width=W, height=H, shadow_size=4000)
    print(f"backend={jax.default_backend()} {W}x{H}", flush=True)

    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, eye=jnp.asarray([-14.0, 4.5, 0.0]), rotation=jnp.asarray([-8.0, 0.0])
        ),
    )

    @jax.jit
    def stage_setup(bufs, params):
        world = pipeline.vertex_world_positions(bufs.geometry)
        clip = pipeline.to_clip(world, params.camera.proj_view())
        tv = jnp.arange(bufs.geometry.capacity) < bufs.geometry.num_tris
        clipped = raster.near_clip_triangles(clip, bufs.geometry.indices, tv)
        return world, raster.setup_screen_triangles(clipped, W, H, cull="back")

    t, (world, setup) = timeit(stage_setup, bufs, params)
    print(f"setup:              {t*1e3:8.2f} ms", flush=True)

    tiles_x = config.tiles_x
    tile_rows = config.tiles_y
    num_tiles = tiles_x * tile_rows
    pair_cap = config.pair_capacity(setup.capacity)

    @jax.jit
    def stage_bin(setup):
        return binning.bin_triangles(setup, tiles_x, tile_rows, config.tile_w, config.tile_h, pair_cap)

    t, pairs = timeit(stage_bin, setup)
    print(f"camera bin(+sort):  {t*1e3:8.2f} ms   total_pairs={int(pairs.total_pairs)} cap={pair_cap}", flush=True)

    @jax.jit
    def stage_align(setup, pairs):
        table = binning.pack_raster_rows(setup)
        segs = binning.align_segments(pairs, num_tiles, dead_slot=table.shape[0] - 1)
        rows = table[segs.slot]
        return jnp.pad(rows, ((0, config.raster_chunk), (0, 0))).reshape(-1, 128), segs

    t, (rows, segs) = timeit(stage_align, setup, pairs)
    print(f"camera align+rows:  {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def stage_kernel_only(setup):
        zt, it, segs, pairs, _rows = raster_tiles.bin_and_rasterize(
            setup, W, config, tiles_x, tile_rows, config.tile_h, config.tile_w, 0
        )
        return it

    t, it_full = timeit(stage_kernel_only, setup)
    print(f"camera bin+align+kernel: {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def stage_rows(bufs, setup, params):
        return pipeline.build_shade_rows(setup, bufs.geometry, params.sun.proj_view())

    t, shade_rows = timeit(stage_rows, bufs, setup, params)

    @jax.jit
    def stage_gbuf(setup, shade_rows):
        return raster_tiles.raster_gbuffer(setup, shade_rows, H, W, config)

    t, _ = timeit(stage_gbuf, setup, shade_rows)
    print(f"camera raster_gbuffer:   {t*1e3:8.2f} ms  (select kernel = this - bin+align+kernel - rows gather)", flush=True)

    # --- shadow ---
    s = config.shadow_size
    st = config.shadow_tile
    stx = -(-s // st)
    s_tiles = stx * stx

    @jax.jit
    def sh_setup(world, params):
        clip = pipeline.to_clip(world, params.sun.proj_view())
        tri_valid = jnp.arange(bufs.geometry.capacity) < bufs.geometry.num_tris
        clipped = raster.near_clip_triangles(clip, bufs.geometry.indices, tri_valid)
        return raster.setup_screen_triangles(clipped, s, s, cull="front")

    t, ssetup = timeit(sh_setup, world, params)
    print(f"shadow setup:       {t*1e3:8.2f} ms", flush=True)

    sh_cap = config.pair_capacity(ssetup.capacity)

    @jax.jit
    def sh_bin(ssetup):
        return binning.bin_triangles(ssetup, stx, stx, st, st, sh_cap)

    t, spairs = timeit(sh_bin, ssetup)
    print(f"shadow bin(+sort):  {t*1e3:8.2f} ms   total_pairs={int(spairs.total_pairs)} cap={sh_cap}", flush=True)

    @jax.jit
    def sh_raster(ssetup):
        zt, it, segs, pairs, _rows = raster_tiles.bin_and_rasterize(
            ssetup, s, config, stx, stx, st, st, 0
        )
        return zt

    t, _ = timeit(sh_raster, ssetup)
    print(f"shadow bin+align+kernel: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
