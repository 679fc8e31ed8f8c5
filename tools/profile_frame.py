"""Stage-by-stage TPU timing of the frame pipeline on the bench scene.

Run on the TPU box: python tools/profile_frame.py [WxH] [shadow]
Times each jitted stage in isolation (block_until_ready between), plus
microbenchmarks of the suspected hot spots (sort, gathers).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    # block_until_ready can acknowledge early through the remote-TPU tunnel;
    # a tiny device->host copy is a hard sync.
    leaf = jax.tree_util.tree_leaves(out)[0]
    # Slice FIRST: .ravel() of the full image compiles a 6 MB copy per
    # sync (showed up as a 0.36 ms/frame reshape in the ops table).
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])


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
    from arctic_tpu.core.scene import default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import binning, raster, raster_tiles

    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    W, H = map(int, res.split("x"))
    shadow = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    config = RenderConfig(width=W, height=H, shadow_size=shadow)
    print(f"backend={jax.default_backend()} {W}x{H} shadow={shadow}")

    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    geom = bufs.geometry
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, eye=jnp.asarray([-14.0, 4.5, 0.0]), rotation=jnp.asarray([-8.0, 0.0])
        ),
    )
    settings = default_settings()

    # --- stage jits ---
    @jax.jit
    def stage_setup(bufs, params):
        world = pipeline.vertex_world_positions(bufs.geometry)
        clip = pipeline.to_clip(world, params.camera.proj_view())
        tv = jnp.arange(bufs.geometry.capacity) < bufs.geometry.num_tris
        clipped = raster.near_clip_triangles(clip, bufs.geometry.indices, tv)
        return world, raster.setup_screen_triangles(clipped, W, H, cull="back")

    t, (world, setup) = timeit(stage_setup, bufs, params)
    print(f"setup(clip+planes): {t*1e3:8.2f} ms")

    tiles_x = -(-W // config.tile_w)
    tile_rows = -(-H // config.tile_h)
    pair_cap = config.pair_capacity(setup.capacity)
    print(f"  slots={setup.capacity} pair_cap={pair_cap} tiles={tiles_x}x{tile_rows}")

    @jax.jit
    def stage_bin(setup):
        return binning.bin_triangles(setup, tiles_x, tile_rows, config.tile_w, config.tile_h, pair_cap)

    t, pairs = timeit(stage_bin, setup)
    print(f"binning(+sort):     {t*1e3:8.2f} ms   total_pairs={int(pairs.total_pairs)}")

    @jax.jit
    def stage_align(setup, pairs):
        table = binning.pack_raster_rows(setup)
        segs = binning.align_segments(pairs, tiles_x * tile_rows, dead_slot=table.shape[0] - 1)
        rows = table[segs.slot]
        return jnp.pad(rows, ((0, config.raster_chunk), (0, 0))).reshape(-1, 128), segs

    t, (rows, segs) = timeit(stage_align, setup, pairs)
    print(f"align+gather rows:  {t*1e3:8.2f} ms")

    @jax.jit
    def stage_raster(setup):
        return raster_tiles.rasterize_tiled(setup, H, W, config)

    t, (zbuf, ibuf) = timeit(stage_raster, setup)
    print(f"raster total:       {t*1e3:8.2f} ms  (bin+align+kernel)")

    @jax.jit
    def stage_shadow(world, params):
        return pipeline.shadow_pass(bufs.geometry, params.sun.proj_view(), config)[0]

    t, shadow_map = timeit(stage_shadow, world, params)
    print(f"shadow pass total:  {t*1e3:8.2f} ms")

    @jax.jit
    def stage_shade(bufs, params, setup, ibuf, world, shadow_map):
        sun_pv = params.sun.proj_view()
        return pipeline.shade(bufs, params, setup, ibuf, world, shadow_map, sun_pv, config)

    t, hdr = timeit(stage_shade, bufs, params, setup, ibuf, world, shadow_map)
    print(f"shade:              {t*1e3:8.2f} ms")

    render = pipeline.make_renderer(config)
    t, _ = timeit(render, bufs, params, settings)
    print(f"FULL FRAME:         {t*1e3:8.2f} ms   ({1.0/t:.2f} fps)")

    # --- microbenches ---
    k = jnp.asarray(np.random.randint(0, 2040, pair_cap).astype(np.int32))
    v = jnp.arange(pair_cap, dtype=jnp.int32)

    @jax.jit
    def just_sort(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=True)

    t, _ = timeit(just_sort, k, v)
    print(f"  sort {pair_cap/1e6:.1f}M pairs: {t*1e3:8.2f} ms")

    table16 = jnp.asarray(np.random.rand(setup.capacity + 8, 16).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, setup.capacity, pair_cap).astype(np.int32))

    @jax.jit
    def just_gather(table, idx):
        return table[idx]

    t, _ = timeit(just_gather, table16, idx)
    print(f"  gather (cap,16):   {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
