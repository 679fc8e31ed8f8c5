"""Stage timing of the FUSED shading path on the bench scene (TPU)."""

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
    from arctic_tpu.core.scene import default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import raster, raster_tiles, shadow as shadow_ops, tonemap

    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    W, H = map(int, res.split("x"))
    shadow_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    config = RenderConfig(width=W, height=H, shadow_size=shadow_size)
    print(f"backend={jax.default_backend()} {W}x{H} shadow={shadow_size} fused")

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

    if "--no-autotune" not in sys.argv:
        config = pipeline.autotune_pair_caps(bufs, params, config, margin=1.4)
        config = dataclasses.replace(config, static_point_lights=4)
        print(f"pair caps: cam={config.pair_cap_cam} shadow={config.pair_cap_shadow}")

    render = pipeline.make_renderer(config)
    t, _ = timeit(render, bufs, params, settings)
    print(f"FULL FRAME:           {t*1e3:8.2f} ms   ({1.0/t:.2f} fps)", flush=True)

    @jax.jit
    def stage_setup(bufs, params):
        world = pipeline.vertex_world_positions(bufs.geometry)
        clip = pipeline.to_clip(world, params.camera.proj_view())
        tv = jnp.arange(bufs.geometry.capacity) < bufs.geometry.num_tris
        clipped = raster.near_clip_triangles(clip, bufs.geometry.indices, tv)
        return world, raster.setup_screen_triangles(clipped, W, H, cull="back")

    t, (world, setup) = timeit(stage_setup, bufs, params)
    print(f"setup(clip+planes):   {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def stage_rows(bufs, setup, params):
        return pipeline.build_shade_rows(setup, bufs.geometry, params.sun.proj_view())

    t, shade_rows = timeit(stage_rows, bufs, setup, params)
    print(f"build_shade_rows:     {t*1e3:8.2f} ms   {shade_rows.shape}", flush=True)

    @jax.jit
    def stage_gbuf(setup, shade_rows):
        return raster_tiles.raster_gbuffer(setup, shade_rows, H, W, config)

    t, (ibuf_tiles, gbuf, pairs) = timeit(stage_gbuf, setup, shade_rows)
    print(f"raster_gbuffer:       {t*1e3:8.2f} ms   (bin+align+raster+select)", flush=True)

    @jax.jit
    def stage_shadow(world, params):
        return pipeline.shadow_pass(bufs.geometry, params.sun.proj_view(), config)[0]

    t, shadow_map = timeit(stage_shadow, world, params)
    print(f"shadow pass:          {t*1e3:8.2f} ms", flush=True)

    covered = ibuf_tiles >= 0

    @jax.jit
    def stage_shade(bufs, params, gbuf, covered, shadow_map):
        return pipeline.shade_gbuffer(
            bufs, params, gbuf, covered, shadow_map, config, tiles_x=config.tiles_x
        )

    t, hdr = timeit(stage_shade, bufs, params, gbuf, covered, shadow_map)
    print(f"shade_gbuffer:        {t*1e3:8.2f} ms", flush=True)

    # shade_gbuffer internals (channel-first)
    @jax.jit
    def stage_tex(bufs, gbuf):
        from arctic_tpu.ops.sampling import sample_quads_flat

        a = bufs.atlas
        return sample_quads_flat(
            a.combined_quads, a.combined_block_grid,
            gbuf[43], gbuf[44], gbuf[45], gbuf[46],
            gbuf[12], gbuf[13])

    t, _ = timeit(stage_tex, bufs, gbuf)
    print(f"  tex (combined):     {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def stage_pcf(shadow_map, gbuf):
        return shadow_ops.pcf_shadow_proj(
            shadow_map, gbuf[14], gbuf[15], gbuf[16])

    t, _ = timeit(stage_pcf, shadow_map, gbuf)
    print(f"  pcf:                {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def stage_post(hdr, settings):
        x = hdr.astype(jnp.float16).astype(jnp.float32)
        ldr = tonemap.tonemap(x, settings.tm_method, settings.gamma, settings.exposure, channel_axis=0)
        img = tonemap.to_unorm8(ldr)
        return raster_tiles.untile_packed_u8(
            img, config.tiles_y, config.tiles_x, config.tile_h, config.tile_w
        )[:H, :W]

    t, _ = timeit(stage_post, hdr, settings)
    print(f"post+untile:          {t*1e3:8.2f} ms", flush=True)




if __name__ == "__main__":
    main()
