"""Dump per-128-px-row material bitmasks for the textured bench fly-through.

probe_tex_groups showed CONTIGUOUS material grouping mixes 28-47% of rows
(the bench scene assigns materials round-robin across objects). This dumps,
for every pixel-block row of several fly-through frames, the 24-bit mask of
materials its covered pixels touch — so grouping strategies (optimized
partitions, shared-material replication, adjacent-pair routing) can be
searched OFFLINE against real data instead of re-running the TPU per idea.

Usage: python tools/probe_tex_rowmasks.py [out.npz]   (defaults /tmp/texrows.npz)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import default_scene_params
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import raster, raster_tiles

    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)
    meshes, objects, materials, env = sponza_like_scene(
        texture_size=8, n_materials=24  # tiny textures: same material ids
    )
    bufs = build_buffers(meshes, objects, materials, env)
    geom = bufs.geometry
    t_cap = geom.capacity
    base = default_scene_params(aspect=W / H)

    @jax.jit
    def rowmasks(params):
        wc = pipeline.world_corners(geom)
        cam_pv = params.camera.proj_view()
        tri_valid = jnp.arange(t_cap) < geom.num_tris
        clipped = raster.near_clip_corners(
            pipeline.corners_clip(wc, cam_pv), tri_valid
        )
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        _, ibuf = raster_tiles.rasterize_tiled(setup, H, W, config, crop=False)
        th, tw = config.tile_h, config.tile_w
        rows = (
            ibuf.reshape(config.tiles_y, th, config.tiles_x, tw)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 128)
        )
        covered = rows >= 0
        mat = geom.tri_material[jnp.where(covered, rows, 0) % t_cap]
        bit = jnp.where(covered, jnp.int32(1) << mat, 0)
        return jax.lax.reduce_or(bit, axes=(1,))

    masks = []
    for i in range(0, 20, 2):  # 10 fly-through viewpoints
        params = dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )
        masks.append(np.asarray(rowmasks(params)))
        print(f"frame {i}: {np.count_nonzero(masks[-1])} covered rows", flush=True)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/texrows.npz"
    np.savez_compressed(out, masks=np.stack(masks))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
