"""Measure how many (tile, triangle) pairs an edge-exact tile reject
would drop on the bench scene, for both raster passes.

Bbox binning keeps a pair whenever the triangle's screen bbox overlaps
the tile; a thin/diagonal triangle's bbox can cover many tiles the
triangle itself never touches. An exact reject drops a pair when all
4 corner pixel centers of the tile lie strictly outside one edge
(edge functions are affine, so the rect max is at a corner).

Host-side numpy over the device setup arrays — measurement only.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def pair_stats(setup, width, height, tile_w, tile_h, name):
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    x0, y0, x1, y1 = (np.asarray(v) for v in setup.bbox)
    valid = np.asarray(setup.valid)
    edges = [[np.asarray(c) for c in e] for e in setup.edges]

    tx0 = np.clip((x0 / tile_w).astype(np.int32), 0, tiles_x - 1)
    tx1 = np.clip(((x1 - 1e-3) / tile_w).astype(np.int32), 0, tiles_x - 1)
    ty0 = np.clip((y0 / tile_h).astype(np.int32), 0, tiles_y - 1)
    ty1 = np.clip(((y1 - 1e-3) / tile_h).astype(np.int32), 0, tiles_y - 1)

    total = 0
    kept = 0
    tris = np.nonzero(valid)[0]
    for t in tris:
        txs = np.arange(tx0[t], tx1[t] + 1)
        tys = np.arange(ty0[t], ty1[t] + 1)
        n = len(txs) * len(tys)
        total += n
        gx, gy = np.meshgrid(txs, tys)
        # tile pixel-center rect
        rx0 = gx * tile_w + 0.5
        rx1 = gx * tile_w + tile_w - 0.5
        ry0 = gy * tile_h + 0.5
        ry1 = gy * tile_h + tile_h - 0.5
        keep = np.ones(gx.shape, bool)
        for (A, B, C) in edges:
            a, b, c = A[t], B[t], C[t]
            mx = a * np.where(a >= 0, rx1, rx0) + b * np.where(b >= 0, ry1, ry0) + c
            keep &= mx >= 0.0
        kept += int(keep.sum())
    print(
        f"{name}: tris {len(tris)}, pairs {total}, kept {kept} "
        f"({100.0 * kept / max(total, 1):.1f}%), rejected {total - kept} "
        f"({100.0 * (total - kept) / max(total, 1):.1f}%)"
    )
    return total, kept


def main():
    jax.config.update("jax_platforms", "cpu")
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import default_scene_params
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import raster

    W, H, S = 1920, 1080, 4000
    config = RenderConfig(width=W, height=H, shadow_size=S)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera,
            eye=jnp.asarray([-14.0, 4.5, 0.0]),
            rotation=jnp.asarray([-8.0, 0.0]),
        ),
        sun=dataclasses.replace(
            params.sun,
            position=jnp.asarray([0.0, 24.0, 0.0]),
            rotation=jnp.asarray([-65.0, 30.0]),
        ),
    )

    geom = bufs.geometry
    wc = pipeline.world_corners(geom)
    tri_valid = jnp.arange(geom.capacity) < geom.num_tris

    cam_clip = raster.near_clip_corners(
        pipeline.corners_clip(wc, params.camera.proj_view()), tri_valid
    )
    cam_setup = jax.jit(
        lambda c: raster.setup_screen_triangles(c, W, H, cull="back")
    )(cam_clip)
    pair_stats(cam_setup, W, H, config.tile_w, config.tile_h, "camera 64x64")

    sun_pv = params.sun.proj_view()
    sun_clip = raster.near_clip_corners(
        pipeline.corners_clip(wc, sun_pv), tri_valid
    )
    shadow_setup = jax.jit(
        lambda c: raster.setup_screen_triangles(c, S, S, cull="front")
    )(sun_clip)
    st = config.shadow_tile
    pair_stats(shadow_setup, S, S, st, st, f"shadow {st}x{st}")


if __name__ == "__main__":
    main()
