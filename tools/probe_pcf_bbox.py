"""Measure per-screen-tile shadow-window bbox sizes on the bench scene.

If most 32x32-pixel tiles touch a small shadow-map rect, PCF can DMA the
rect into VMEM per tile instead of gathering from a 1 GB window LUT.
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

    W, H, S = 1920, 1080, 4000
    config = RenderConfig(width=W, height=H, shadow_size=S)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, eye=jnp.asarray([-14.0, 4.5, 0.0]), rotation=jnp.asarray([-8.0, 0.0])
        ),
        sun=dataclasses.replace(
            params.sun, position=jnp.asarray([0.0, 24.0, 0.0]), rotation=jnp.asarray([-65.0, 30.0])
        ),
    )

    @jax.jit
    def gbuf_fn(bufs, params):
        geom = bufs.geometry
        wc = pipeline.world_corners(geom)
        sun_pv = params.sun.proj_view()
        sun_clip = pipeline.corners_clip(wc, sun_pv)
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        clipped = raster.near_clip_corners(
            pipeline.corners_clip(wc, params.camera.proj_view()), tri_valid
        )
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        rows = pipeline.build_shade_rows(
            setup, geom, sun_pv, wc=wc, lsp=tuple(c[:3] for c in sun_clip)
        )
        ibuf_tiles, gbuf, _ = raster_tiles.raster_gbuffer(setup, rows, H, W, config)
        return ibuf_tiles, gbuf

    ibuf_tiles, gbuf = gbuf_fn(bufs, params)
    covered = np.asarray(ibuf_tiles) >= 0  # (T, S)
    x = np.asarray(gbuf[14])
    y = np.asarray(gbuf[15])
    z = np.asarray(gbuf[16])

    u = x * 0.5 + 0.5
    v = 1.0 - (y * 0.5 + 0.5)
    inside = covered & (z <= 1.0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    tx = u * S - 0.5
    ty = v * S - 0.5
    wx = np.floor(tx).astype(np.int64) - 1
    wy = np.floor(ty).astype(np.int64) - 1

    T = covered.shape[0]
    spans = []
    for t in range(T):
        m = inside[t]
        if not m.any():
            spans.append((0, 0))
            continue
        sx = wx[t][m].max() - wx[t][m].min() + 4
        sy = wy[t][m].max() - wy[t][m].min() + 4
        spans.append((sy, sx))
    spans = np.array(spans)
    areas = spans[:, 0] * spans[:, 1]
    print("tiles:", T, "tiles w/ shadow taps:", (areas > 0).sum())
    for q in [50, 90, 95, 99, 99.5, 100]:
        i = min(int(len(areas) * q / 100), len(areas) - 1)
        a = np.sort(areas)[i]
        print(f"  p{q}: area {a} texels")
    print("span-y percentiles:", np.percentile(spans[:, 0], [50, 90, 95, 99, 100]).astype(int))
    print("span-x percentiles:", np.percentile(spans[:, 1], [50, 90, 95, 99, 100]).astype(int))
    big = (spans[:, 0] > 256) | (spans[:, 1] > 512)
    print("tiles exceeding 256x512 rect:", int(big.sum()), "/", T)
    big2 = (spans[:, 0] > 128) | (spans[:, 1] > 512)
    print("tiles exceeding 128x512 rect:", int(big2.sum()), "/", T)
    # escapee pixel count if rect anchored at per-tile min corner, 128x512
    esc = 0
    for t in range(T):
        m = inside[t]
        if not m.any():
            continue
        oy = wy[t][m].min()
        ox = wx[t][m].min()
        e = ((wy[t][m] - oy > 124) | (wx[t][m] - ox > 508)).sum()
        esc += int(e)
    print("escapee pixels beyond per-tile 128x512 rect:", esc, "of", int(inside.sum()))


if __name__ == "__main__":
    main()
