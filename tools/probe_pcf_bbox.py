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
    sub = config.tile_h * config.tile_w // 128

    def tiled(a):  # (R, 128) pixel-block -> (T, S) numpy
        a = np.asarray(a)
        return a.reshape(a.shape[0] // sub, sub * 128)

    covered = tiled(ibuf_tiles) >= 0  # (T, S)
    x = tiled(gbuf[14])
    y = tiled(gbuf[15])
    z = tiled(gbuf[16])

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

    # --- window-row sharing rates (quad-shared PCF gather feasibility) ---
    # Pixel-block layout: a (R, 128) row holds two screen rows of a 64-wide
    # tile; a 2x2 screen quad = lanes (2j, 2j+1, 64+2j, 64+2j+1) of one row.
    from arctic_tpu.ops.shadow import window_row_index_q

    S_ = S
    start_y = np.clip(wy + 2, 0, S_)
    start_x = np.clip(wx + 2, 0, S_)
    xb = (-(-(S_ + 4 + 3) // 128) + 7) // 8 * 8
    jrow, k2, yoff, xoff = window_row_index_q(start_y, start_x, xb)
    R = covered.shape[0] * sub
    jr = jrow.reshape(R, 128)
    act = inside.reshape(R, 128)  # only pixels that actually gather

    def share(groups):  # groups: list of lane-index arrays forming a group
        g = np.stack([jr[:, li] for li in groups], axis=0)  # (k, R, 64...)
        a = np.stack([act[:, li] for li in groups], axis=0)
        ref = g[0]
        same = np.ones_like(ref, bool)
        for i in range(len(groups)):
            same &= ~a[i] | (g[i] == ref)
        any_act = a.any(axis=0)
        return (same & any_act).sum() / max(any_act.sum(), 1)

    print("pair-share (x-adjacent, both halves):",
          f"{share([np.r_[2*np.arange(32), 64+2*np.arange(32)], np.r_[2*np.arange(32)+1, 64+2*np.arange(32)+1]]):.4f}")
    q = [2 * np.arange(32), 2 * np.arange(32) + 1,
         64 + 2 * np.arange(32), 64 + 2 * np.arange(32) + 1]
    print("quad-share (2x2, strict jrow equality):", f"{share(q):.4f}")
    # y-bucket and x-bucket agreement separately (which axis straddles?)
    qy = start_y // 12
    qx8 = start_x // 8
    for nm, vv in (("qy(12)", qy), ("qx(8)", qx8)):
        g = vv.reshape(R, 128)
        gg = np.stack([g[:, li] for li in q], axis=0)
        aa = np.stack([act[:, li] for li in q], axis=0)
        same = np.ones_like(gg[0], bool)
        for i in range(4):
            same &= ~aa[i] | (gg[i] == gg[0])
        any_act = aa.any(axis=0)
        print(f"quad agreement on {nm}:", f"{(same & any_act).sum() / max(any_act.sum(), 1):.4f}")


if __name__ == "__main__":
    main()
