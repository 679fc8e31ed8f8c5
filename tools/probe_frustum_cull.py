"""Measure sun-frustum shadow culling on the bench fly-through (round 4).

For each bench camera: the cull rect's tile-area fraction and the shadow
pair reduction (binning counts with vs without the rect), plus the
fly-through max kept pairs (what autotune_pair_caps would size to).

Run: python tools/probe_frustum_cull.py   (CPU or TPU; counts only)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import sponza_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import binning, raster


def main() -> None:
    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)
    base = dataclasses.replace(
        base,
        sun=dataclasses.replace(
            base.sun, position=jnp.asarray([0.0, 24.0, 0.0]),
            rotation=jnp.asarray([-65.0, 30.0]),
        ),
        point_lights=PointLights.from_list(
            [
                ((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0)),
            ]
        ),
    )
    geom = bufs.geometry
    s = config.shadow_size
    st = config.shadow_tile
    sth = config.shadow_tile_h or st
    ntx, nty = -(-s // st), -(-s // sth)

    @jax.jit
    def counts(cam_pv):
        sun_pv = base.sun.proj_view()
        wc = pipeline.world_corners(geom)
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        sc = pipeline.corners_clip(wc, sun_pv)
        clipped = raster.near_clip_corners(sc, tri_valid)
        setup = raster.setup_screen_triangles(clipped, s, s, cull="front")
        total = binning.count_pairs(setup, ntx, nty, st, sth)
        rect = pipeline.sun_cull_rect(wc, tri_valid, cam_pv, sun_pv, config)
        kept = binning.count_pairs(setup, ntx, nty, st, sth, rect=rect)
        rx0, ry0, rx1, ry1 = rect
        rtiles = jnp.maximum(rx1 - rx0 + 1, 0) * jnp.maximum(ry1 - ry0 + 1, 0)
        return total, kept, rtiles

    worst = 0
    tk_sum = 0.0
    n = 0
    for i in range(0, 81, 4):
        cam = dataclasses.replace(
            base.camera,
            eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
            rotation=jnp.asarray([-8.0, 0.3 * i]),
        )
        total, kept, rtiles = counts(cam.proj_view())
        total, kept, rtiles = int(total), int(kept), int(rtiles)
        worst = max(worst, kept)
        tk_sum += kept / total
        n += 1
        print(
            f"frame {i:2d}: pairs {total} -> {kept} (kept {kept/total:.3f}) "
            f"rect {rtiles}/{ntx*nty} tiles",
            flush=True,
        )
    print(f"mean kept {tk_sum/n:.3f}; fly-through max kept pairs {worst}")


if __name__ == "__main__":
    main()
