"""Probe: 128-px-row material-GROUP mixing rate on the textured bench scene.

The textured tile atlas (24 mats x 3 x 1024^2, ~613 MB) gathers at the
~9.9 ns/row slow tier (probe_gather_cliff: fast tier ends at ~112 MB).
Splitting it into G per-material-group tables <= ~104 MB puts uniform rows
back on the 1.8 ns tier via row-granular compaction (the pcf_row_cap
machinery's pattern); rows whose covered pixels span >1 group need a
fallback. This measures the mixing rate at 128-px-row granularity for
G = 2..8 contiguous material groups over the bench fly-through viewpoints.

Env rows ride every group table (uncovered pixels join any group), so sky
pixels never cause mixing.

Usage: python tools/probe_tex_groups.py
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
        texture_size=8, n_materials=24  # tiny textures: same geometry/material ids
    )
    bufs = build_buffers(meshes, objects, materials, env)
    geom = bufs.geometry
    t_cap = geom.capacity
    base = default_scene_params(aspect=W / H)

    @jax.jit
    def ibuf_of(params):
        wc = pipeline.world_corners(geom)
        cam_pv = params.camera.proj_view()
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        clipped = raster.near_clip_corners(
            pipeline.corners_clip(wc, cam_pv), tri_valid
        )
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        _, ibuf = raster_tiles.rasterize_tiled(setup, H, W, config)
        return ibuf

    mat_of_tri = np.asarray(bufs.geometry.tri_material)
    th, tw = config.tile_h, config.tile_w

    for i in (0, 10, 19):
        params = dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )
        ibuf = np.asarray(ibuf_of(params))  # (H, W)
        # Rebuild the pixel-block row layout: tile-major, row-major in tile.
        hp, wp = -(-H // th) * th, -(-W // tw) * tw
        ib = np.full((hp, wp), -1, np.int32)
        ib[:H, :W] = ibuf
        rows = (
            ib.reshape(hp // th, th, wp // tw, tw)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 128)
        )  # (R, 128)
        covered = rows >= 0
        mat = np.where(covered, mat_of_tri[np.where(covered, rows, 0) % t_cap], -1)
        cov_rows = covered.any(axis=1)
        print(f"frame {i}: covered rows {cov_rows.mean():.1%}")
        for g in (2, 3, 4, 6, 8):
            gsz = -(-24 // g)
            grp = np.where(covered, mat // gsz, -1)
            gmax = grp.max(axis=1)
            gmin = np.where(covered, grp, 99).min(axis=1)
            mixed = cov_rows & (gmax != np.where(gmin == 99, gmax, gmin))
            # uniform rows per group (for cap sizing): counts of rows whose
            # single group is k.
            uni = cov_rows & ~mixed
            per_group = np.bincount(
                gmax[uni], minlength=g
            )
            print(
                f"  G={g}: mixed rows {mixed.sum()}/{cov_rows.sum()} "
                f"({mixed.sum() / max(cov_rows.sum(), 1):.1%}), "
                f"uniform per-group max {per_group.max()}/{len(rows)} rows"
            )


if __name__ == "__main__":
    main()
