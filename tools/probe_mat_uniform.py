"""Measure the ceiling of a material-uniform texture-tap fast path
(VERDICT r3 weak #2: "a per-tile material-uniform fast path hasn't been
probed").

The merged texture+environment tap issues ONE row gather per pixel (the
issue-rate floor, ~2 ns/row x 2.09M). The only lever is FEWER rows, e.g.
skipping pixels whose material has ALL sampled texture slots constant
(bilinear of equal texels is exact, so the tap equals the constant). Like
PCF row compaction, skipping is only free at 128-px-row granularity, and
a row with ANY uncovered pixel still needs its env tap.

This probe measures, over the bench fly-through:
  1. pixel %: covered pixels whose material is fully constant
     (diffuse + normal + metal-roughness all single-valued),
  2. row ceiling %: 128-px rows where EVERY lane is covered with a
     fully-constant material (rows whose tap gather could be elided),
  3. tile-material-uniform %: 64x64 tiles whose covered pixels all share
     one material (upper bound for any per-tile descriptor scheme).

Run on the TPU: python tools/probe_mat_uniform.py [--textures]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import sponza_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import raster


def main() -> None:
    W, H = 1920, 1080
    config = RenderConfig(
        width=W, height=H, shadow_size=4000,
        pair_cap_cam=196608, pair_cap_shadow=327680, static_point_lights=4,
    )
    scene_kw = (
        dict(texture_size=1024, n_materials=24)
        if "--textures" in sys.argv
        else {}
    )
    meshes, objects, materials, env = sponza_like_scene(**scene_kw)
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)
    base = dataclasses.replace(
        base,
        point_lights=PointLights.from_list(
            [
                ((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0)),
            ]
        ),
    )

    def frame_params(i):
        return dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )

    # Per-material constancy from the source images (all three slots).
    def is_const(img):
        a = np.asarray(img)
        return bool((a == a.reshape(-1, a.shape[-1])[0]).all())

    const_mat = np.array(
        [
            is_const(m.diffuse) and is_const(m.normal)
            and is_const(m.metal_roughness)
            for m in materials
        ]
    )
    print(
        f"materials: {len(materials)}, fully-constant: {const_mat.sum()} "
        f"({[i for i, c in enumerate(const_mat) if c]})",
        flush=True,
    )

    t_cap = bufs.geometry.capacity
    tri_mat = np.asarray(bufs.geometry.tri_material)

    @jax.jit
    def probe(bufs, params):
        from arctic_tpu.ops import raster_tiles

        geom = bufs.geometry
        sun_pv = params.sun.proj_view()
        cam_pv = params.camera.proj_view()
        wc = pipeline.world_corners(geom)
        sun_clip = pipeline.corners_clip(wc, sun_pv)
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        clipped = raster.near_clip_corners(
            pipeline.corners_clip(wc, cam_pv), tri_valid
        )
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        shade_rows = pipeline.build_shade_rows(
            setup, geom, sun_pv, wc=wc, lsp=tuple(c[:3] for c in sun_clip)
        )
        shade_rows = jax.lax.optimization_barrier(shade_rows)
        ibuf_tiles, _, _ = raster_tiles.raster_gbuffer(
            setup, shade_rows, H, W, config
        )
        return ibuf_tiles  # (R, 128) i32 slot ids, -1 = uncovered

    sub = config.tile_h * config.tile_w // 128
    for i in (0, 5, 10, 15, 19):
        ibuf = np.asarray(probe(bufs, frame_params(i)))
        covered = ibuf >= 0
        tri = np.where(covered, ibuf % t_cap, 0)
        mat = tri_mat[tri]
        const_px = covered & const_mat[mat]
        n_cov = covered.sum()
        rows_elidable = (covered & const_mat[mat]).all(axis=1)
        # tile-material-uniform: all covered pixels in the 64x64 tile share
        # one material id.
        tiles = mat.reshape(-1, sub * 128)
        tcov = covered.reshape(-1, sub * 128)
        m0 = np.where(tcov, tiles, -1).max(axis=1)
        uniform = ((tiles == m0[:, None]) | ~tcov).all(axis=1) & (m0 >= 0)
        n_tiles = tiles.shape[0]
        print(
            f"frame {i:2d}: covered {100 * n_cov / covered.size:.1f}% | "
            f"const-mat px {100 * const_px.sum() / max(n_cov, 1):.1f}% of covered | "
            f"elidable rows {100 * rows_elidable.mean():.1f}% | "
            f"mat-uniform tiles {100 * uniform.mean():.1f}% of {n_tiles}",
            flush=True,
        )


if __name__ == "__main__":
    main()
