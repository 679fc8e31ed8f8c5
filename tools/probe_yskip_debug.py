"""Debug: which consumed pixels' PCF window start_y falls outside the
sun-frustum cull rect's y band? (probe_lut_yskip found a diff at view 0.)

Run on TPU: python tools/probe_yskip_debug.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import sponza_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import raster, raster_tiles


def main() -> None:
    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        sun=dataclasses.replace(
            params.sun, position=jnp.asarray([0.0, 24.0, 0.0]),
            rotation=jnp.asarray([-65.0, 30.0]),
        ),
    )
    p = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera,
            eye=jnp.asarray([-14.0, 4.5, 0.0]),
            rotation=jnp.asarray([-8.0, 0.0]),
        ),
    )
    config = pipeline.autotune_pair_caps(
        buffers=bufs, params=[p], config=config, margin=1.4
    )

    geom = bufs.geometry
    s = config.shadow_size

    @jax.jit
    def dbg(params):
        cam_pv = params.camera.proj_view()
        sun_pv = params.sun.proj_view()
        wc = pipeline.world_corners(geom)
        sun_clip = pipeline.corners_clip(wc, sun_pv)
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        rect = pipeline.sun_cull_rect(wc, tri_valid, cam_pv, sun_pv, config)
        clipped = raster.near_clip_corners(
            pipeline.corners_clip(wc, cam_pv), tri_valid
        )
        setup = raster.setup_screen_triangles(
            clipped, config.width, config.height, cull="back"
        )
        shade_rows = pipeline.build_shade_rows(
            setup, geom, sun_pv, wc=wc, lsp=tuple(c[:3] for c in sun_clip)
        )
        ibuf_tiles, gbuf, _ = raster_tiles.raster_gbuffer(
            setup, shade_rows, config.height, config.width, config
        )
        covered = ibuf_tiles >= 0
        x, y, z = gbuf[14], gbuf[15], gbuf[16]
        u = x * 0.5 + 0.5
        v = 1.0 - (y * 0.5 + 0.5)
        outside = (z > 1.0) | (u < 0.0) | (v < 0.0) | (u > 1.0) | (v > 1.0)
        ty = v * s - 0.5
        wy = jnp.floor(ty).astype(jnp.int32) - 1
        start_y = jnp.clip(wy + 2, 0, s)
        care = covered & ~outside
        big = jnp.int32(10 * s)
        sy_care = jnp.where(care, start_y, big)
        return (
            jnp.stack(rect),
            jnp.min(sy_care),
            jnp.max(jnp.where(care, start_y, -big)),
            jnp.sum(care & (start_y < 384)),
            jnp.sum(care),
            jnp.sum(covered),
            jnp.sum(covered & outside),
            jnp.min(jnp.where(covered & outside, start_y, big)),
        )

    rect, sy_min, sy_max, n_below, n_care, n_cov, n_out, sy_out_min = [
        np.asarray(r) for r in dbg(p)
    ]
    sth = config.shadow_tile_h or config.shadow_tile
    print(f"rect tiles (tx0,ty0,tx1,ty1) = {rect}, tile {config.shadow_tile}x{sth}")
    print(f"band from rect: y in [{int(rect[1])*sth-4}, {(int(rect[3])+1)*sth+4}]")
    print(f"care start_y range: [{sy_min}, {sy_max}]  (s={s})")
    print(f"care pixels with start_y < 384: {n_below} of {n_care} care / {n_cov} covered")
    print(f"covered&outside: {n_out}, their min start_y {sy_out_min}")


if __name__ == "__main__":
    main()
