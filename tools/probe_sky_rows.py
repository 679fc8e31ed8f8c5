"""Measure fully-uncovered (sky) 128-px-row fraction on the bench fly-through.

The PCF window gather + tap-eval kernel run per PIXEL (2.09M rows/frame at
the ~2 ns/row issue floor) even though uncovered pixels' shadow is never
consumed (shade_gbuffer discards them at the final where(covered)). Skipping
is only free at 128-lane-row granularity (same argument as penumbra
classification, docs/ROADMAP.md r4 item 1) — but unlike the min/max pyramid
variant, COVERAGE classification costs nothing: the mask is already in
registers. This probe measures the ceiling:

  sky rows   : rows with zero covered lanes (their window gather + tap eval
               can be elided exactly)
  covered rows: rows with >= 1 covered lane (set the compaction capacity)

Run on the TPU: python tools/probe_sky_rows.py
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
from arctic_tpu.ops import raster, raster_tiles


def main() -> None:
    W, H = 1920, 1080
    config = RenderConfig(
        width=W, height=H, shadow_size=4000,
        pair_cap_cam=196608, pair_cap_shadow=262144, static_point_lights=4,
    )
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)
    base = dataclasses.replace(
        base,
        sun=dataclasses.replace(
            base.sun,
            position=jnp.asarray([0.0, 24.0, 0.0]),
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

    def frame_params(i):
        return dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )

    @jax.jit
    def row_counts(bufs, params):
        geom = bufs.geometry
        wc = pipeline.world_corners(geom)
        cam_pv = params.camera.proj_view()
        sun_pv = params.sun.proj_view()
        sun_clip = pipeline.corners_clip(wc, sun_pv)
        tri_valid = jnp.arange(geom.capacity) < geom.num_tris
        clipped = raster.near_clip_corners(
            pipeline.corners_clip(wc, cam_pv), tri_valid
        )
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        shade_rows = pipeline.build_shade_rows(
            setup, geom, sun_pv, wc=wc, lsp=tuple(c[:3] for c in sun_clip)
        )
        ibuf_tiles, _gbuf, _pairs = raster_tiles.raster_gbuffer(
            setup, shade_rows, H, W, config
        )
        covered = ibuf_tiles >= 0  # (R, 128), the shade/PCF row layout
        any_cov = jnp.any(covered, axis=1)
        all_cov = jnp.all(covered, axis=1)
        return (
            jnp.sum(any_cov.astype(jnp.int32)),
            jnp.sum(all_cov.astype(jnp.int32)),
            covered.shape[0],
            jnp.mean(covered.astype(jnp.float32)),
        )

    print(f"backend={jax.default_backend()}", flush=True)
    fr = []
    for i in range(20):
        anyc, allc, rows, pixfrac = jax.device_get(
            row_counts(bufs, frame_params(i))
        )
        fr.append((int(anyc), int(allc), int(rows), float(pixfrac)))
        print(
            f"frame {i:2d}: rows={rows} covered-rows={anyc} ({anyc/rows:.1%}) "
            f"sky-rows={rows-anyc} ({(rows-anyc)/rows:.1%}) "
            f"full-rows={allc} ({allc/rows:.1%}) px-covered={pixfrac:.1%}",
            flush=True,
        )
    anys = [a for a, _, _, _ in fr]
    rows = fr[0][2]
    print(
        f"\nsummary: covered-rows mean {np.mean(anys)/rows:.1%} "
        f"max {max(anys)/rows:.1%} min {min(anys)/rows:.1%}; "
        f"sky-row elidable mean {(rows-np.mean(anys))/rows:.1%}"
    )


if __name__ == "__main__":
    main()
