"""Smoke + identity check for the window-LUT sun-frustum y-skip (round 4).

Renders bench-scale frames (1920x1080, 4000^2 map) with sun_frustum_cull
on (banded LUT build, skipped steps hold garbage) vs off (full build) and
asserts the u8 frames are IDENTICAL — i.e. no consumed pixel ever gathers
a skipped LUT row. Also prints the banded fraction of LUT steps actually
built per viewpoint.

Run on TPU: python tools/probe_lut_yskip.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import sponza_like_scene
from arctic_tpu.models import pipeline


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
        point_lights=PointLights.from_list(
            [
                ((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0)),
            ]
        ),
    )
    settings = dataclasses.replace(default_settings(), tm_method=jnp.int32(2))

    def view(i):
        return dataclasses.replace(
            params,
            camera=dataclasses.replace(
                params.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )

    views = [view(i) for i in (0, 40, 80)]
    config = pipeline.autotune_pair_caps(
        buffers=bufs, params=views, config=config, margin=1.4
    )
    config = dataclasses.replace(config, static_point_lights=4)
    # 3-way isolation: cull+skip vs cull-only vs no-cull. cull-only != off
    # pins a raster-rect bug (e.g. WRAP reads of culled edge tiles);
    # cull+skip != cull-only pins the LUT y-skip.
    cfg_on = dataclasses.replace(config, sun_frustum_cull=True, lut_y_skip=True)
    cfg_cull = dataclasses.replace(
        config, sun_frustum_cull=True, lut_y_skip=False
    )
    cfg_off = dataclasses.replace(config, sun_frustum_cull=False)
    renderers = [
        ("cull+skip", pipeline.make_renderer_stats(cfg_on)),
        ("cull-only", pipeline.make_renderer_stats(cfg_cull)),
        ("no-cull", pipeline.make_renderer_stats(cfg_off)),
    ]

    fail = False
    for vi, p in zip((0, 40, 80), views):
        frames = {}
        for name, r in renderers:
            t0 = time.perf_counter()
            img, st = r(bufs, p, settings)
            frames[name] = np.asarray(img)
            pipeline.check_stats(st)
            print(f"view {vi:2d} {name}: {time.perf_counter()-t0:.2f}s", flush=True)
        # Report the built fraction of LUT steps for this view.
        wc = pipeline.world_corners(bufs.geometry)
        tv = jnp.arange(bufs.geometry.capacity) < bufs.geometry.num_tris
        rect, (y_lo, y_hi) = pipeline.sun_cull_rect(
            wc, tv, p.camera.proj_view(), p.sun.proj_view(), config,
            with_y_band=True,
        )
        y_lo, y_hi = int(y_lo), int(y_hi)
        built = sum(
            1 for st_ in range(88) if 48 * st_ <= y_hi and 48 * st_ + 48 > y_lo
        )
        print(
            f"view {vi:2d}: rect={[int(v) for v in rect]} built {built}/88 "
            f"LUT steps (y band [{y_lo}, {y_hi}])", flush=True,
        )
        for name in ("cull+skip", "cull-only"):
            a, b = frames[name], frames["no-cull"]
            if not np.array_equal(a, b):
                d = np.argwhere(a != b)
                print(
                    f"  DIFF {name} vs no-cull: {d.shape[0]} px, first {d[:5]}"
                    f" a={a[tuple(d[0])]} b={b[tuple(d[0])]}"
                )
                fail = True
    if fail:
        sys.exit(1)
    print("OK: cull and y-skip are pixel-invisible at bench scale")


if __name__ == "__main__":
    main()
