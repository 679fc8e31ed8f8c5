"""Sweep select_chunk with the range-skip select kernel (TPU, per-HLO).

The chunk size is the skip granularity: smaller chunks mean more
(skippable) dots but more DMA steps and scalar overhead. Reports the
select pallas_call's device time per chunk setting from a profiler trace
(full-frame wall is too noisy at ~1 ms effect size).
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from probe_select_banks import _sync, trace_ms


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import (
        PointLights, default_scene_params, default_settings,
    )
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    W, H, S = 1920, 1080, 4000
    config = RenderConfig(width=W, height=H, shadow_size=S)
    print(f"backend={jax.default_backend()}", flush=True)

    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    base = default_scene_params(aspect=W / H)

    def frame_params(i):
        return dataclasses.replace(
            base,
            camera=dataclasses.replace(
                base.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
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
    config = pipeline.autotune_pair_caps(
        bufs, [frame_params(0), frame_params(10), frame_params(19)], config,
        margin=1.4,
    )
    config = dataclasses.replace(config, static_point_lights=4)
    print(f"pair caps: cam={config.pair_cap_cam} shadow={config.pair_cap_shadow}",
          flush=True)

    chunks = [int(c) for c in (sys.argv[1:] or ["32", "64", "128"])]
    for c in chunks:
        cfg = dataclasses.replace(config, select_chunk=c)
        render = pipeline.make_renderer_stats(cfg)
        out = render(bufs, frame_params(10), settings)
        _sync(out)
        print(f"select_chunk={c}: compiled", flush=True)
        trace_ms(render, bufs, frame_params, settings, f"chunk{c}")


if __name__ == "__main__":
    main()
