"""Full-frame wall time for pipeline variants on the bench scene (TPU).

Sweeps the materialization fences, select-kernel chunk, and tiles-per-step
— one full compile each, so run in the background (~30 min).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    W, H = 1920, 1080
    base = RenderConfig(width=W, height=H, shadow_size=4000)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    params0 = default_scene_params(aspect=W / H)

    def frame_params(i):
        return dataclasses.replace(
            params0,
            camera=dataclasses.replace(
                params0.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
            point_lights=PointLights.from_list(
                [((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                 ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                 ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                 ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0))]
            ),
        )

    settings = dataclasses.replace(default_settings(), tm_method=jnp.int32(2))
    base = pipeline.autotune_pair_caps(
        bufs, [frame_params(0), frame_params(10), frame_params(19)], base, margin=1.4
    )
    base = dataclasses.replace(base, static_point_lights=4)

    def run(name, config, fence_rows=True, fence_gbuf=True):
        pipeline.FENCE_SHADE_ROWS = fence_rows
        pipeline.FENCE_GBUF = fence_gbuf
        render = pipeline.make_renderer_stats(config)
        out = render(bufs, frame_params(0), settings)
        _sync(out)
        n = 8
        t0 = time.perf_counter()
        for i in range(n):
            out = render(bufs, frame_params(i + 1), settings)
        _sync(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:8.2f} ms ({1/dt:.2f} fps)", flush=True)
        pipeline.FENCE_SHADE_ROWS = True
        pipeline.FENCE_GBUF = True

    run("base", base)
    run("nofence_rows", base, fence_rows=False)
    run("nofence_gbuf", base, fence_gbuf=False)
    run("select_chunk64", dataclasses.replace(base, select_chunk=64))
    run("tps8", dataclasses.replace(base, tiles_per_step=8))
    run("tps8+chunk64", dataclasses.replace(base, tiles_per_step=8, select_chunk=64))


if __name__ == "__main__":
    main()
