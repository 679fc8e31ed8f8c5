"""Benchmark: Sponza-class scene, 1920x1080, full pipeline on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 60 FPS on TPU v5e-1 for a ~0.26M-triangle
Sponza-scale scene at 1080p with directional shadow (4000^2 map + 25-tap
PCF), 4 point lights, ACES tonemap + gamma — reference configs[2].

The Khronos Sponza asset is not shipped in the reference repo, so the scene
is the procedural Sponza-class colonnade from arctic_tpu.io.procedural
(same triangle count / material mix / occlusion structure). Pass a glTF/OBJ
path as argv[1] to bench a real asset instead.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)

    if len(sys.argv) > 1:
        from arctic_tpu.io.load import load_scene_file

        meshes, objects, materials, env = load_scene_file(sys.argv[1])
    else:
        meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    n_tris = int(bufs.geometry.num_tris)

    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera,
            eye=jnp.asarray([-14.0, 4.5, 0.0]),
            rotation=jnp.asarray([-8.0, 0.0]),  # down the hall (+X)
        ),
        sun=dataclasses.replace(params.sun, position=jnp.asarray([0.0, 24.0, 0.0]), rotation=jnp.asarray([-65.0, 30.0])),
        point_lights=PointLights.from_list(
            [
                ((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0)),
            ]
        ),
    )
    settings = dataclasses.replace(
        default_settings(), tm_method=jnp.int32(2)  # ACES (configs[2])
    )

    render = pipeline.make_renderer(config)
    img = render(bufs, params, settings)
    img.block_until_ready()  # compile + first frame

    # Fly the camera down the hall: every timed frame has distinct inputs
    # (no backend-side result reuse possible; matches real usage).
    def frame_params(i):
        return dataclasses.replace(
            params,
            camera=dataclasses.replace(
                params.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )

    n_frames = 20
    frames = [frame_params(i) for i in range(n_frames)]
    render(bufs, frames[0], settings).block_until_ready()
    t0 = time.perf_counter()
    for p in frames:
        img = render(bufs, p, settings)
    np.asarray(img[:1, :1])  # hard device->host sync (block_until_ready can
    # acknowledge early through the remote-TPU tunnel)
    dt = (time.perf_counter() - t0) / n_frames
    fps = 1.0 / dt

    # Side artifact for eyeballing (not part of the metric).
    try:
        from PIL import Image

        Image.fromarray(np.asarray(img)).save("bench_frame.png")
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"sponza_class_{n_tris // 1000}ktri_1080p_fps_{jax.default_backend()}",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 60.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
