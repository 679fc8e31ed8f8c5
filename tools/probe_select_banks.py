"""A/B the select kernel's chunk x bank zero-dot skipping on hardware.

For SELECT_BANKS in (1, N): render the bench frame, assert the u8 frames
are BIT-IDENTICAL (skipped dots contribute only zeros), and report the
per-HLO time of the select pallas_call + whole-frame ops from a profiler
trace. Run on the TPU box: python tools/probe_select_banks.py [banks]
"""

import dataclasses
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def trace_ms(render, bufs, frame_params, settings, tag):
    logdir = f"/tmp/arctic_banks_trace_{tag}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(3):
        out = render(bufs, frame_params(10 + i), settings)
    _sync(out)
    jax.profiler.stop_trace()
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    per_op = defaultdict(float)
    frames = 3
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            args = ev.get("args") or {}
            if "device_duration_ps" not in args:
                continue
            per_op[ev["name"]] += int(args["device_duration_ps"]) / 1e9
    total = sum(per_op.values()) / frames
    sel = sum(
        v for k, v in per_op.items()
        if k.startswith("forward_visibility")
    ) / frames
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:8]
    print(f"[{tag}] ops total {total:.2f} ms/frame; forward_visibility pool "
          f"{sel:.2f} ms")
    for k, v in top:
        print(f"    {v/frames:7.3f}  {k[:70]}")
    return total, sel


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import (
        PointLights, default_scene_params, default_settings,
    )
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import raster_tiles

    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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

    frames = {}
    for banks in (1, nb):
        raster_tiles.SELECT_BANKS = banks
        render = pipeline.make_renderer_stats(config)
        out = render(bufs, frame_params(10), settings)
        _sync(out)
        print(f"banks={banks}: compiled", flush=True)
        frames[banks] = np.asarray(out[0] if isinstance(out, tuple) else out)
        trace_ms(render, bufs, frame_params, settings, f"banks{banks}")

    same = np.array_equal(frames[1], frames[nb])
    print(f"frames bit-identical (banks=1 vs {nb}): {same}")
    if not same:
        d = np.abs(
            frames[1].astype(np.int32) - frames[nb].astype(np.int32)
        )
        print(f"  MAX DIFF {d.max()} at {np.unravel_index(d.argmax(), d.shape)}; "
              f"{(d > 0).mean() * 100:.4f}% px differ")
        sys.exit(1)


if __name__ == "__main__":
    main()
