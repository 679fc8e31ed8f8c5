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

    def run(name, config, fence_rows=True, fence_gbuf=True, retune=False):
        if retune:
            # Tile-shape variants change pair counts: reusing the base caps
            # could silently overflow (dropped pairs = fake speedups).
            config = dataclasses.replace(
                config, pair_cap_cam=None, pair_cap_shadow=None
            )
            config = pipeline.autotune_pair_caps(
                bufs, [frame_params(0), frame_params(10), frame_params(19)],
                config, margin=1.4,
            )
        pipeline.FENCE_SHADE_ROWS = fence_rows
        pipeline.FENCE_GBUF = fence_gbuf
        render = pipeline.make_renderer_stats(config)
        out, rstats = render(bufs, frame_params(0), settings)
        pipeline.check_stats(jax.device_get(rstats))
        out = (out, rstats)
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

    from arctic_tpu.ops import binning, shadow

    batch = sys.argv[1] if len(sys.argv) > 1 else "r3a"
    if batch == "r3a":
        # Round-3 sweep #1 (recorded): base 102.98, nofence_rows 102.32,
        # nofence_gbuf 100.69, select_chunk64 102.64, tps8 102.38,
        # tps8+chunk64 99.56 ms — defaults updated to tps8+chunk64.
        run("base", base)
        run("nofence_rows", base, fence_rows=False)
        run("nofence_gbuf", base, fence_gbuf=False)
        run("select_chunk64", dataclasses.replace(base, select_chunk=64))
        run("tps8", dataclasses.replace(base, tiles_per_step=8))
        run("tps8+chunk64", dataclasses.replace(base, tiles_per_step=8, select_chunk=64))
    elif batch == "r3c":
        # Tile-shape re-sweep post unroll-8 (per-pair fixed cost halved,
        # so round-2 optima may have shifted).
        run("base", base)
        run("cam_tile64", dataclasses.replace(base, tile_h=64, tile_w=64), retune=True)
        run("shadow_tile32", dataclasses.replace(base, shadow_tile=32), retune=True)
        run("shadow_tile128", dataclasses.replace(base, shadow_tile=128), retune=True)
        run("chunk256", dataclasses.replace(base, raster_chunk=256))
    elif batch == "r3d":
        # Around the cam-tile-64 optimum (r3c: base 100.46, cam64 93.17,
        # shadow_tile 32/128 and chunk256 all worse).
        t64 = dataclasses.replace(base, tile_h=64, tile_w=64)
        run("cam64", t64, retune=True)
        run("cam64_chunk128", dataclasses.replace(t64, select_chunk=128), retune=True)
        run("cam_32x64", dataclasses.replace(base, tile_h=32, tile_w=64), retune=True)
        run("cam_64x128", dataclasses.replace(base, tile_h=64, tile_w=128), retune=True)
        run("cam64_tps4", dataclasses.replace(t64, tiles_per_step=4), retune=True)
    elif batch == "r3e":
        # Quantized-LUT select-chain rewrite (one 24-way select to r16,
        # plane-select unpack): fence placement re-sweep.
        run("base_r16fence", base)
        for fence in ("rowfull", "none"):
            shadow.PCF_FENCE = fence
            run(f"pcf_fence_{fence}", base)
        shadow.PCF_FENCE = "r32"
    elif batch == "r3f":
        # Post resolve-kernel: copy.989 (1.6 ms) is the gbuf fence's
        # relayout; re-sweep fences at the new balance.
        run("base", base)
        run("nofence_gbuf", base, fence_gbuf=False)
        run("nofence_rows", base, fence_rows=False)
        run("nofence_both", base, fence_rows=False, fence_gbuf=False)
    elif batch == "r3k":
        # Post pixel-block layout + select range-skip + chunk 128: the gbuf
        # fence's relayout copy may have flipped sign, and the autotune
        # margin sets binning's capacity-scaled cost (overflow stays loud:
        # bench checks every frame).
        run("base", base)
        run("nofence_gbuf", base, fence_gbuf=False)
        m115 = dataclasses.replace(
            base, pair_cap_cam=None, pair_cap_shadow=None
        )
        m115 = pipeline.autotune_pair_caps(
            bufs, [frame_params(i) for i in range(20)], m115, margin=1.15
        )
        run("margin115", m115)
    elif batch == "r3l":
        # Non-square shadow tiles: shorter tiles halve the per-pair VPU
        # work (the kernel evaluates planes over the whole tile) at the
        # cost of more pairs from tall-in-light-space triangles.
        # Recorded: base 46.15, 32x64 47.66, 16x64 56.04, 32x128 48.15 ms
        # — every non-square shape loses; square 64 stays the default.
        run("base", base)
        run("shadow_32x64", dataclasses.replace(base, shadow_tile_h=32), retune=True)
        run("shadow_16x64", dataclasses.replace(base, shadow_tile_h=16), retune=True)
        run("shadow_32x128", dataclasses.replace(
            base, shadow_tile=128, shadow_tile_h=32), retune=True)
    elif batch == "r3b":
        # Recorded: base 100.57, nofence_gbuf 100.76, assoc_scan 104.01,
        # pcf_fence rowfull/block/none 102.5/102.4/103.4 — defaults kept.
        run("base", base)
        run("nofence_gbuf", base, fence_gbuf=False)
        binning.CUMMAX_ASSOC = True
        run("assoc_scan", base)
        binning.CUMMAX_ASSOC = False
        for fence in ("rowfull", "block", "none"):
            shadow.PCF_FENCE = fence
            run(f"pcf_fence_{fence}", base)
        shadow.PCF_FENCE = "r32"


if __name__ == "__main__":
    main()
