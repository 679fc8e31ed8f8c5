"""Pair-capacity autotuning: tight caps must not change the rendered frame.

autotune_pair_caps sizes the (tile, triangle) pair buffers to the scene
(binning sort/align costs scale with capacity, not actual pairs). The tuned
config must (a) report caps >= the real pair counts with headroom, and
(b) render the exact same image as the worst-case-formula config.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline

W, H, SHADOW = 160, 120, 200


def _scene():
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, eye=jnp.asarray([0.0, 4.0, 3.0]), rotation=jnp.asarray([-25.0, -90.0])
        ),
        point_lights=PointLights.from_list(
            [((0.0, 1.0, 0.0), (10.0, 0.0, 0.0))]
        ),
    )
    return bufs, params


def test_static_point_lights_match_dynamic_loop():
    """Unrolled light loop (static_point_lights) == dynamic fori_loop."""
    bufs, params = _scene()
    settings = default_settings()
    config = RenderConfig(width=W, height=H, shadow_size=SHADOW)
    static = dataclasses.replace(
        config, static_point_lights=int(params.point_lights.count)
    )
    img_dyn = pipeline.make_renderer(config)(bufs, params, settings)
    img_static = pipeline.make_renderer(static)(bufs, params, settings)
    np.testing.assert_array_equal(np.asarray(img_dyn), np.asarray(img_static))


def test_autotuned_caps_match_default_render():
    bufs, params = _scene()
    settings = default_settings()
    config = RenderConfig(width=W, height=H, shadow_size=SHADOW)

    cam, sh = pipeline.measure_pair_counts(bufs, params, config)
    assert cam > 0 and sh > 0

    tuned = pipeline.autotune_pair_caps(bufs, params, config, bucket=1024)
    assert tuned.pair_cap_cam >= cam
    assert tuned.pair_cap_shadow >= sh
    # The tuned capacities actually bind (smaller than the formula default).
    assert tuned.pair_capacity(bufs.geometry.capacity * 2, "cam") <= config.pair_capacity(
        bufs.geometry.capacity * 2, "cam"
    )

    img_default, stats_d = pipeline.make_renderer_stats(config)(bufs, params, settings)
    img_tuned, stats_t = pipeline.make_renderer_stats(tuned)(bufs, params, settings)
    pipeline.check_stats(stats_t)
    # Measured counts match what the full render binned.
    assert int(stats_d["cam_pairs"]) == cam
    assert int(stats_d["shadow_pairs"]) == sh
    np.testing.assert_array_equal(np.asarray(img_default), np.asarray(img_tuned))
