"""make_rt_renderer must be callable with (buffers, params, settings) —
regression test for a partial-binding arg collision."""

import numpy as np

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import raytrace


def test_make_rt_renderer_api():
    W, H = 48, 32
    config = RenderConfig(width=W, height=H, shadow_size=32)
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    bvh = raytrace.build_scene_bvh(bufs)
    render = raytrace.make_rt_renderer(config, bvh)
    img = np.asarray(render(bufs, default_scene_params(aspect=W / H), default_settings()))
    assert img.shape == (H, W, 3)
