"""Multi-chip (virtual 8-device CPU mesh) rendering must match single-chip."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.parallel import sharding


def test_sharded_tiled_raster_matches_single_chip():
    """The binned Pallas path (interpret mode on CPU) under shard_map."""
    W, H = 128, 64
    config = RenderConfig(width=W, height=H, shadow_size=64, force_bruteforce=False)
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    p = default_scene_params(aspect=W / H)
    p = dataclasses.replace(
        p,
        camera=dataclasses.replace(
            p.camera, eye=jnp.asarray([0.0, 4.0, 3.0]), rotation=jnp.asarray([-25.0, -90.0])
        ),
    )
    single = np.asarray(pipeline.render_frame(bufs, p, default_settings(), config))
    mesh = sharding.make_mesh(2)
    # check_vma=False: the pallas interpreter can't type mixed-vma internals
    # (jax 0.9); the assembled output is still verified against single-chip.
    multi = np.asarray(
        sharding.render_frame_sharded(
            bufs, p, default_settings(), config, mesh, check_vma=False
        )
    )
    diff = np.abs(multi.astype(int) - single.astype(int))
    assert (diff > 1).mean() < 1e-3


def test_sharded_matches_single_chip():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    W, H = 128, 96
    config = RenderConfig(width=W, height=H, shadow_size=128, force_bruteforce=True)
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    p = default_scene_params(aspect=W / H)
    p = dataclasses.replace(
        p,
        camera=dataclasses.replace(
            p.camera, eye=jnp.asarray([0.0, 4.0, 3.0]), rotation=jnp.asarray([-25.0, -90.0])
        ),
    )
    single = np.asarray(pipeline.render_frame(bufs, p, default_settings(), config))

    mesh = sharding.make_mesh(8)
    render = sharding.make_sharded_renderer(config, mesh)
    multi = np.asarray(render(bufs, p, default_settings()))
    assert multi.shape == single.shape
    # The sharded path replays identical math per slab; allow a tiny number
    # of boundary pixels to differ by 1 LSB from reassociated f32 ops.
    diff = (multi.astype(int) - single.astype(int))
    mismatch = (np.abs(diff) > 1).mean()
    assert mismatch < 1e-3, f"sharded render diverged: {mismatch:.4%} pixels"
