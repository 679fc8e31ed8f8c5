"""End-to-end frame rendering tests on the CPU backend (brute-force raster).

Physical sanity checks on a small procedural scene: sky composites where no
geometry is, shadows darken, point lights add light, tonemap/gamma behave.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import (
    PointLights,
    default_scene_params,
    default_settings,
)
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline

W, H = 128, 96
CONFIG = RenderConfig(width=W, height=H, shadow_size=128, force_bruteforce=True)


@pytest.fixture(scope="module")
def buffers():
    meshes, objects, materials, env = cornell_like_scene()
    return build_buffers(meshes, objects, materials, env, tri_bucket=256)


@pytest.fixture(scope="module")
def scene_params():
    p = default_scene_params(aspect=W / H)
    cam = dataclasses.replace(
        p.camera,
        eye=jnp.asarray([0.0, 4.0, 3.0]),
        rotation=jnp.asarray([-25.0, -90.0]),  # look toward -Z, pitched down
    )
    return dataclasses.replace(p, camera=cam)


@pytest.fixture(scope="module")
def frame(buffers, scene_params):
    render = pipeline.make_renderer(CONFIG)
    img = np.asarray(render(buffers, scene_params, default_settings()))
    return img


def test_frame_shape_and_range(frame):
    assert frame.shape == (H, W, 3)
    assert frame.dtype == np.uint8
    assert frame.max() > 40, "image should not be black"
    assert len(np.unique(frame.reshape(-1, 3), axis=0)) > 50, "image should have detail"


def test_sky_on_top_geometry_below(frame, buffers, scene_params):
    # Recompute the visibility buffer to separate sky from geometry.
    geom = buffers.geometry
    world = pipeline.vertex_world_positions(geom)
    setup, _, ibuf, _, _ = pipeline.main_pass(world, geom, scene_params.camera.proj_view(), CONFIG)
    covered = np.asarray(ibuf) >= 0
    assert not covered[0].any(), "top row should be sky (camera pitched down over a 20m floor)"
    assert covered[-1].all(), "bottom row should be floor"
    assert 0.2 < covered.mean() < 0.98


def test_shadowing_darkens_ground(buffers, scene_params):
    """The box must cast a visible shadow: render with the sun only and
    compare ground luminance with the sun rotated to graze vs overhead."""
    render = pipeline.make_renderer(CONFIG)
    no_pl = dataclasses.replace(
        scene_params, point_lights=PointLights.from_list([]), ambient=jnp.float32(0.0)
    )
    img = np.asarray(render(buffers, no_pl, default_settings())).astype(np.float32)
    # Scene has sun from default direction; box at (-2.5,1.5,-6) close to a
    # bright floor. There must be both dark (shadowed) and bright floor pixels.
    bottom = img[H // 2 :, :, :].mean(axis=-1)
    assert bottom.max() > 3 * max(bottom.min(), 1.0) or bottom.min() < 10


def test_point_light_adds_light(buffers, scene_params):
    render = pipeline.make_renderer(CONFIG)
    dark = dataclasses.replace(
        scene_params,
        ambient=jnp.float32(0.0),
        sun=dataclasses.replace(scene_params.sun, color=jnp.zeros(3)),
        point_lights=PointLights.from_list([]),
    )
    img0 = np.asarray(render(buffers, dark, default_settings())).astype(np.float32)
    lit = dataclasses.replace(
        dark,
        point_lights=PointLights.from_list([((0.0, 2.0, -5.0), (40.0, 40.0, 40.0))]),
    )
    img1 = np.asarray(render(buffers, lit, default_settings())).astype(np.float32)
    # Sky untouched, geometry brighter somewhere.
    assert (img1 - img0).max() > 20


def test_light_count_masks_inactive_rows(buffers, scene_params):
    render = pipeline.make_renderer(CONFIG)
    one = PointLights.from_list([((0.0, 2.0, -5.0), (40.0, 40.0, 40.0))])
    # Same light but with garbage in inactive rows — must not change output.
    poisoned = PointLights(
        position=one.position.at[5].set(jnp.asarray([0.0, 2.0, -5.0])),
        color=one.color.at[5].set(jnp.asarray([999.0, 999.0, 999.0])),
        count=one.count,
    )
    a = np.asarray(render(buffers, dataclasses.replace(scene_params, point_lights=one), default_settings()))
    b = np.asarray(render(buffers, dataclasses.replace(scene_params, point_lights=poisoned), default_settings()))
    np.testing.assert_array_equal(a, b)


def test_tonemap_methods_differ_and_gamma_brightens(buffers, scene_params, frame):
    render = pipeline.make_renderer(CONFIG)
    s = default_settings()
    aces = np.asarray(render(buffers, scene_params, dataclasses.replace(s, tm_method=jnp.int32(2))))
    assert (aces != frame).any()
    hi_gamma = np.asarray(
        render(buffers, scene_params, dataclasses.replace(s, gamma=jnp.float32(3.0)))
    )
    # Higher gamma -> brighter midtones (pow 1/gamma).
    assert hi_gamma.astype(int).mean() > frame.astype(int).mean()
