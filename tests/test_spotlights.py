"""Opt-in spotlights (config.spotlights; reference README.md roadmap item,
unticked there — our semantics, see core/scene.py PointLights docstring).

Pins:
  1. All-point banks under spotlights=True render EXACTLY like
     spotlights=False (the cone factor clamps to 1.0, an exact f32 multiply).
  2. Fused (channel-first) and deferred implementations agree <=1 LSB.
  3. The cone actually cuts light: fragments outside the outer cone get no
     point-light contribution; a cone aimed at the scene matches the f64
     oracle's spotlight term (>= 40 dB, same bar as the parity goldens).
  4. State JSON round-trips the raw cone packing exactly.
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

# A bright spot above the cornell boxes aimed straight down, wide enough to
# light the floor patch under it; and the parity red point light.
SPOT = ((0.0, 6.0, -5.0), (120.0, 120.0, 120.0), ((0.0, -1.0, 0.0), 20.0, 35.0))
POINT = ((0.0, 1.0, 0.0), (10.0, 0.0, 0.0))


def _params(lights, spots=False):
    p = default_scene_params(aspect=W / H)
    return dataclasses.replace(
        p,
        camera=dataclasses.replace(
            p.camera,
            eye=jnp.asarray([0.0, 4.0, 3.0]),
            rotation=jnp.asarray([-25.0, -90.0]),
        ),
        point_lights=PointLights.from_list(list(lights), spots=spots),
    )


def _render(bufs, p, cfg_kw):
    s = default_settings()
    img, stats = pipeline.render_frame_stats(
        bufs, p, s, RenderConfig(width=W, height=H, shadow_size=SHADOW, **cfg_kw)
    )
    pipeline.check_stats(stats)
    return np.asarray(img)


def test_point_rows_exact_under_spotlights_flag():
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    img_off = _render(bufs, _params([POINT]), dict(fused_shade=True))
    img_on = _render(
        bufs, _params([POINT], spots=True), dict(fused_shade=True, spotlights=True)
    )
    assert np.array_equal(img_off, img_on), "point rows must clamp to factor 1.0"


def test_spotlight_paths_agree_and_cone_cuts():
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    p = _params([POINT, SPOT], spots=True)

    fused = _render(bufs, p, dict(fused_shade=True, spotlights=True))
    deferred = _render(
        bufs, p, dict(force_bruteforce=True, spotlights=True)
    )
    diff = np.abs(fused.astype(int) - deferred.astype(int))
    assert diff.max() <= 1, f"fused vs deferred spotlights differ {diff.max()}"

    # The cone is real: vs the same bank with the spot's cone removed (same
    # position/color as a plain point light), some pixels must darken and
    # none may brighten beyond rounding.
    p_point = _params([POINT, SPOT[:2]], spots=True)
    full = _render(bufs, p_point, dict(fused_shade=True, spotlights=True))
    darkened = (full.astype(int) - fused.astype(int)) > 1
    assert darkened.mean() > 0.01, "cone cut nothing — spotlight is a no-op"
    assert (fused.astype(int) - full.astype(int)).max() <= 1


def test_spotlight_matches_f64_oracle():
    from arctic_tpu.models import golden

    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    p = _params([SPOT], spots=True)
    img = _render(bufs, p, dict(fused_shade=True, spotlights=True))

    cam = dict(
        eye=[0.0, 4.0, 3.0], rotation=[-25.0, -90.0], aspect=W / H,
        fov_y=45.0, z_near=0.1, z_far=1000.0,
    )
    sun = dict(
        position=[-10.0, 32.0, -2.48], rotation=[-70.0, 12.0],
        color=[8.0, 8.0, 8.0],
    )
    tris, mats = golden.golden_scene(meshes, objects, materials)
    ref = golden.render(
        tris, mats, env.astype(np.float64), cam, sun, [SPOT],
        ambient=0.1, settings=dict(tm_method=0, gamma=2.2, exposure=1.0),
        width=W, height=H, shadow_size=SHADOW,
    )
    mse = np.mean((img.astype(np.float64) - ref.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr >= 40.0, f"spotlight vs f64 oracle: {psnr:.2f} dB < 40"


def test_spotlight_state_roundtrip(tmp_path):
    from arctic_tpu.utils.serialize import load_state, save_state

    p = _params([POINT, SPOT], spots=True)
    s = default_settings()
    path = str(tmp_path / "state.json")
    save_state(path, p, s)
    p2, _ = load_state(path)
    assert p2.point_lights.spot_dir is not None
    np.testing.assert_array_equal(
        np.asarray(p.point_lights.spot_dir), np.asarray(p2.point_lights.spot_dir)
    )
    np.testing.assert_array_equal(
        np.asarray(p.point_lights.spot_cos), np.asarray(p2.point_lights.spot_cos)
    )
