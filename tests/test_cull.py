"""Sun-frustum shadow culling (ops/cull.py) must be invisible in pixels.

Two pins:
1. Containment property: every point inside (camera frustum ∩ scene AABB)
   projects — in shadow-map pixel coords — inside shadow_cull_rect's rect
   (up to the PCF margin the rect already includes).
2. Frame bit-identity: sun_frustum_cull on vs off renders the SAME u8
   frame, on a camera where the rect really culls pairs (asserted via
   binning counts so the test can't silently stop exercising the cull).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import cull

W, H, SHADOW = 160, 120, 256


def _params(eye, rot):
    p = default_scene_params(aspect=W / H)
    return dataclasses.replace(
        p,
        camera=dataclasses.replace(
            p.camera, eye=jnp.asarray(eye), rotation=jnp.asarray(rot)
        ),
        point_lights=PointLights.from_list(
            [((0.0, 1.0, 0.0), (10.0, 0.0, 0.0))]
        ),
    )


@pytest.mark.parametrize(
    "eye,rot",
    [
        ([0.0, 4.0, 3.0], [-25.0, -90.0]),
        ([6.0, 2.0, 6.0], [-10.0, 140.0]),
        ([0.0, 1.0, 0.0], [60.0, 0.0]),  # looking up: grazes the AABB
    ],
)
def test_rect_contains_frustum_aabb_points(eye, rot):
    p = _params(eye, rot)
    cam_pv = np.asarray(p.camera.proj_view())
    sun_pv = np.asarray(p.sun.proj_view())
    lo = np.asarray([-8.0, 0.0, -9.0], np.float32)
    hi = np.asarray([8.0, 6.0, 9.0], np.float32)

    rng = np.random.default_rng(42)
    pts = rng.uniform(lo, hi, size=(100000, 3)).astype(np.float32)
    h = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    c = h @ cam_pv.T
    inside = (
        (np.abs(c[:, 0]) <= c[:, 3])
        & (np.abs(c[:, 1]) <= c[:, 3])
        & (c[:, 2] >= 0)
        & (c[:, 2] <= c[:, 3])
    )
    pin = pts[inside]
    tile = 64
    tx0, ty0, tx1, ty1 = (
        int(v)
        for v in cull.shadow_cull_rect(
            jnp.asarray(cam_pv), jnp.asarray(sun_pv), jnp.asarray(lo),
            jnp.asarray(hi), SHADOW, tile, tile,
        )
    )
    if len(pin) == 0:
        return  # nothing visible: any rect (even empty) is fine
    lc = np.concatenate([pin, np.ones((len(pin), 1), np.float32)], 1) @ sun_pv.T
    px = (lc[:, 0] * 0.5 + 0.5) * SHADOW
    py = (1.0 - (lc[:, 1] * 0.5 + 0.5)) * SHADOW
    onmap = (px >= 0) & (px < SHADOW) & (py >= 0) & (py < SHADOW)
    if not onmap.any():
        return
    pxm, pym = px[onmap], py[onmap]
    assert (pxm / tile >= tx0 - 0.01).all() and (pxm / tile <= tx1 + 1.01).all()
    assert (pym / tile >= ty0 - 0.01).all() and (pym / tile <= ty1 + 1.01).all()


def test_cull_frame_bit_identical():
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    # Camera close in and looking down at one corner: the frustum∩AABB
    # light-space footprint is a fraction of the map. 16-px shadow tiles so
    # the small scene spans enough tiles for the rect to bite.
    p = _params([1.0, 0.5, 1.0], [-30.0, -120.0])
    s = default_settings()

    base = RenderConfig(
        width=W, height=H, shadow_size=SHADOW, shadow_tile=16, fused_shade=True
    )
    cfg_on = dataclasses.replace(base, sun_frustum_cull=True)
    cfg_off = dataclasses.replace(base, sun_frustum_cull=False)

    # The cull must actually fire on this camera (fewer pairs than uncull).
    _, sh_off = pipeline.measure_pair_counts(bufs, p, cfg_off)
    _, sh_on = pipeline.measure_pair_counts(bufs, p, cfg_on)
    assert sh_on < sh_off, (sh_on, sh_off)

    img_on, st_on = pipeline.render_frame_stats(bufs, p, s, cfg_on)
    img_off, st_off = pipeline.render_frame_stats(bufs, p, s, cfg_off)
    pipeline.check_stats(st_on)
    np.testing.assert_array_equal(np.asarray(img_on), np.asarray(img_off))


def test_cull_empty_rect_sky_only():
    """Camera pointing straight up past all geometry: the intersection may
    be empty or tiny; the frame (sky + maybe nothing) must still match."""
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    p = _params([0.0, 30.0, 0.0], [89.0, 0.0])
    s = default_settings()
    base = RenderConfig(
        width=W, height=H, shadow_size=SHADOW, shadow_tile=16, fused_shade=True
    )
    img_on, _ = pipeline.render_frame_stats(
        bufs, p, s, dataclasses.replace(base, sun_frustum_cull=True)
    )
    img_off, _ = pipeline.render_frame_stats(
        bufs, p, s, dataclasses.replace(base, sun_frustum_cull=False)
    )
    np.testing.assert_array_equal(np.asarray(img_on), np.asarray(img_off))
