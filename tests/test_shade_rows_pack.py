"""pack_shade_rows (the in-kernel shade-row table build) vs the stacked
XLA build it replaced (pipeline.build_shade_rows' fallback path for
hand-built Geometry).

The raster-plane lanes must be BIT-identical (they guard the tiled ==
bruteforce ibuf exactness gate); the blended corner-attribute lanes use
the same expressions in the same order but may differ by ~1 ulp on valid
slots where the compiler contracts FMAs differently (invalid slots can
hold junk where degenerate clip weights no longer cancel — they are never
binned). The rendered frame must not move visibly.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import raster

W, H = 96, 64


def _setup(tri_bucket=256):
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=tri_bucket)
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera,
            eye=jnp.asarray([0.0, 3.0, 1.0]),
            rotation=jnp.asarray([-15.0, -90.0]),
        ),
    )
    geom = bufs.geometry
    sun_pv = params.sun.proj_view()
    wc = pipeline.world_corners(geom)
    sun_clip = pipeline.corners_clip(wc, sun_pv)
    tri_valid = jnp.arange(geom.capacity) < geom.num_tris
    clipped = raster.near_clip_corners(
        pipeline.corners_clip(wc, params.camera.proj_view()), tri_valid
    )
    setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
    lsp = tuple(c[:3] for c in sun_clip)
    return bufs, params, geom, setup, sun_pv, wc, lsp


@pytest.mark.parametrize("tri_bucket", [384, 512])
def test_pack_shade_rows_matches_stacked_build(tri_bucket):
    # tri_bucket=512 -> capacity % 512 == 0 -> the TRI-major kernel variant
    # (pack_shade_rows_tm, modular block dup); 384 -> capacity 384 or 768,
    # never a 512-multiple -> the 48-row form.
    bufs, params, geom, setup, sun_pv, wc, lsp = _setup(tri_bucket)
    assert (geom.capacity % 512 == 0) == (tri_bucket == 512)
    assert geom.slot_static_rows is not None  # build_buffers fills it
    new = np.asarray(
        pipeline.build_shade_rows(setup, geom, sun_pv, wc=wc, lsp=lsp)
    )
    geom_old = dataclasses.replace(geom, slot_static_rows=None)
    old = np.asarray(
        pipeline.build_shade_rows(setup, geom_old, sun_pv, wc=wc, lsp=lsp)
    )
    assert new.shape == old.shape and new.shape[1] == 128

    # Raster-plane lanes: ebw/sid [0:16) and raw planes [112:128) bit-exact
    # on every row (including padding: sid -2 at lane 9 / 0 at lane 124).
    np.testing.assert_array_equal(new[:, 0:16], old[:, 0:16])
    np.testing.assert_array_equal(new[:, 112:128], old[:, 112:128])

    # Corner-attribute / material lanes: tight on valid slots.
    p = setup.capacity
    valid = np.zeros(new.shape[0], bool)
    valid[:p] = np.asarray(setup.valid)
    assert valid.sum() > 50  # the aimed camera must actually see the scene
    d = np.abs(new[valid] - old[valid])
    rel = d / np.maximum(np.abs(old[valid]), 1e-6)
    assert rel.max() < 1e-5, (d.max(), rel.max())

    # Material lanes are pure copies of static data -> bit-exact everywhere.
    np.testing.assert_array_equal(new[:, 88:112], old[:, 88:112])


def test_pack_shade_rows_frame_unchanged():
    bufs, params, geom, setup, sun_pv, wc, lsp = _setup()
    config = RenderConfig(width=W, height=H, shadow_size=64)
    render = pipeline.make_renderer_stats(config)
    img_new, _ = render(bufs, params, default_settings())
    bufs_old = dataclasses.replace(
        bufs, geometry=dataclasses.replace(geom, slot_static_rows=None)
    )
    img_old, _ = render(bufs_old, params, default_settings())
    d = np.abs(
        np.asarray(img_new, np.int32) - np.asarray(img_old, np.int32)
    )
    assert d.max() <= 1, d.max()
