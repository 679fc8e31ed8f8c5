"""Tiled rasterizer must agree exactly with the brute-force rasterizer."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import cornell_like_scene
from arctic_tpu.models import pipeline
from arctic_tpu.ops import binning, raster, raster_tiles
from tests.test_raster import make_setup


def _assert_buffers_equal(setup, H, W, config, atol_z=2e-6):
    # ibuf must match exactly (same visibility decisions); z may differ by
    # fma-vs-matmul rounding between the two implementations.
    zb, ib = raster.rasterize_bruteforce(setup, H, W)
    zt, it = raster_tiles.rasterize_tiled(setup, H, W, config)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(it))
    np.testing.assert_allclose(np.asarray(zb), np.asarray(zt), atol=atol_z)


def test_tiled_matches_bruteforce_random_tris(rng):
    W, H = 96, 64
    config = RenderConfig(width=W, height=H)
    n = 40
    tris = rng.uniform(-1.2, 1.2, (n, 3, 3)).astype(np.float32)
    tris[..., 2] = rng.uniform(0.05, 0.95, (n, 3))
    setup, _ = make_setup(tris, W, H, cull="none")
    _assert_buffers_equal(setup, H, W, config)


def test_tiled_matches_bruteforce_scene():
    W, H = 160, 96
    config = RenderConfig(width=W, height=H)
    meshes, objects, materials, env = cornell_like_scene()
    bufs = build_buffers(meshes, objects, materials, env, tri_bucket=256)
    params = default_scene_params(aspect=W / H)
    cam = dataclasses.replace(
        params.camera, eye=jnp.asarray([0.0, 4.0, 3.0]), rotation=jnp.asarray([-25.0, -90.0])
    )
    geom = bufs.geometry
    world = pipeline.vertex_world_positions(geom)
    clip = pipeline.to_clip(world, cam.proj_view())
    tri_valid = jnp.arange(geom.capacity) < geom.num_tris
    clipped = raster.near_clip_triangles(clip, geom.indices, tri_valid)
    setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
    _assert_buffers_equal(setup, H, W, config)


def test_binning_covers_exact_tiles():
    W, H = 128, 64  # 4x2 tiles of 32x32
    config = RenderConfig(width=W, height=H)
    # Small triangle strictly inside tile (1, 1).
    tris = np.array([[[-0.45, -0.45, 0.5], [-0.3, -0.45, 0.5], [-0.38, -0.3, 0.5]]])
    # NDC x in [-0.45,-0.3] -> px in [35.2, 44.8] (tile x=1); y -> tile 1.
    setup, _ = make_setup(tris, W, H, cull="none")
    pairs = binning.bin_triangles(setup, 4, 2, 32, 32, config.pair_capacity(setup.capacity))
    starts = np.asarray(pairs.tile_start)
    occupancy = np.diff(starts)
    assert int(pairs.total_pairs) == 1
    want = np.zeros(8, np.int64)
    want[1 * 4 + 1] = 1
    np.testing.assert_array_equal(occupancy, want)


def test_binning_overflow_drops_tail_only(rng):
    W, H = 64, 64
    # Absurdly small pair budget: the rasterizer must still work for the
    # pairs that fit (first slots) and never crash.
    config = dataclasses.replace(
        RenderConfig(width=W, height=H), pairs_per_tri=1, pair_reserve=0
    )
    n = 30
    tris = rng.uniform(-1.0, 1.0, (n, 3, 3)).astype(np.float32)
    tris[..., 2] = 0.5
    setup, _ = make_setup(tris, W, H, cull="none")
    zt, it = raster_tiles.rasterize_tiled(setup, H, W, config)
    assert np.isfinite(np.asarray(zt)).all()


def test_binning_rld_matches_numpy_reference(rng=None):
    """Two-level RLD expansion == per-pair numpy expansion, stable order."""
    rng = np.random.default_rng(7)
    for T, tiles_x, tiles_y in [(512, 4, 2), (384, 7, 5), (130, 3, 3)]:
        class S:
            pass

        s = S()
        x0 = rng.uniform(0, 200, T).astype(np.float32)
        y0 = rng.uniform(0, 120, T).astype(np.float32)
        w = rng.uniform(0, 90, T).astype(np.float32)
        h = rng.uniform(0, 70, T).astype(np.float32)
        s.bbox = (
            jnp.asarray(x0), jnp.asarray(y0),
            jnp.asarray(x0 + w), jnp.asarray(y0 + h),
        )
        s.valid = jnp.asarray(rng.random(T) < 0.6)
        s.capacity = T
        pairs = binning.bin_triangles(s, tiles_x, tiles_y, 32, 32, 8192)

        counts, tx0, ty0, ww = binning._tile_footprints(s, tiles_x, tiles_y, 32, 32)
        counts = np.asarray(counts)
        tx0n, ty0n, wn = np.asarray(tx0), np.asarray(ty0), np.asarray(ww)
        ref = []
        for i in range(T):
            for k in range(counts[i]):
                tile = (ty0n[i] + k // wn[i]) * tiles_x + (tx0n[i] + k % wn[i])
                ref.append((tile, i))
        ref.sort(key=lambda p: p[0])  # python sort is stable
        n = len(ref)
        assert int(pairs.total_pairs) == n
        np.testing.assert_array_equal(
            np.asarray(pairs.sorted_slot)[:n], np.array([p[1] for p in ref])
        )
        tiles_ref = np.array([p[0] for p in ref])
        starts = np.asarray(pairs.tile_start)
        for t in range(tiles_x * tiles_y + 1):
            assert starts[t] == np.searchsorted(tiles_ref, t, "left")
