"""Grouped-tile texture gathers (RenderConfig.tex_group_caps).

Reference-scale tile atlases (io.build.group_tile_atlas) are partitioned
into material groups under the fast-gather tier; with caps set, the render
routes 128-px rows through compacted per-group gathers with a full-table
fallback (ops.sampling.tile_tap_resolve_grouped). The routing is pure row
permutation + identical per-pixel arithmetic, so the frame must be
BIT-IDENTICAL to the plain full-table gather — these tests pin that, the
spill path, and the loud fallback overflow (reference texture load:
/root/reference/src/renderer/renderer.cpp:475-553).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from arctic_tpu.core.config import RenderConfig
from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.io.build import build_buffers
from arctic_tpu.io.procedural import (
    box_mesh,
    gradient_environment,
    plane_mesh,
    textured_materials,
    transform,
    uv_sphere,
)
from arctic_tpu.models import pipeline
from arctic_tpu.utils.errors import RenderError

W, H = 128, 128  # one 64x64 tile grid of 2x2 -> 128 pixel-block rows


def _scene():
    mats = textured_materials(6, 32)
    meshes = [
        plane_mesh(8.0, material=0, uv_scale=2.0),
        box_mesh(2.0, 2.0, 2.0, material=1),
        uv_sphere(1.0, 8, 12, material=2),
        box_mesh(1.0, 3.0, 1.0, material=3),
        uv_sphere(0.8, 8, 12, material=4),
        box_mesh(3.0, 1.0, 1.0, material=5),
    ]
    objects = [
        (transform((0, 0, 0)), 0),
        (transform((-2.0, 1.0, 0.0)), 1),
        (transform((2.0, 1.0, 0.0)), 2),
        (transform((0.0, 1.5, -2.0)), 3),
        (transform((-1.0, 0.8, 2.0)), 4),
        (transform((1.5, 0.5, 2.5)), 5),
    ]
    env = gradient_environment(16, 32)
    return meshes, objects, mats, env


def _bufs(budget_rows=None):
    meshes, objects, mats, env = _scene()
    return build_buffers(
        meshes, objects, mats, env, tri_bucket=512,
        tile_threshold_texels=0,
        tex_group_budget=None if budget_rows is None else budget_rows * 512,
    )


def _params():
    p = default_scene_params(aspect=W / H)
    return dataclasses.replace(
        p,
        camera=dataclasses.replace(
            p.camera,
            eye=jnp.asarray([0.0, 4.0, 7.0]),
            rotation=jnp.asarray([-25.0, -90.0]),
        ),
    )


def test_group_layout_and_metas():
    bufs = _bufs(budget_rows=220)  # ~2 materials (55 rows each) + env
    groups = bufs.atlas.tile_groups
    assert groups is not None and len(groups) >= 2
    # Slices are disjoint, ordered, self-contained, and cover the table.
    prev_end = 0
    for mstart, env_base, end in groups:
        assert mstart == prev_end and mstart < env_base < end
        prev_end = end
    assert prev_end == bufs.atlas.tiles.shape[0]
    # All env copies hold identical rows.
    t = np.asarray(bufs.atlas.tiles)
    e0 = t[groups[0][1] : groups[0][2]]
    for mstart, env_base, end in groups[1:]:
        assert np.array_equal(t[env_base:end], e0)
    assert bufs.atlas.tiles_ntex == groups[0][1]
    assert len(bufs.atlas.tile_group_of) == 6
    assert sum(bufs.atlas.tile_mat_rows) == sum(
        env_base - mstart for mstart, env_base, _ in groups
    )
    # Default builds skip the materialized per-group copies (opt-in route).
    assert bufs.atlas.tile_group_tables is None


def test_grouped_bit_identical_and_autotune():
    bufs = _bufs(budget_rows=220)
    groups = bufs.atlas.tile_groups
    params = _params()
    settings = default_settings()
    config = RenderConfig(width=W, height=H, shadow_size=128)

    img_plain, stats = pipeline.render_frame_stats(bufs, params, settings, config)
    pipeline.check_stats(stats)
    assert int(stats["tex_fb_rows"]) == 0 and int(stats["tex_fb_cap"]) == 1

    tuned = pipeline.autotune_tex_group_caps(bufs, params, config)
    assert tuned.tex_group_caps is not None
    assert len(tuned.tex_group_caps) == len(groups) + 1
    img_g, gstats = pipeline.render_frame_stats(bufs, params, settings, tuned)
    pipeline.check_stats(gstats)
    assert np.array_equal(np.asarray(img_g), np.asarray(img_plain))


def test_grouped_spill_bit_identical():
    # Starve every group cap: all rows spill to the full-table fallback,
    # which must still reproduce the frame exactly.
    bufs = _bufs(budget_rows=220)
    groups = bufs.atlas.tile_groups
    params = _params()
    settings = default_settings()
    config = RenderConfig(width=W, height=H, shadow_size=128)
    img_plain, _ = pipeline.render_frame_stats(bufs, params, settings, config)

    rows_total = (
        RenderConfig(width=W, height=H).num_tiles * 64 * 64 // 128
    )
    fb_cap = -(-(rows_total + 32) // 32) * 32
    caps = tuple([32] * len(groups) + [fb_cap])
    starved = dataclasses.replace(config, tex_group_caps=caps)
    img_s, sstats = pipeline.render_frame_stats(bufs, params, settings, starved)
    pipeline.check_stats(sstats)
    assert int(sstats["tex_fb_rows"]) > 0
    assert np.array_equal(np.asarray(img_s), np.asarray(img_plain))


def test_grouped_fallback_overflow_is_loud():
    bufs = _bufs(budget_rows=220)
    groups = bufs.atlas.tile_groups
    params = _params()
    settings = default_settings()
    caps = tuple([32] * len(groups) + [32])  # fallback too small
    config = RenderConfig(
        width=W, height=H, shadow_size=128, tex_group_caps=caps
    )
    _, stats = pipeline.render_frame_stats(bufs, params, settings, config)
    assert int(stats["tex_fb_rows"]) > 32
    with pytest.raises(RenderError, match="fallback rows overflowed"):
        pipeline.check_stats(stats)


def test_explicit_groups_and_planner():
    # A non-contiguous (planner-style) grouping must render bit-identically,
    # and the measured-mask planner must return a valid partition.
    meshes, objects, mats, env = _scene()
    kw = dict(tri_bucket=512, tile_threshold_texels=0,
              tex_group_budget=220 * 512)
    bufs = build_buffers(meshes, objects, mats, env, **kw)
    params = _params()
    settings = default_settings()
    config = RenderConfig(width=W, height=H, shadow_size=128)
    img_plain, _ = pipeline.render_frame_stats(bufs, params, settings, config)

    explicit = [[0, 5], [1, 4], [2, 3]]
    bufs_e = build_buffers(meshes, objects, mats, env, tex_groups=explicit, **kw)
    assert bufs_e.atlas.tile_group_of == (0, 1, 2, 2, 1, 0)
    # Explicit (opt-in) builds materialize per-group tables = their slices.
    te = np.asarray(bufs_e.atlas.tiles)
    assert len(bufs_e.atlas.tile_group_tables) == len(bufs_e.atlas.tile_groups)
    for (lo, _eb, hi), tab in zip(
        bufs_e.atlas.tile_groups, bufs_e.atlas.tile_group_tables
    ):
        assert np.array_equal(np.asarray(tab), te[lo:hi])
    tuned = pipeline.autotune_tex_group_caps(bufs_e, params, config)
    img_e, estats = pipeline.render_frame_stats(bufs_e, params, settings, tuned)
    pipeline.check_stats(estats)
    assert np.array_equal(np.asarray(img_e), np.asarray(img_plain))

    plan = pipeline.plan_tex_groups(bufs, params, config)
    assert plan is not None
    assert sorted(m for g in plan for m in g) == list(range(6))


def test_single_group_scene_ignores_caps():
    bufs = _bufs(budget_rows=None)  # default budget: everything fits one group
    assert len(bufs.atlas.tile_groups) == 1
    params = _params()
    settings = default_settings()
    config = RenderConfig(width=W, height=H, shadow_size=128)
    tuned = pipeline.autotune_tex_group_caps(bufs, params, config)
    assert tuned.tex_group_caps is None  # no-op
    img, stats = pipeline.render_frame_stats(bufs, params, settings, tuned)
    pipeline.check_stats(stats)
    assert np.asarray(img).shape == (H, W, 3)
