"""Benchmark: Sponza-class scene, 1920x1080, full pipeline on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 60 FPS on TPU v5e-1 for a ~0.26M-triangle
Sponza-scale scene at 1080p with directional shadow (4000^2 map + 25-tap
PCF), 4 point lights, ACES tonemap + gamma — reference configs[2].

The Khronos Sponza asset is not shipped in the reference repo, so the scene
is the procedural Sponza-class colonnade from arctic_tpu.io.procedural
(same triangle count / material mix / occlusion structure). Pass a glTF/OBJ
path as argv[1] to bench a real asset instead.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def check_golden(img: np.ndarray, name: str, what: str, min_db: float = 40.0) -> None:
    """PSNR gate against a committed golden image (docs/images/<name>).

    The reference pins its expected output with README screenshots
    (README.md:21-27); these committed goldens play the same role across
    rounds — a visual regression fails the bench instead of slipping by.
    """
    path = os.path.join(_REPO, "docs", "images", name)
    if os.environ.get("ARCTIC_BLESS"):
        # Deliberate re-bless (tools/bless_goldens.py): write, don't compare.
        from PIL import Image

        Image.fromarray(img).save(path)
        print(f"golden: BLESSED {name} from this {what}", file=sys.stderr)
        return
    if not os.path.exists(path):
        print(f"golden: {name} not committed yet — skipping {what} check", file=sys.stderr)
        return
    from PIL import Image

    with Image.open(path) as im:
        gold = np.asarray(im.convert("RGB"), np.uint8)
    if gold.shape != img.shape:
        raise RuntimeError(
            f"GOLDEN FAILURE: {what} shape {img.shape} != golden {gold.shape}"
        )
    mse = np.mean((img.astype(np.float64) - gold.astype(np.float64)) ** 2)
    db = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
    if db < min_db:
        raise RuntimeError(
            f"GOLDEN FAILURE: {what} PSNR {db:.2f} dB < {min_db} dB vs "
            f"committed {name} — visual regression (or a deliberate change: "
            f"re-bless the golden)"
        )
    print(f"golden: {what} {db:.2f} dB >= {min_db} vs {name} OK", file=sys.stderr)


def conformance_checks() -> None:
    """Machine-check the Mosaic kernel path on the *current* backend.

    Round-1 gap (VERDICT): all golden/PSNR tests run force_bruteforce on CPU,
    so real-TPU Mosaic output was only ever eyeballed. Every bench run now
    asserts, on the hardware being benchmarked:
      1. tiled rasterizer == brute force exactly on ibuf (CLAUDE.md invariant)
      2. the full tiled pipeline is >= 40 dB PSNR vs the float64 oracle
    """
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import PointLights, default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import cornell_like_scene
    from arctic_tpu.models import golden, pipeline
    from arctic_tpu.ops import raster, raster_tiles

    # Mid-res oracle (VERDICT r2 weak #5): 640x360 + 1024^2 shadow is within
    # 3x of the benched 1080p/4000^2 per dimension, so tile seams, LUT
    # indexing, and f16 accumulation get checked near bench scale (the old
    # 160x120/200^2 check covered 1/100th of the pixel count). The f64
    # oracle takes ~14 s at this size — bench preflight, not test-suite.
    W, H, SHADOW = 640, 360, 1024
    meshes, objects, materials, env = cornell_like_scene()
    # The rendered buffers come through the GLB writer -> glTF loader round
    # trip while the f64 oracle uses the ORIGINAL procedural scene — a
    # loader/exporter bug shows up as a PSNR drop instead of cancelling out
    # (VERDICT r2 missing #1: loader -> bench -> PSNR on the asset path).
    import tempfile

    from arctic_tpu.io.gltf import load_gltf
    from arctic_tpu.io.gltf_export import save_glb

    with tempfile.TemporaryDirectory(prefix="arctic_conf_") as td:
        save_glb(f"{td}/cornell.glb", meshes, objects, materials)
        l_meshes, l_objects, l_materials = load_gltf(f"{td}/cornell.glb")
    bufs = build_buffers(l_meshes, l_objects, l_materials, env, tri_bucket=256)
    config = RenderConfig(width=W, height=H, shadow_size=SHADOW)

    cam = dict(eye=[0.0, 4.0, 3.0], rotation=[-25.0, -90.0], aspect=W / H,
               fov_y=45.0, z_near=0.1, z_far=1000.0)
    sun = dict(position=[-10.0, 32.0, -2.48], rotation=[-70.0, 12.0], color=[8.0, 8.0, 8.0])
    lights = [((0.0, 1.0, 0.0), (10.0, 0.0, 0.0)), ((3.0, 2.0, -6.0), (0.0, 6.0, 12.0))]
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, eye=jnp.asarray(cam["eye"]), rotation=jnp.asarray(cam["rotation"])
        ),
        point_lights=PointLights.from_list(lights),
    )
    settings = dataclasses.replace(default_settings(), tm_method=jnp.int32(2))

    # 1. tiled (Mosaic on TPU) vs brute-force visibility: exact ibuf match.
    import jax

    @jax.jit
    def both_ibufs(bufs, params):
        world = pipeline.vertex_world_positions(bufs.geometry)
        clip = pipeline.to_clip(world, params.camera.proj_view())
        tv = jnp.arange(bufs.geometry.capacity) < bufs.geometry.num_tris
        clipped = raster.near_clip_triangles(clip, bufs.geometry.indices, tv)
        setup = raster.setup_screen_triangles(clipped, W, H, cull="back")
        _, it = raster_tiles.rasterize_tiled(setup, H, W, config)
        _, ib = raster.rasterize_bruteforce(setup, H, W, config.raster_chunk)
        return it, ib

    it, ib = jax.device_get(both_ibufs(bufs, params))
    if not np.array_equal(it, ib):
        n = int((it != ib).sum())
        raise RuntimeError(
            f"CONFORMANCE FAILURE: tiled rasterizer ibuf differs from brute "
            f"force at {n}/{it.size} pixels on backend {jax.default_backend()}"
        )

    # 2. full tiled pipeline vs the independent float64 oracle.
    img = np.asarray(pipeline.render_frame(bufs, params, settings, config))
    check_golden(img, "cornell_conformance_golden.png", "cornell conformance frame")
    tris, mats = golden.golden_scene(meshes, objects, materials)
    img_gold = golden.render(
        tris, mats, np.asarray(env, np.float64), cam, sun, lights,
        ambient=0.1, settings=dict(tm_method=2, gamma=2.2, exposure=1.0),
        width=W, height=H, shadow_size=SHADOW,
    )
    mse = np.mean((img.astype(np.float64) - img_gold.astype(np.float64)) ** 2)
    db = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
    if db < 40.0:
        raise RuntimeError(
            f"CONFORMANCE FAILURE: tiled pipeline PSNR {db:.2f} dB < 40 dB vs "
            f"the float64 oracle on backend {jax.default_backend()}"
        )

    # 3. Mosaic under shard_map on real hardware (VERDICT r2 weak #4: the
    # sharded Pallas path only ever ran in interpret mode). A 1-device mesh
    # exercises the vma plumbing + collectives with the REAL kernels; the
    # frame must match single-device to <= 1 u8 LSB.
    from arctic_tpu.parallel import sharding

    mesh = sharding.make_mesh(1)
    img_sh, sh_stats = sharding.make_sharded_renderer_stats(config, mesh)(
        bufs, params, settings
    )
    pipeline.check_stats(sh_stats)
    diff = np.abs(np.asarray(img_sh).astype(int) - img.astype(int))
    frac = (diff > 0).mean()
    mse_sh = np.mean(diff.astype(np.float64) ** 2)
    db_sh = 10 * np.log10(255.0**2 / mse_sh) if mse_sh > 0 else np.inf
    # The sharded and single-device programs are different XLA programs:
    # FMA formation differs per fusion, so long elementwise chains (25-tap
    # PCF, BRDF) round differently, and through the f16 HDR round-trip an
    # isolated half-ULP delta can move a u8 by 2 (measured: 1.5% of pixels,
    # all <= 2 LSB, ~62 dB). A real slab/offset bug craters PSNR instead.
    if diff.max() > 2 or db_sh < 55.0:
        raise RuntimeError(
            f"CONFORMANCE FAILURE: sharded (1-device mesh) frame differs from "
            f"single-device by {diff.max()} LSB / {db_sh:.1f} dB "
            f"(allowed <= 2 LSB and >= 55 dB) on {jax.default_backend()}"
        )
    print(
        f"conformance: ibuf exact-match OK, PSNR {db:.2f} dB >= 40 OK, "
        f"shard_map-Mosaic on-hardware OK (max {diff.max()} LSB, "
        f"{frac:.4%} px, {db_sh:.1f} dB vs single)",
        file=sys.stderr,
    )


def bench_params(W: int, H: int):
    """The bench viewpoint + light rig (shared by the primary and textured
    fly-throughs so the texture-cost delta isolates texture cost)."""
    import dataclasses

    import jax.numpy as jnp

    from arctic_tpu.core.scene import PointLights, default_scene_params

    params = default_scene_params(aspect=W / H)
    return dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera,
            eye=jnp.asarray([-14.0, 4.5, 0.0]),
            rotation=jnp.asarray([-8.0, 0.0]),  # down the hall (+X)
        ),
        sun=dataclasses.replace(
            params.sun,
            position=jnp.asarray([0.0, 24.0, 0.0]),
            rotation=jnp.asarray([-65.0, 30.0]),
        ),
        point_lights=PointLights.from_list(
            [
                ((-6.0, 3.0, -4.0), (30.0, 20.0, 8.0)),
                ((0.0, 3.0, 4.0), (30.0, 20.0, 8.0)),
                ((6.0, 3.0, -4.0), (8.0, 20.0, 30.0)),
                ((12.0, 3.0, 4.0), (30.0, 8.0, 8.0)),
            ]
        ),
    )


def fly_frames(params, n_frames: int = 20):
    """Camera fly-through: every timed frame has distinct inputs (no
    backend-side result reuse possible; matches real usage), pre-staged on
    the device (through the remote-TPU tunnel per-frame H2D uploads
    serialize into the dispatch path)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    frames = [
        dataclasses.replace(
            params,
            camera=dataclasses.replace(
                params.camera,
                eye=jnp.asarray([-14.0 + 0.25 * i, 4.5, 0.0]),
                rotation=jnp.asarray([-8.0, 0.3 * i]),
            ),
        )
        for i in range(n_frames)
    ]
    return jax.device_put(frames)


def time_flythrough(render_s, bufs, frames, settings):
    """(fps, last_img): chained-dispatch fly-through with a hard sync and
    per-frame overflow checks after timing."""
    import numpy as np

    from arctic_tpu.models import pipeline

    img, rstats = render_s(bufs, frames[0], settings)
    img.block_until_ready()
    pipeline.check_stats(rstats)
    all_stats = []
    t0 = time.perf_counter()
    for p in frames:
        img, rstats = render_s(bufs, p, settings)
        all_stats.append(rstats)  # device scalars; checked after timing
    np.asarray(img[:1, :1])  # hard device->host sync (block_until_ready can
    # acknowledge early through the remote-TPU tunnel)
    fps = len(frames) / (time.perf_counter() - t0)
    for rstats in all_stats:  # EVERY timed frame must be complete
        pipeline.check_stats(rstats)
    return fps, img


def textured_scene(size: int = 1024):
    """Reference-scale texture load (renderer.cpp:475-553 uploads 3 full
    maps per material; Khronos Sponza ships ~24 such materials): same
    geometry as the default metric, 24 materials x 3 x size^2 spatially
    varying maps, routed through the u16 tile atlas (io/build.py)."""
    from arctic_tpu.io.procedural import sponza_like_scene

    meshes, objects, materials, env = sponza_like_scene(
        texture_size=size, n_materials=24
    )
    tex_mb = sum(
        m.diffuse.nbytes + m.normal.nbytes + m.metal_roughness.nbytes
        for m in materials
    ) / 1e6
    print(
        f"textured scene: 24 materials x 3 x {size}^2 ({tex_mb:.0f} MB raw)",
        file=sys.stderr,
    )
    return meshes, objects, materials, env


def main() -> None:
    import jax
    import jax.numpy as jnp

    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import default_scene_params, default_settings
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline

    conformance_checks()

    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)

    from arctic_tpu.io.load import load_scene_file

    textured = "--textures" in sys.argv
    if textured:
        # Reference-scale texture load as the PRIMARY metric (VERDICT r3
        # missing #2). The default run also measures this scene as the
        # textured_fps secondary metric below; --textures isolates it (and
        # allows a non-default size). Asset-path round trip is skipped (the
        # default metric covers the loader; 300 MB of PNG encode is not the
        # thing being measured).
        size = 1024
        for a in sys.argv[2:]:
            if a.isdigit():
                size = int(a)
        meshes, objects, materials, env = textured_scene(size)
    elif len(sys.argv) > 1:
        meshes, objects, materials, env = load_scene_file(sys.argv[1])
    else:
        # Benchmark the ASSET path, not just procedural buffers: export the
        # Sponza-class scene to a real GLB + .hdr and load it back through
        # the glTF importer (tangent gen, texture decode, atlas build) —
        # the route a user's own scene takes (VERDICT r2 missing #1).
        import tempfile

        from arctic_tpu.io.gltf_export import save_glb
        from arctic_tpu.io.images import save_hdr

        pm, po, pmat, penv = sponza_like_scene()
        tmp = tempfile.mkdtemp(prefix="arctic_bench_")
        glb = f"{tmp}/sponza_class.glb"
        hdr = f"{tmp}/env.hdr"
        save_glb(glb, pm, po, pmat)
        save_hdr(hdr, np.asarray(penv))
        meshes, objects, materials, env = load_scene_file(glb, env_path=hdr)
        n_direct = sum(len(m.indices) for m in pm)
        n_loaded = sum(len(m.indices) for m in meshes)
        assert n_loaded == n_direct, (n_loaded, n_direct)
        print(f"asset path: {glb} ({n_loaded} tris via glTF loader)", file=sys.stderr)
    bufs = build_buffers(meshes, objects, materials, env)
    n_tris = int(bufs.geometry.num_tris)

    params = bench_params(W, H)
    settings = dataclasses.replace(
        default_settings(), tm_method=jnp.int32(2)  # ACES (configs[2])
    )

    n_frames = 20
    frames = fly_frames(params, n_frames)

    # Size the pair buffers to the scene (sort/align costs scale with
    # capacity; the formula default is ~5x oversized for this scene). The
    # caps are tuned over the whole fly-through so no timed frame overflows
    # (all 20 viewpoints: one compile, 20 cheap count executions).
    config = pipeline.autotune_pair_caps(
        buffers=bufs, params=frames, config=config, margin=1.4,
    )
    # 4 point lights, known statically: unrolls the light loop into one
    # fused BRDF pass (the reference's shader also specializes nothing here —
    # its loop runs on free ALUs; ours costs an HBM round-trip per light).
    config = dataclasses.replace(config, static_point_lights=4)
    # NOTE: the grouped-tile route (pipeline.plan_tex_groups +
    # autotune_tex_group_caps) stays OFF: per-frame gathers from cold
    # tables run at the miss tier regardless of table size, so compacted
    # per-group gathers measured SLOWER than the plain full-table gather
    # (75-97 vs 57 ms/frame — docs/FLOORS.md cache model, a recorded
    # dead-end; the machinery remains opt-in and bit-identical).
    print(
        f"pair caps: cam={config.pair_cap_cam} shadow={config.pair_cap_shadow}",
        file=sys.stderr,
    )

    # One program for both timing and health: the stats outputs are scalars
    # already computed by the binning cumsum (free), and a second jitted
    # variant would double the (minutes-long) remote TPU compile.
    render_s = pipeline.make_renderer_stats(config)
    fps, img = time_flythrough(render_s, bufs, frames, settings)

    # --- Secondary metric: cached-sun fly-through -------------------------
    # The reference re-renders its shadow map every frame because GPU
    # rasterization makes that ~free; the TPU's shadow chain (binning +
    # depth raster + window-LUT build) is a large frame fraction, so a real
    # deployment caches it while sun + geometry are unchanged (standard
    # stationary-light shadow caching) and invalidates on edits. Same
    # pixels (test_sun_cache_matches_uncached); reported separately from
    # the primary metric, which keeps re-rendering everything per frame.
    cache, cache_stats = jax.jit(
        lambda b, p: pipeline.build_sun_cache(b, p, config)
    )(bufs, params)
    pipeline.check_stats({**cache_stats, "cam_pairs": 0, "cam_pair_cap": 1})
    render_cached = pipeline.make_cached_renderer_stats(config)
    img_cc, rstats = render_cached(bufs, frames[0], settings, cache)
    img_cc.block_until_ready()
    pipeline.check_stats(rstats)
    cached_stats = []
    t0 = time.perf_counter()
    for p in frames:
        img_cc, rstats = render_cached(bufs, p, settings, cache)
        cached_stats.append(rstats)
    np.asarray(img_cc[:1, :1])  # hard sync
    cached_fps = n_frames / (time.perf_counter() - t0)
    for rstats in cached_stats:
        pipeline.check_stats(rstats)
    diff_c = np.abs(np.asarray(img_cc).astype(int) - np.asarray(img).astype(int))
    if diff_c.max() > 1:
        raise RuntimeError(
            f"cached-sun frame differs from per-frame render by {diff_c.max()} LSB"
        )
    print(
        f"cached-sun fly-through: {cached_fps:.2f} fps "
        f"(static sun+geometry; frame matches full re-render to "
        f"{diff_c.max()} LSB)",
        file=sys.stderr,
    )

    # Side artifact for eyeballing (not part of the metric), plus the
    # committed-golden gate: the final fly-through frame is pinned across
    # rounds like the reference's README screenshots.
    img_np = np.asarray(img)
    try:
        from PIL import Image

        Image.fromarray(img_np).save(
            "bench_frame_tex.png" if textured else "bench_frame.png"
        )
    except Exception:
        pass
    if len(sys.argv) <= 1:  # golden only applies to the default scene
        check_golden(img_np, "bench_golden.png", "bench final frame")
    elif textured and size == 1024:
        check_golden(img_np, "bench_tex1024.png", "textured bench final frame")

    # --- Secondary metric: reference-working-set textured fly-through -----
    # The default metric's procedural texture set is ~1.5 MB; the real
    # Khronos Sponza ships ~24 materials x 3 x 1024^2 maps. Measure the same
    # fly-through at that working set so the driver-recorded line carries
    # the honest reference-scale number (VERDICT r4 next #4).
    textured_fps = None
    if len(sys.argv) <= 1:
        tm, to, tmat, tenv = textured_scene(1024)
        tbufs = build_buffers(tm, to, tmat, tenv)
        tconfig = pipeline.autotune_pair_caps(
            buffers=tbufs, params=frames, config=RenderConfig(
                width=W, height=H, shadow_size=4000
            ), margin=1.4,
        )
        tconfig = dataclasses.replace(tconfig, static_point_lights=4)
        # Grouped-tile route off — see the note at the primary autotune.
        trender_s = pipeline.make_renderer_stats(tconfig)
        textured_fps, timg = time_flythrough(trender_s, tbufs, frames, settings)
        check_golden(np.asarray(timg), "bench_tex1024.png", "textured bench final frame")
        print(f"textured fly-through: {textured_fps:.2f} fps", file=sys.stderr)

    tex_tag = f"_tex{size}" if textured else ""
    out = {
        "metric": f"sponza_class_{n_tris // 1000}ktri{tex_tag}_1080p_fps_{jax.default_backend()}",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 4),
        "cached_sun_fps": round(cached_fps, 3),
    }
    if textured_fps is not None:
        out["textured_fps"] = round(textured_fps, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
