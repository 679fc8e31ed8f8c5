"""Sub-stage timing of the deferred shading path on TPU."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    # Slice FIRST: .ravel() of the full image compiles a 6 MB copy per
    # sync (showed up as a 0.36 ms/frame reshape in the ops table).
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])


def timeit(fn, *args, n=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from arctic_tpu.core.config import RenderConfig
    from arctic_tpu.core.scene import default_scene_params
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import raster, shadow as shadow_ops
    from arctic_tpu.ops.sampling import sample_atlas

    W, H = 1920, 1080
    config = RenderConfig(width=W, height=H, shadow_size=4000)
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    geom = bufs.geometry
    params = default_scene_params(aspect=W / H)
    params = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, eye=jnp.asarray([-14.0, 4.5, 0.0]), rotation=jnp.asarray([-8.0, 0.0])
        ),
    )

    @jax.jit
    def prep(bufs, params):
        world = pipeline.vertex_world_positions(bufs.geometry)
        sun_pv = params.sun.proj_view()
        shadow_map, _, _ = pipeline.shadow_pass(bufs.geometry, sun_pv, config)
        setup, zbuf, ibuf, _, _ = pipeline.main_pass(world, bufs.geometry, params.camera.proj_view(), config)
        return world, sun_pv, shadow_map, setup, ibuf

    world, sun_pv, shadow_map, setup, ibuf = jax.block_until_ready(prep(bufs, params))
    print("prep done", flush=True)

    t = timeit(jax.jit(lambda s, g, a, w: pipeline.build_shade_table(s, g, a, w)),
               setup, geom, bufs.atlas, world)
    print(f"table build:   {t*1e3:9.2f} ms", flush=True)

    table = jax.block_until_ready(pipeline.build_shade_table(setup, geom, bufs.atlas, world))

    @jax.jit
    def row_gather(table, ibuf):
        return table[jnp.maximum(ibuf, 0)]

    t = timeit(row_gather, table, ibuf)
    print(f"row gather:    {t*1e3:9.2f} ms", flush=True)

    row = jax.block_until_ready(row_gather(table, ibuf))

    @jax.jit
    def attr_math(row):
        px, py = raster._pixel_centers(H, W, 0.0)
        bw = [row[..., 3*c]*px + row[..., 3*c+1]*py + row[..., 3*c+2] for c in range(3)]
        den = bw[0]+bw[1]+bw[2]
        den = jnp.where(den == 0, 1.0, den)
        b = [x/den for x in bw]
        return b[0][..., None]*row[..., 9:23] + b[1][..., None]*row[..., 23:37] + b[2][..., None]*row[..., 37:51]

    t = timeit(attr_math, row)
    print(f"bary+attrs:    {t*1e3:9.2f} ms", flush=True)
    a = jax.block_until_ready(attr_math(row))
    uv = a[..., 12:14]
    wp = a[..., :3]
    regions = row[..., 51:63].reshape(H, W, 3, 4)

    @jax.jit
    def tex3(atlas, regions, uv):
        return (
            sample_atlas(atlas, regions[..., 0, :], uv)
            + sample_atlas(atlas, regions[..., 1, :], uv)
            + sample_atlas(atlas, regions[..., 2, :], uv)
        )

    t = timeit(tex3, bufs.atlas, regions, uv)
    print(f"3x atlas tap:  {t*1e3:9.2f} ms", flush=True)

    @jax.jit
    def pcf(shadow_map, wp):
        wph = jnp.concatenate([wp, jnp.ones((H, W, 1), jnp.float32)], -1)
        lsp = jnp.einsum("ij,hwj->hwi", sun_pv, wph)
        return shadow_ops.pcf_shadow(shadow_map, lsp)

    t = timeit(pcf, shadow_map, wp)
    print(f"pcf:           {t*1e3:9.2f} ms", flush=True)

    @jax.jit
    def full_shade(bufs, params, setup, ibuf, world, shadow_map):
        return pipeline.shade(bufs, params, setup, ibuf, world, shadow_map, sun_pv, config)

    t = timeit(full_shade, bufs, params, setup, ibuf, world, shadow_map)
    print(f"full shade:    {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
