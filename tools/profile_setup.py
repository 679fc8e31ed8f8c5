"""Isolate geometry-setup costs on TPU: transform vs clip vs plane setup."""

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
    np.asarray(leaf.ravel()[0:1])


def timeit(fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from arctic_tpu.core.scene import default_scene_params
    from arctic_tpu.io.build import build_buffers
    from arctic_tpu.io.procedural import sponza_like_scene
    from arctic_tpu.models import pipeline
    from arctic_tpu.ops import raster

    W, H = 1920, 1080
    meshes, objects, materials, env = sponza_like_scene()
    bufs = build_buffers(meshes, objects, materials, env)
    geom = bufs.geometry
    params = default_scene_params(aspect=W / H)

    @jax.jit
    def xform(bufs, params):
        world = pipeline.vertex_world_positions(bufs.geometry)
        return pipeline.to_clip(world, params.camera.proj_view())

    t, clip = timeit(xform, bufs, params)
    print(f"transform+project (V={geom.positions.shape[0]}): {t*1e3:8.2f} ms")

    tv = jnp.arange(geom.capacity) < geom.num_tris

    @jax.jit
    def clip_stage(clip):
        return raster.near_clip_triangles(clip, geom.indices, tv)

    t, clipped = timeit(clip_stage, clip)
    print(f"near_clip (T={geom.capacity}):          {t*1e3:8.2f} ms")

    @jax.jit
    def setup_stage(clipped):
        return raster.setup_screen_triangles(clipped, W, H, cull="back")

    t, setup = timeit(setup_stage, clipped)
    print(f"setup_screen_triangles:                  {t*1e3:8.2f} ms")

    # Control: same logical work on 2D arrays only.
    key = jax.random.PRNGKey(0)
    p = 2 * geom.capacity
    a2 = jax.random.normal(key, (p, 12), jnp.float32)
    a3 = a2.reshape(p, 3, 4)

    @jax.jit
    def chain2(x):
        for _ in range(10):
            x = x * 1.0001 + 0.1
        return x

    t, _ = timeit(chain2, a2)
    print(f"10 elementwise ops on (P,12):            {t*1e3:8.2f} ms")
    t, _ = timeit(chain2, a3)
    print(f"10 elementwise ops on (P,3,4):           {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
