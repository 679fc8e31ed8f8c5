"""PCF cost components with the REAL ops: LUT build, window gather, taps."""

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


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from arctic_tpu.ops import shadow as shadow_ops

    S = 4000
    T, SPX = 2040, 1024  # 1080p tile-major pixel layout
    key = jax.random.PRNGKey(0)
    smap = jax.random.uniform(key, (S, S), jnp.float32)
    kx, ky, kz = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (T, SPX), jnp.float32, -1.0, 1.0)
    y = jax.random.uniform(ky, (T, SPX), jnp.float32, -1.0, 1.0)
    z = jax.random.uniform(kz, (T, SPX), jnp.float32, 0.0, 1.0)

    t, (lutp, xb) = timeit(jax.jit(shadow_ops.build_window_lut), smap)
    print(f"lut build:        {t*1e3:8.2f} ms  lut={lutp.shape}", flush=True)

    @jax.jit
    def gather_only(lutp, x, y):
        s = S
        u = x * 0.5 + 0.5
        v = 1.0 - (y * 0.5 + 0.5)
        tx = u * s - 0.5
        ty = v * s - 0.5
        wx = jnp.floor(tx).astype(jnp.int32) - 1
        wy = jnp.floor(ty).astype(jnp.int32) - 1
        start_y = jnp.clip(wy + 2, 0, s)
        start_x = jnp.clip(wx + 2, 0, s)
        jrow, _k2, _yo, _xo = shadow_ops.window_row_index(start_y, start_x, xb)
        return lutp[jrow]

    t, _ = timeit(gather_only, lutp, x, y)
    print(f"window gather:    {t*1e3:8.2f} ms", flush=True)

    t, _ = timeit(jax.jit(shadow_ops.pcf_shadow_proj), smap, x, y, z)
    print(f"pcf total:        {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
