"""Microbench: TPU gather ns/row vs row width; LUT-build matmul precision cost."""

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
    key = jax.random.PRNGKey(0)
    n_rows = 2_000_000

    for width, n_table in [(8, 16_000_000), (16, 16_000_000), (32, 8_000_000), (64, 4_000_000), (128, 2_000_000)]:
        table = jax.random.uniform(key, (n_table, width), jnp.float32)
        idx = jax.random.randint(key, (2040, 1024), 0, n_table)

        @jax.jit
        def g(table, idx):
            return table[idx]

        t, _ = timeit(g, table, idx)
        print(f"gather {width:4d}-lane rows from ({n_table},{width}): {t*1e3:8.2f} ms  {t/ n_rows * 1e9:6.2f} ns/row", flush=True)

    # 2D-indexed gather (idx flat vs tiled) — does index shape matter?
    table = jax.random.uniform(key, (16_000_000, 16), jnp.float32)
    idx = jax.random.randint(key, (2040 * 1024,), 0, 16_000_000)

    @jax.jit
    def gflat(table, idx):
        return table[idx]

    t, _ = timeit(gflat, table, idx)
    print(f"gather 16-lane flat-idx: {t*1e3:8.2f} ms", flush=True)

    # Matmul precision: HIGHEST vs manual x3 split for a selection matmul.
    a = jax.random.uniform(key, (4096, 128), jnp.float32)
    sel = (jax.random.uniform(key, (128, 512)) < 0.01).astype(jnp.float32)

    def mm(prec):
        @jax.jit
        def f(a, sel):
            return jax.lax.dot_general(
                a, sel, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32,
            )
        return f

    for prec in ["highest", "default"]:
        t, _ = timeit(mm(prec), a, sel)
        print(f"matmul 4096x128x512 {prec}: {t*1e3:8.3f} ms", flush=True)

    @jax.jit
    def x3(a, sel):
        hi = a.astype(jnp.bfloat16)
        r1 = a - hi.astype(jnp.float32)
        m1 = r1.astype(jnp.bfloat16)
        r2 = r1 - m1.astype(jnp.float32)
        lo = r2.astype(jnp.bfloat16)
        selb = sel.astype(jnp.bfloat16)
        out = jax.lax.dot_general(hi, selb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(m1, selb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(lo, selb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return out

    t, o3 = timeit(x3, a, sel)
    print(f"matmul 4096x128x512 x3-split: {t*1e3:8.3f} ms", flush=True)
    oh = mm("highest")(a, sel)
    print("x3 == highest bitwise:", bool(jnp.all(o3 == oh)), flush=True)


if __name__ == "__main__":
    main()
