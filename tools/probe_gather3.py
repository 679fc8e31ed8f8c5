"""Locate the gather table-size cliff precisely (512B rows, runs8+random)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])


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
    rng = np.random.default_rng(0)
    n_g = 2_088_960

    @jax.jit
    def g(table, idx):
        return table[idx]

    for table_mb in [96, 126, 144, 176, 208, 240]:
        n_table = table_mb * 1024 * 1024 // 512
        table = jnp.asarray(rng.random((n_table, 128), dtype=np.float32))
        r8 = np.repeat(rng.integers(0, n_table, n_g // 8 + 1), 8)[:n_g]
        line = f"512B table={table_mb:4d}MB: "
        for name, idx in [("random", rng.integers(0, n_table, n_g)), ("runs8", r8)]:
            idxj = jnp.asarray(idx.astype(np.int32).reshape(2040, 1024))
            t, _ = timeit(g, table, idxj)
            line += f"{name}={t/n_g*1e9:5.2f}ns "
        print(line, flush=True)
        del table


if __name__ == "__main__":
    main()
