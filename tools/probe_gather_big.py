"""Gather ns/row at tile-atlas table sizes (round 4).

The textured bench's tile gather (24 materials x 1024^2 u16 tiles,
~620 MB) measured ~10 ns/row in-frame (hlo_r4tex fusion.10, 20.8 ms for
2.09M rows). Question: does shrinking the table (u8 texels -> ~310 MB,
or 8x8-texel u8 tiles -> ~260 MB) buy a faster tier, or is the rate flat
above the ~126 MB cliff?
"""

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

    for table_mb in [96, 128, 192, 256, 320, 448, 624, 768]:
        n_table = table_mb * 1024 * 1024 // 512
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (n_table, 128), dtype=np.int32)
        )
        line = f"512B table={table_mb:4d}MB: "
        for name, idx in [
            ("random", rng.integers(0, n_table, n_g)),
            ("runs8", np.repeat(rng.integers(0, n_table, n_g // 8 + 1), 8)[:n_g]),
        ]:
            idxj = jnp.asarray(idx.astype(np.int32).reshape(2040, 1024))
            t, _ = timeit(g, table, idxj)
            line += f"{name}={t/n_g*1e9:5.2f}ns "
        print(line, flush=True)
        del table


if __name__ == "__main__":
    main()
