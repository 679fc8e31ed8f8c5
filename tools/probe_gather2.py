"""Microbench: TPU gather ns/row vs table size x index pattern.

Decides the PCF strategy: is the 11 ns/row window-LUT gather an
issue-rate wall (fewer gathers is the only lever) or a locality wall
(a cache-friendly LUT layout fixes it)?

Patterns over 2.09M gathers (the 1080p pixel count):
- random:        uniform over the table (the upper bound)
- window256k:    random within a 256 KB window that advances one window
                 per 1024 gathers (per-tile footprint model)
- runs8:         random but each index repeated 8x consecutively
                 (adjacent pixels sharing a window row)
- same:          all gathers hit one row
- mix45:         45% random + 55% row-0 (the hygiene-masked model)
- pcf_real:      the actual jrow pattern of the bench frame, if a dump
                 exists at /tmp/pcf_jrow.npy
"""

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
    rng = np.random.default_rng(0)
    n_g = 2_088_960

    @jax.jit
    def g(table, idx):
        return table[idx]

    for width_lanes, label in [(128, "512B")]:
        row_bytes = width_lanes * 4
        for table_mb in [8, 64, 268]:
            n_table = table_mb * 1024 * 1024 // row_bytes
            table = jnp.asarray(
                rng.random((n_table, width_lanes), dtype=np.float32)
            )
            win_rows = 256 * 1024 // row_bytes

            pats = {}
            pats["random"] = rng.integers(0, n_table, n_g)
            base = (np.arange(n_g) // 1024 * win_rows) % max(n_table - win_rows, 1)
            pats["window256k"] = base + rng.integers(0, win_rows, n_g)
            r8 = rng.integers(0, n_table, n_g // 8 + 1)
            pats["runs8"] = np.repeat(r8, 8)[:n_g]
            pats["mix45"] = np.where(
                rng.random(n_g) < 0.55, 0, rng.integers(0, n_table, n_g)
            )
            line = f"{label} table={table_mb:4d}MB: "
            for name, idx in pats.items():
                idxj = jnp.asarray(idx.astype(np.int32).reshape(2040, 1024))
                t, _ = timeit(g, table, idxj)
                line += f"{name}={t/n_g*1e9:5.2f}ns "
            print(line, flush=True)

    # runs-k sweep on the big table: how much does coalescing adjacent
    # repeats matter?
    table = jnp.asarray(rng.random((268 * 1024 * 1024 // 512, 128), dtype=np.float32))
    n_table = table.shape[0]
    line = "512B 268MB runs-k: "
    for k in [2, 4, 8]:
        r = rng.integers(0, n_table, n_g // k + 1)
        idx = jnp.asarray(np.repeat(r, k)[:n_g].astype(np.int32).reshape(2040, 1024))
        t, _ = timeit(g, table, idx)
        line += f"k{k}={t/n_g*1e9:5.2f}ns "
    print(line, flush=True)

    # window-size sweep with runs of 4 inside (per-tile footprint x
    # adjacent-pixel-repeat combined model)
    line = "512B 268MB win x runs4: "
    for win_kb in [256, 1024, 4096]:
        win_rows = win_kb * 1024 // 512
        r = rng.integers(0, win_rows, n_g // 4 + 1)
        base = (np.arange(n_g // 4 + 1) // 256 * win_rows) % max(n_table - win_rows, 1)
        idx = np.repeat(base + r, 4)[:n_g]
        idxj = jnp.asarray(idx.astype(np.int32).reshape(2040, 1024))
        t, _ = timeit(g, table, idxj)
        line += f"{win_kb}KB={t/n_g*1e9:5.2f}ns "
    print(line, flush=True)

    if os.path.exists("/tmp/pcf_jrow.npy"):
        jrow = np.load("/tmp/pcf_jrow.npy")
        idxj = jnp.asarray(jrow.astype(np.int32))
        t, _ = timeit(g, table, idxj % n_table)
        print(f"512B 268MB pcf_real: {t/jrow.size*1e9:5.2f}ns", flush=True)


if __name__ == "__main__":
    main()
