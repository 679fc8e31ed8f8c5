"""Microbench: can a sub-96 MB u16/u32 window LUT reach the fast gather tier?

The round-3 dead-end note (ROADMAP) proved a fit-guaranteed f32 128-lane
one-row-per-window LUT bottoms out at 126 MB — above the table-size cliff
(~5.3 ns/row <= 96 MB, ~13.4 ns/row >= 126 MB, probe_gather2). A u16
DEPTH table changes the arithmetic: a 512 B row holds a 16x16-texel patch,
and stride-(12,12) patches cover every 4x4 PCF window in
ceil(4000/12)^2 = 334^2 rows = 57 MB.

This probe measures ns/row at the 1080p gather count for:
- (N, 256) u16 rows (the patch layout), 57 / 85 / 128 MB
- (N, 128) u32 rows (two texels packed per lane), 57 MB
- (N, 128) f32 control at 57 / 96 / 268 MB (the known tiers)
Each timing uses DIFFERENT index arrays per dispatch (chained-inputs rule:
identical repeated dispatches can measure ~0 through the axon tunnel).
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


def timeit_multi(fn, table, idx_list, warmup=1):
    for _ in range(warmup):
        out = fn(table, idx_list[0])
    _sync(out)
    t0 = time.perf_counter()
    for idx in idx_list:
        out = fn(table, idx)
    _sync(out)
    return (time.perf_counter() - t0) / len(idx_list)


def main():
    rng = np.random.default_rng(0)
    n_g = 2_088_960

    @jax.jit
    def g(table, idx):
        return table[idx]

    cases = []
    for mb in (57, 85, 128):
        cases.append((f"u16x256 {mb:3d}MB", np.uint16, 256, mb))
    cases.append(("u32x128  57MB", np.uint32, 128, 57))
    for mb in (57, 96, 268):
        cases.append((f"f32x128 {mb:3d}MB", np.float32, 128, mb))

    for label, dt, lanes, mb in cases:
        row_bytes = lanes * np.dtype(dt).itemsize
        n_table = mb * 1024 * 1024 // row_bytes
        if dt == np.float32:
            table = jnp.asarray(rng.random((n_table, lanes), dtype=np.float32))
        else:
            table = jnp.asarray(
                rng.integers(0, np.iinfo(dt).max, (n_table, lanes)).astype(dt)
            )
        idx_list = [
            jnp.asarray(
                rng.integers(0, n_table, n_g).astype(np.int32).reshape(2040, 1024)
            )
            for _ in range(5)
        ]
        t = timeit_multi(g, table, idx_list)
        print(f"{label}: rows={n_table:7d} {t / n_g * 1e9:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
