"""Validate the two unknowns of the u32-packed window LUT (v3) design.

1. Gather tier at the EXACT v3 table size (88 MB u32x128) plus the v3b
   alternative (106 MB) — the cliff is known to sit somewhere in
   (96, 126) MB (probe_gather2 / probe_gather_u16).
2. Mosaic kernel support for the pack sequence: f32 -> u32 convert,
   shift/or packing, u32 VMEM store.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])


def gather_probe():
    rng = np.random.default_rng(0)
    n_g = 2_088_960

    @jax.jit
    def g(table, idx):
        return table[idx]

    for mb in (80, 88, 96, 106, 112):
        n_table = mb * 1024 * 1024 // 512
        table = jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, (n_table, 128), dtype=np.int64).astype(
                np.int32
            )
        )
        idx_list = [
            jnp.asarray(
                rng.integers(0, n_table, n_g).astype(np.int32).reshape(2040, 1024)
            )
            for _ in range(5)
        ]
        for _ in range(1):
            out = g(table, idx_list[0])
        _sync(out)
        t0 = time.perf_counter()
        for idx in idx_list:
            out = g(table, idx)
        _sync(out)
        t = (time.perf_counter() - t0) / len(idx_list)
        print(f"u32x128 {mb:3d}MB: rows={n_table:7d} {t / n_g * 1e9:5.2f} ns/row",
              flush=True)


def pack_kernel(a_ref, b_ref, o_ref):
    # Mosaic has no f32->u32 cast; pack in i32 (identical bit pattern) and
    # let consumers use logical shifts.
    qa = jnp.clip(a_ref[...] * 65535.0 + 0.5, 0.0, 65535.0).astype(jnp.int32)
    qb = jnp.clip(b_ref[...] * 65535.0 + 0.5, 0.0, 65535.0).astype(jnp.int32)
    o_ref[...] = qa | (qb << 16)


def mosaic_probe():
    a = jnp.asarray(np.random.default_rng(1).random((256, 128), np.float32))
    b = jnp.asarray(np.random.default_rng(2).random((256, 128), np.float32))
    out = pl.pallas_call(
        pack_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
    )(a, b)
    outn = np.asarray(out).view(np.uint32)
    ref = (
        np.clip(np.asarray(a) * 65535.0 + 0.5, 0, 65535).astype(np.uint32)
        | np.clip(np.asarray(b) * 65535.0 + 0.5, 0, 65535).astype(np.uint32) << 16
    )
    print("mosaic pack kernel:", "EXACT" if (outn == ref).all() else "MISMATCH",
          flush=True)
    # unpack + dequant on gathered rows (the consumer side, XLA)
    lo = (out & 0xFFFF).astype(jnp.float32) * (1.0 / 65535.0)
    hi = jax.lax.shift_right_logical(out, 16).astype(jnp.float32) * (1.0 / 65535.0)
    print("unpack lo ok:", bool(abs(np.asarray(lo) - np.asarray(a)).max() < 1e-4),
          "hi ok:", bool(abs(np.asarray(hi) - np.asarray(b)).max() < 1e-4))


if __name__ == "__main__":
    mosaic_probe()
    gather_probe()
