"""Probe: is there a table-size cliff for (N, 128) full-row gathers at all?

probe_pair_gather measured 1.81 ns/row for 33-92 MB tables in ANY index
pattern — contradicting the round-3 tier numbers (5.3 ns <= 96 MB /
13.4 ns >= 126 MB, which were measured on different shapes). The textured
mode's ~600 MB tile atlas is the customer: if big-table full-row gathers
also run at ~1.8 ns/row, its 17.4 fps has a different explanation.

Usage: python tools/probe_gather_cliff.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.probe_pair_gather import trace_op_times


def main():
    assert jax.default_backend() == "tpu", "run on TPU"
    rng = np.random.default_rng(0)
    pix = 2088960  # 1080p pixel-block count

    def t_ns(label, fn, args, n):
        times = trace_op_times(fn, args)
        tot = 0.0
        for name, ms in times.items():
            low = name.lower()
            if "gather" in low or "fusion" in low or "dynamic" in low:
                tot += ms
        print(f"{label:44s} {tot:7.3f} ms  {tot * 1e6 / n:6.2f} ns/row")

    if "--range" in sys.argv:
        # Does the tier depend on the OPERAND size or the index RANGE
        # actually touched? 320 MB table, indices confined to a prefix.
        rows = 320 * 1024 * 1024 // 512
        table = jnp.asarray(
            rng.integers(0, 2**31 - 1, (rows, 128), np.int64).astype(np.int32)
        )
        for mb_r in (64, 96, 160, 320):
            sub = mb_r * 1024 * 1024 // 512
            idx = jnp.asarray(rng.integers(0, sub, pix, dtype=np.int32))
            t_ns(
                f"320 MB table, {mb_r:3d} MB range",
                lambda t, i: t[i], (table, idx), pix,
            )
        # And: a SLICE of the big table as the operand (first mb_r MB).
        for mb_r in (64, 96):
            sub = mb_r * 1024 * 1024 // 512
            idx = jnp.asarray(rng.integers(0, sub, pix, dtype=np.int32))
            t_ns(
                f"320 MB table[:{mb_r} MB] slice operand",
                lambda t, i: t[:sub][i], (table, idx), pix,
            )
        return

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64, 128, 192, 320, 640]
    for mb in sizes:
        rows = mb * 1024 * 1024 // 512
        table = jnp.asarray(
            rng.integers(0, 2**31 - 1, (rows, 128), np.int64).astype(np.int32)
        )
        idx_r = jnp.asarray(rng.integers(0, rows, pix, dtype=np.int32))
        # Screen-coherent: smooth ramp + small jitter (the uv/window pattern).
        coh = np.clip(
            (np.linspace(0, rows - 1, pix) + rng.integers(-64, 64, pix)).astype(
                np.int32
            ),
            0,
            rows - 1,
        )
        idx_c = jnp.asarray(coh)
        t_ns(f"{mb:4d} MB i32 random", lambda t, i: t[i], (table, idx_r), pix)
        t_ns(f"{mb:4d} MB i32 coherent", lambda t, i: t[i], (table, idx_c), pix)
        del table, idx_r, idx_c


if __name__ == "__main__":
    main()
