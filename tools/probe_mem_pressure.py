"""Probe: does the (N,128)-row gather tier depend on TOTAL resident HBM?

hlo_r5d textured: adding 613 MB of per-group tile tables (nothing else
changed) pushed the 92 MB PCF window-LUT gather from 4.2 ms to 23.0 ms
(11.0 ns/row — the slow tier) and the camera pair gather from 0.6 to 4.4.
This measures the SAME 92 MB-table, 2.09M-row gather with increasing
amounts of unrelated resident device memory.

Result (2026-08-21): **1.81 ns/row flat** from 1.2 GB to 3.7 GB resident
— total residency does NOT set the tier; the r5d textured slowdowns were
schedule-dependent instead (docs/FLOORS.md, probe_gather_cold).

Usage: python tools/probe_mem_pressure.py
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
    pix = 2088960
    rows = 92 * 1024 * 1024 // 512
    table = jnp.asarray(
        rng.integers(0, 2**31 - 1, (rows, 128), np.int64).astype(np.int32)
    )
    idx = jnp.asarray(rng.integers(0, rows, pix, dtype=np.int32))

    gather = jax.jit(lambda t, i: t[i])

    def t_ns(label):
        times = trace_op_times(gather, (table, idx))
        tot = 0.0
        for name, ms in times.items():
            low = name.lower()
            if "gather" in low or "fusion" in low or "dynamic" in low:
                tot += ms
        print(
            f"{label:42s} {tot:7.3f} ms  {tot * 1e6 / pix:6.2f} ns/row",
            flush=True,
        )

    # Ballast allocated ON DEVICE (a 600 MB host upload through the axon
    # tunnel takes minutes and is not what is being measured).
    zeros = jax.jit(lambda n: jnp.zeros((n,), jnp.float32), static_argnums=0)
    ballast = []
    t_ns("resident ~1.2 GB (table+idx+out only)")
    for add_mb in (300, 300, 300, 300, 600, 600):
        ballast.append(zeros(add_mb * 1024 * 1024 // 4))
        jax.block_until_ready(ballast[-1])
        total = sum(b.nbytes for b in ballast) / 1e9
        t_ns(f"+{total:4.1f} GB ballast")


if __name__ == "__main__":
    main()
