"""Probe: pin the warm-vs-cold gather model directly (docs/FLOORS.md).

One jitted program per table size, ordering-tied with optimization_barrier:

    g1 = table[idx]      # WARM: the previous iteration's g2 just touched it
    evict = big[idx2]    # streams ~300 MB through the cache
    g2 = table[idx]      # COLD: measured right after the eviction stream

Per-HLO trace times give g1 (warm) and g2 (cold) separately in the same
run.

Result (2026-08-21, v5e via axon): BOTH gathers 1.80 ns/row for 16-92 MB
tables (2.02 at 112 MB; the 5.94 ms entry in the output is the eviction
gather itself, 600k rows x 9.9). A 300 MB eviction stream does NOT slow
a small-table gather in isolation — the in-frame slow instances are
schedule-dependent, not explained by simple eviction (docs/FLOORS.md).

Usage: python tools/probe_gather_cold.py
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
    big_rows = 300 * 1024 * 1024 // 512
    big = jnp.asarray(
        rng.integers(0, 2**31 - 1, (big_rows, 128), np.int64).astype(np.int32)
    )
    idx2 = jnp.asarray(rng.integers(0, big_rows, 600_000, dtype=np.int32))

    for mb in (16, 32, 64, 92, 112):
        rows = mb * 1024 * 1024 // 512
        table = jnp.asarray(
            rng.integers(0, 2**31 - 1, (rows, 128), np.int64).astype(np.int32)
        )
        idx = jnp.asarray(rng.integers(0, rows, pix, dtype=np.int32))

        def fn(t, i, b, i2):
            g1 = t[i]
            b2 = jax.lax.optimization_barrier((b, g1[0]))[0]
            ev = b2[i2]
            t2 = jax.lax.optimization_barrier((t, ev[0]))[0]
            g2 = t2[i]
            return g1[:1, :1], ev[:1, :1], g2[:1, :1]

        times = trace_op_times(fn, (table, idx, big, idx2))
        gs = sorted(
            (ms for name, ms in times.items()
             if ("gather" in name.lower() or "fusion" in name.lower())
             and ms * 1e6 / pix > 0.5),
            reverse=True,
        )
        # The two big-pix gathers are the two largest entries minus the
        # eviction gather (600k rows, ~6 ms — comparable; print all).
        pretty = ", ".join(f"{ms:7.3f}" for ms in gs[:4])
        print(f"{mb:4d} MB table: top gather ops [ms]: {pretty}", flush=True)


if __name__ == "__main__":
    main()
