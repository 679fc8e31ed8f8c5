"""Probe (VERDICT r4 next #2): could locality-grouped Pallas DMA replace the
two 2.09M-row per-pixel gathers (PCF window fusion.13 ~4.25 ms, tex/env tap
fusion.12 ~3.85 ms — both at the ~1.8-2.0 ns/row XLA gather issue floor)?

A DMA route must fetch one scattered 512 B row per pixel (the rows a pixel
needs are data-dependent; per-lane dynamic VMEM addressing does not exist on
the VPU, so "DMA a big slab then look up in VMEM" dies unless the slab is
tiny — probe_pcf_bbox round 3: per-camera-tile light-space footprints are
p50 29k / p90 304k texels, no rect fits VMEM). So the floor for the DMA
route is the per-descriptor issue cost of scattered single-row async copies.

This kernel issues K scattered (8, 128) row-group copies per grid step
(f32 VMEM tiles are (8, 128); single unaligned rows are not DMA-able, so a
row fetch really moves >= 4 KB — already 4x the gather's 1 KB/px traffic),
double-buffered across steps, indices computed in-kernel (no SMEM streaming
cost counted — a real implementation would also have to stream its index
arrays). Reported ns/row is the OPTIMISTIC floor: compare against the
measured ~1.8-2.0 ns/row of the XLA gathers.

Result (2026-08-21, v5e via axon): **~253-257 ns per descriptor** at
k=64/128 outstanding copies (the k=32 first row is polluted by a startup
outlier) vs 1.81-9.9 ns/row for XLA gathers — the DMA route is ~25-140x
off its competitor before counting the 8x traffic and index streaming.
Conclusively dead (VERDICT r4 next #2; docs/FLOORS.md).

Usage: python tools/probe_row_dma.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.probe_pair_gather import trace_op_times


def _kernel(table_hbm, out_ref, slab, sems, *, k: int, rows: int):
    step = pl.program_id(0)

    def idx(step, j):
        # Cheap in-kernel hash -> pseudo-random 8-aligned row-group starts.
        h = (step * k + j) * jnp.int32(-1640531535)  # 2654435761 as i32
        return jax.lax.rem(jnp.abs(h), jnp.int32(rows // 8 - 1)) * 8

    def start_all(step, slot):
        for j in range(k):
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx(step, j), 8)],
                slab.at[slot, j],
                sems.at[slot, j],
            ).start()

    def wait_all(step, slot):
        for j in range(k):
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx(step, j), 8)],
                slab.at[slot, j],
                sems.at[slot, j],
            ).wait()

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_all(step, slot)

    @pl.when(step + 1 < pl.num_programs(0))
    def _():
        start_all(step + 1, 1 - slot)

    wait_all(step, slot)
    acc = jnp.zeros((8, 128), jnp.float32)
    for j in range(k):
        acc = acc + slab[slot, j]
    out_ref[...] = acc


def main():
    assert jax.default_backend() == "tpu", "run on TPU"
    rng = np.random.default_rng(0)
    rows = 65536  # 32 MB table — comfortably in the fast gather tier
    table = jnp.asarray(rng.random((rows, 128), np.float32))

    for k, steps in ((32, 2048), (64, 1024), (128, 512)):
        fn = pl.pallas_call(
            functools.partial(_kernel, k=k, rows=rows),
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, k, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, k)),
            ],
        )
        times = trace_op_times(lambda t: fn(t), (table,))
        # The program is a single custom call — take the largest device op
        # (names vary across runtime versions).
        tot = max(times.values(), default=0.0)
        n = k * steps
        # Each "row fetch" moves an 8-row group; a per-pixel consumer needs
        # one logical row -> report per DESCRIPTOR and per logical row.
        print(
            f"k={k:4d} steps={steps:5d}: {tot:7.3f} ms  "
            f"{tot * 1e6 / n:7.1f} ns/descriptor "
            f"(vs ~1.8-2.0 ns/row XLA gather floor; 8x traffic on top)"
        )


if __name__ == "__main__":
    main()
