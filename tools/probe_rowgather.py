"""Probe: fix the shadow pass's 7.9 ms pair-row gather (fusion.5).

The per-HLO trace (r3g) shows `pack_raster_rows(setup)[sorted_slot]`
gathering (327816, 16) f32 at ~24 ns/row: XLA lays the in-graph
`jnp.stack(comps, 1)` table out COLUMN-major ({0,1:T(8,128)}) because that
makes the concat free, then every row gather touches two (8,128) tiles.
The camera pass's 128-lane shade_rows gather runs at ~7.8 ns/row.

Variants (all end in the (cap/8, 128) shape the raster kernel DMAs):
  v0_stack16     in-graph stack(comps,1) -> table[idx].reshape    (status quo)
  v1_barrier     + optimization_barrier on the table (layout forced?)
  v2_packed2d    table reshaped to dense (P/8, 128) -> two-coordinate
                 lax.gather of (1,16) slices at (idx//8, idx%8*16)
  v3_fullrow     packed[idx//8] full 128-lane rows (lower bound; drops
                 the %8 phase, NOT a correct replacement)
  v4_input16     gather from a (P,16) table passed as an INPUT (natural
                 {1,0} layout) — isolates build-layout vs gather cost

Run: python tools/probe_rowgather.py   (on the TPU box)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


P = 503816  # slot capacity + pad (bench shadow pass)
CAP = 327816  # tuned pair cap + DMA tail, 8-aligned
N_CHAIN = 4  # chained gathers per dispatch (identical dispatches measure ~0)


def chain(build_and_gather):
    """Repeat the gather with an input perturbation so dispatches chain."""

    def run(planes, idx):
        def body(c, _):
            rows = build_and_gather(planes, jnp.minimum(idx + c, P - 1))
            return (jnp.float32(0) * rows[0, 0]).astype(jnp.int32), None

        c, _ = lax.scan(body, jnp.int32(0), None, length=N_CHAIN)
        return c

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.random(P, dtype=np.float32)) for _ in range(16)]
    idx = jnp.asarray(rng.integers(0, P - 8, CAP).astype(np.int32))

    def v0(planes, idx):
        table = jnp.stack(planes, axis=1)
        return table[idx].reshape(-1, 128)

    def v1(planes, idx):
        table = lax.optimization_barrier(jnp.stack(planes, axis=1))
        return table[idx].reshape(-1, 128)

    def v2(planes, idx):
        table = jnp.stack(planes, axis=1).reshape(P // 8, 128)
        starts = jnp.stack([idx // 8, (idx % 8) * 16], axis=1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1)
        )
        out = lax.gather(table, starts, dn, slice_sizes=(1, 16))
        return out.reshape(-1, 128)

    def v3(planes, idx):
        table = jnp.stack(planes, axis=1).reshape(P // 8, 128)
        return table[idx // 8]

    variants = {"v0_stack16": v0, "v1_barrier": v1, "v2_packed2d": v2, "v3_fullrow": v3}
    for name, fn in variants.items():
        t, _ = timeit(chain(fn), planes, idx)
        per = t / N_CHAIN
        print(f"{name:12s} {per * 1e3:7.2f} ms  {per / CAP * 1e9:5.2f} ns/row", flush=True)

    # v4: table as an input (row-major natural layout), no in-graph build.
    table_np = np.stack([np.asarray(p) for p in planes], axis=1)
    table_in = jnp.asarray(table_np)

    def v4(table, idx):
        def body(c, _):
            rows = table[jnp.minimum(idx + c, P - 1)].reshape(-1, 128)
            return (jnp.float32(0) * rows[0, 0]).astype(jnp.int32), None

        c, _ = lax.scan(body, jnp.int32(0), None, length=N_CHAIN)
        return c

    t, _ = timeit(jax.jit(v4), table_in, idx)
    per = t / N_CHAIN
    print(f"{'v4_input16':12s} {per * 1e3:7.2f} ms  {per / CAP * 1e9:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()


def space_variants():
    """Does the table's producer (XLA fusion vs pallas vs input) change the
    gather rate? Hypothesis: XLA promotes small in-graph temps to S(1)
    (VMEM) where gathers run ~2x faster than from HBM."""
    import functools
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.random(P, dtype=np.float32)) for _ in range(16)]
    idx = jnp.asarray(rng.integers(0, P - 8, CAP).astype(np.int32))
    P8 = P // 8

    def timed(run, label, *args):
        for _ in range(2):
            out = run(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = run(*args)
        _sync(out)
        per = (time.perf_counter() - t0) / 8 / N_CHAIN
        print(f"{label:22s} {per * 1e3:7.2f} ms  {per / CAP * 1e9:5.2f} ns/row", flush=True)

    def chain(mk_table):
        def run(planes, idx):
            table = mk_table(planes)

            def body(c, _):
                rows = table[jnp.minimum(idx + c, P - 9) // 8]
                return (jnp.float32(0) * rows[0, 0]).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=N_CHAIN)
            return c

        return jax.jit(run)

    def xla_build(planes):
        return jnp.stack(planes, axis=1).reshape(P8, 128)

    def _tp_kernel(x_ref, out_ref):
        out_ref[...] = jnp.swapaxes(x_ref[...], 0, 1)

    def pallas_build(planes):
        lanes = [planes[j][u::8] for u in range(8) for j in range(16)]
        stacked = jnp.stack(lanes, axis=0)
        n = P8 - P8 % 512
        stacked = stacked[:, :n]  # probe shortcut: drop ragged tail rows
        return pl.pallas_call(
            _tp_kernel,
            grid=(n // 512,),
            in_specs=[pl.BlockSpec((128, 512), lambda i: (0, i))],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        )(stacked)

    idx_small = jnp.minimum(idx, (P8 - P8 % 512) * 8 - 9)
    timed(chain(xla_build), "xla_stack_reshape", planes, idx)
    timed(chain(pallas_build), "pallas_transpose", planes, idx_small)
    table_in = jnp.asarray(np.stack([np.asarray(x) for x in planes], 1).reshape(P8, 128))
    timed(chain(lambda _: table_in), "input_table", planes, idx)
    # barrier after XLA build (kills any fuse-into-gather / space promotion?)
    timed(chain(lambda pl_: jax.lax.optimization_barrier(xla_build(pl_))),
          "xla_build+barrier", planes, idx)


if __name__ == "__main__" and os.environ.get("SPACE"):
    space_variants()
