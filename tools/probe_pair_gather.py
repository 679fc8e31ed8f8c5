"""Probe: why does the shadow pair-row gather (fusion.11, r5 entry 1.54 ms,
4.7 ns/row) run ~2.3x slower per row than the in-frame PCF window gather
(2.0 ns/row) when its table is only ~34 MB?

Variants measured standalone via per-HLO traces (microbenchmarks through
the axon tunnel are invalid below ~5 ms, so each variant runs enough rows
to be trace-visible and we read the device op time):
  a. exact replica: packed (P/8, 128) f32 table, idx = tile-sorted slots
     (runs of ~8 consecutive idx//8 values), g = packed[idx // 8]
  b. same but indices precomputed on device (no fused //8 arithmetic)
  c. random indices (locality control)
  d. ascending indices (perfect locality control)
  e. i32 table bitcast (dtype control)
  f. half-cap gather (row-count scaling control)
  g. fused phase-resolve consumer (the in-frame op also feeds a kernel)

Usage: python tools/probe_pair_gather.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def trace_op_times(fn, args, n_iters=3):
    """Run fn(args) under jax.profiler.trace, return {op_name: ms} per run."""
    import glob
    import gzip
    import json
    import tempfile

    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix="probe_trace_")
    with jax.profiler.trace(td):
        for _ in range(n_iters):
            out = fn_j(*args)
        np.asarray(out[0] if isinstance(out, (tuple, list)) else out)[:1]
    times = {}
    for p in glob.glob(f"{td}/**/*.trace.json.gz", recursive=True):
        with gzip.open(p, "rt") as f:
            tr = json.load(f)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "")
                times[name] = times.get(name, 0.0) + ev["dur"] / 1000.0 / n_iters
    return times


def main():
    assert jax.default_backend() == "tpu", "run on TPU"
    rng = np.random.default_rng(0)

    cap = 327680 + 2048  # bench shadow cap + DMA tail
    p_total = 528384  # packed slot count at bench capacity (multiple of 4096)
    rows = p_total // 8
    table = jnp.asarray(rng.random((rows, 128), np.float32))

    # Tile-sorted slot pattern: ascending runs with tile jumps, like the
    # binned pair list (sorted by tile, slot-ascending within tile).
    n_tiles = 4000
    raw = np.sort(rng.integers(0, p_total - 8, size=cap).astype(np.int32))
    per_tile = np.array_split(raw, n_tiles)
    idx_sorted_tiles = np.concatenate([np.sort(t) for t in per_tile])
    idx = jnp.asarray(idx_sorted_tiles)
    idx_div = idx // 8
    idx_rand = jnp.asarray(rng.integers(0, rows, size=cap, dtype=np.int32))
    idx_asc = jnp.asarray(
        np.sort(rng.integers(0, rows, size=cap, dtype=np.int32))
    )
    table_i32 = jax.lax.bitcast_convert_type(table, jnp.int32)

    def t_ns(label, fn, args, n):
        times = trace_op_times(fn, args)
        tot = 0.0
        for name, ms in sorted(times.items(), key=lambda kv: -kv[1]):
            low = name.lower()
            if "gather" in low or "fusion" in low or "dynamic" in low:
                tot += ms
        print(f"{label:34s} {tot:7.3f} ms  {tot * 1e6 / n:6.2f} ns/row")
        return tot

    t_ns("a. replica idx//8 (fused)", lambda t, i: t[i // 8], (table, idx), cap)
    t_ns("b. precomputed idx_div", lambda t, i: t[i], (table, idx_div), cap)
    t_ns("c. random idx", lambda t, i: t[i], (table, idx_rand), cap)
    t_ns("d. ascending idx", lambda t, i: t[i], (table, idx_asc), cap)
    t_ns("e. i32 table, idx_div", lambda t, i: t[i], (table_i32, idx_div), cap)
    t_ns(
        "f. half rows", lambda t, i: t[i], (table, idx_div[: cap // 2]), cap // 2
    )
    # g. wider table (2x rows) — does table size matter at this scale?
    table2 = jnp.concatenate([table, table], axis=0)
    t_ns("g. 2x table, idx_div", lambda t, i: t[i], (table2, idx_div), cap)

    # In-frame context variants: the bench's fusion.11 replica above runs
    # 1.81 ns/row standalone but 4.7 in-frame — reproduce the frame's
    # producer/consumer structure around the SAME gather.
    from arctic_tpu.ops.raster_tiles import (
        _phase_resolve_kernel,
        gather_pair_rows16,
        pack_raster_rows_packed,
    )
    import jax.numpy as jnp2  # noqa: F401
    from jax.experimental import pallas as pl

    comps16 = [jnp.asarray(rng.random(p_total, np.float32)) for _ in range(16)]

    # i. operand produced by the real Pallas pack kernel (not a parameter).
    def with_pack(idx):
        packed = pack_raster_rows_packed(comps16, p_total)
        return packed[idx // 8]

    t_ns("i. pallas-produced operand", with_pack, (idx,), cap)

    # j. gather feeding the real phase-resolve Pallas kernel.
    def with_consumer(t, idx):
        n = idx.shape[0]
        g = t[idx // 8]
        out = pl.pallas_call(
            _phase_resolve_kernel,
            grid=(n // 2048,),
            in_specs=[
                pl.BlockSpec((2048, 128), lambda i: (i, 0)),
                pl.BlockSpec((1, 2048), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((256, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n // 8, 128), jnp.float32),
        )(g, (idx % 8).reshape(1, n))
        return out

    idx8 = idx[: cap // 2048 * 2048]
    t_ns("j. + phase-resolve consumer", with_consumer, (table, idx8), idx8.shape[0])

    # k. the full in-frame helper (pack kernel + gather + resolve kernel).
    def full(idx):
        packed = pack_raster_rows_packed(comps16, p_total)
        return gather_pair_rows16(packed, idx)

    t_ns("k. full gather_pair_rows16", full, (idx8,), idx8.shape[0])

    # l. gather with the sort in-graph (indices produced by lax.sort).
    def with_sort(t, raw):
        sp = jax.lax.sort(raw)
        return t[(sp & 0xFFFFF) // 8]

    t_ns(
        "l. sort-produced indices",
        with_sort,
        (table, jnp.asarray(idx_sorted_tiles)), cap,
    )
    # h. the in-frame shape: 2.09M coherent rows from a 92 MB i32 table
    big_rows = 171072
    big = jnp.asarray(rng.integers(0, 2**31 - 1, (big_rows, 128), np.int64).astype(np.int32))
    pix = 2088960
    jr = np.clip(
        (rng.random(pix) * big_rows * 0.9 + rng.random(pix) * 100).astype(np.int32),
        0, big_rows - 1,
    )
    t_ns(
        "h. 92MB i32, 2.09M semi-coherent",
        lambda t, i: t[i], (big, jnp.asarray(jr)), pix,
    )


if __name__ == "__main__":
    main()
