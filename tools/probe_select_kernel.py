"""Probe: validate the Mosaic ops the select+interp kernel relies on.

Checks, on the current backend (TPU or CPU interpret):
  1. dot_general contracting dim0 x dim0 (rows^T @ onehot) compiles
  2. per-operand precision tuple (HIGHEST, DEFAULT) gives EXACT selection
  3. sublane slices at 8-aligned offsets
  4. in-kernel (A, 128) -> (128, A) transpose
  5. grid-step overhead at raster-like tile counts
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
GROUPS = 8  # 1024-pixel tile = 8 lane groups


def kernel(seg_start_ref, seg_len_ref, rows_hbm, iref, out_ref, rows_vmem, sem):
    t = pl.program_id(0)
    start = seg_start_ref[t]
    n = seg_len_ref[t]

    accs = [jnp.zeros((128, 128), jnp.float32) for _ in range(GROUPS)]
    num_chunks = pl.cdiv(n, CHUNK)

    def body(c, accs):
        copy = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * CHUNK, CHUNK)], rows_vmem, sem
        )
        copy.start()
        copy.wait()
        rows = rows_vmem[:, :]
        m = n - c * CHUNK
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        sid = rows[:, 9:10]  # (chunk, 1) slot ids, f32 value-encoded
        sid = jnp.where(k_iota < m, sid, -2.0)
        out = []
        for s in range(GROUPS):
            onehot = (sid == iref[0, s, :].reshape(1, 128).astype(jnp.float32)).astype(
                jnp.float32
            )
            acc = jax.lax.dot_general(
                rows,
                onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            out.append(accs[s] + acc)
        return out

    accs = jax.lax.fori_loop(0, num_chunks, body, accs)

    for s in range(GROUPS):
        acc = accs[s]  # (128 attrs, 128 px)
        # sublane slices + simple interp-like math
        a = acc[16:40, :] * acc[0:1, :] + acc[40:64, :] * acc[1:2, :]
        b = acc[64:88, :] * acc[2:3, :]
        blk = jnp.concatenate([a + b, acc[88:112, :], jnp.zeros((16, 128), jnp.float32)], axis=0)
        out_ref[0, pl.ds(128 * s, 128), :] = blk.T  # (64,128) -> (128,64)


def main():
    print("backend:", jax.default_backend())
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)

    num_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per_tile = 128
    cap = num_tiles * rows_per_tile + CHUNK
    table = rng.standard_normal((cap, 128)).astype(np.float32)
    # slot ids at lane 9: unique per row
    table[:, 9] = np.arange(cap, dtype=np.float32)
    seg_start = (np.arange(num_tiles) * rows_per_tile).astype(np.int32)
    seg_len = np.full(num_tiles, 100, np.int32)  # true length < chunk: tail masked
    iref = rng.integers(-1, cap, size=(num_tiles, GROUPS, 128)).astype(np.int32)
    # make most iref point into the tile's own segment
    own = seg_start[:, None, None] + rng.integers(0, 100, size=iref.shape)
    use_own = rng.random(iref.shape) < 0.9
    iref = np.where(use_own, own, iref).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, GROUPS, 128), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, GROUPS * 128, 64), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, GROUPS * 128, 64), jnp.float32),
        interpret=interpret,
    )
    fn = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn(jnp.asarray(seg_start), jnp.asarray(seg_len), jnp.asarray(table), jnp.asarray(iref))
    out_np = np.asarray(out)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s  out {out_np.shape}")

    # reference in numpy
    ref = np.zeros_like(out_np)
    for t in range(num_tiles):
        seg = table[seg_start[t] : seg_start[t] + seg_len[t]]
        sid = seg[:, 9].astype(np.int64)
        lut = {int(v): i for i, v in enumerate(sid)}
        for s in range(GROUPS):
            for p in range(128):
                k = lut.get(int(iref[t, s, p]))
                acc = seg[k] if k is not None else np.zeros(128, np.float32)
                a = acc[16:40] * acc[0] + acc[40:64] * acc[1] + acc[64:88] * acc[2]
                ref[t, 128 * s + p, :24] = a
                ref[t, 128 * s + p, 24:48] = acc[88:112]
    exact = np.array_equal(out_np, ref)
    print("EXACT match:", exact)
    if not exact:
        bad = np.argwhere(out_np != ref)
        print("mismatches:", len(bad), "first:", bad[:5])
        i = tuple(bad[0])
        print("got", out_np[i], "want", ref[i])

    # timing at scale
    for _ in range(2):
        out = fn(jnp.asarray(seg_start), jnp.asarray(seg_len), jnp.asarray(table), jnp.asarray(iref))
    np.asarray(out)[0, 0, 0]
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(jnp.asarray(seg_start), jnp.asarray(seg_len), jnp.asarray(table), jnp.asarray(iref))
    np.asarray(out.ravel()[0:1])
    dt = (time.perf_counter() - t0) / 5
    print(f"steady: {dt*1e3:.2f} ms for {num_tiles} tiles -> {dt/num_tiles*1e6:.1f} us/tile")


if __name__ == "__main__":
    main()
