"""Probe: Pallas kernel for the quantized-PCF window resolve.

The XLA form of the r16 extraction pays per-HLO-measured 3.28 ms to
relayout the gathered (P, 128) i32 rows pixel-minor (copy.1062) plus
4.47 ms for a 24-candidate select fusion that reads 1.5 KB/px of strided
slices (fusion.57).  In a kernel the gathered rows stay lane-minor, the
candidate slices are VMEM sublane slices after an in-register transpose,
and only the 64 B/px result crosses back to XLA.

Questions:
  1. Does Mosaic lower jnp.swapaxes on a (128, 128) 32-bit VMEM tile
     (the XU transpose), for i32 and/or f32-bitcast?
  2. Kernel wall time for 2.09M pixels vs the XLA select chain.

Run on TPU: python tools/probe_pcf_resolve.py
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


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def resolve_kernel(rows_ref, cand_ref, xoff_ref, out_ref, *, bpx: int):
    # rows_ref: (bpx, 128) i32, cand_ref/xoff_ref: (1, bpx) i32,
    # out_ref: (16, bpx) f32.
    n128 = bpx // 128
    cand = cand_ref[0, :]
    xoff = xoff_ref[0, :]
    outs = []
    for g in range(n128):
        x = rows_ref[128 * g : 128 * (g + 1), :]  # (128 px, 128 lanes)
        xt = jnp.swapaxes(x, 0, 1)  # (128 lanes, 128 px) — the probe's Q1
        c = cand[128 * g : 128 * (g + 1)].reshape(1, 128)
        # 24-way candidate select on sublane slices of the transposed tile.
        r16 = xt[0:16, :]
        for k in range(1, 24):
            h, yy = divmod(k, 12)
            o = 64 * h + 4 * yy
            r16 = jnp.where(c == k, xt[o : o + 16, :], r16)
        dq = jnp.float32(1.0 / 65535.0)
        lo = (r16 & 0xFFFF).astype(jnp.float32) * dq  # (16, 128)
        hi = jax.lax.shift_right_logical(r16, 16).astype(jnp.float32) * dq
        xo = xoff[128 * g : 128 * (g + 1)].reshape(1, 128)
        podd = (xo & 1) == 1
        q1 = (xo >> 1) == 1
        cols = []
        for r in range(4):
            for j in range(4):
                a_pl, b_pl = ((lo, hi), (hi, lo))[j % 2]
                ja, jb = j // 2, (j + 1) // 2
                a = jnp.where(
                    q1, a_pl[4 * r + ja + 1 : 4 * r + ja + 2, :],
                    a_pl[4 * r + ja : 4 * r + ja + 1, :],
                )
                b = jnp.where(
                    q1, b_pl[4 * r + jb + 1 : 4 * r + jb + 2, :],
                    b_pl[4 * r + jb : 4 * r + jb + 1, :],
                )
                cols.append(jnp.where(podd, b, a))  # (1, 128)
        outs.append(jnp.concatenate(cols, axis=0))  # (16, 128)
    out_ref[...] = jnp.concatenate(outs, axis=1)


def resolve_kernel_wide(rows_ref, cand_ref, xoff_ref, out_ref, *, bpx: int):
    # One transpose + one wide select chain over all bpx pixels (lane dim
    # bpx, 16 lane-tiles at 2048): fewer, fuller VPU ops than per-128 loops.
    x = rows_ref[...]  # (bpx, 128)
    xt = jnp.swapaxes(x, 0, 1)  # (128, bpx)
    c = cand_ref[...]  # (1, bpx)
    xo = xoff_ref[...]
    r16 = xt[0:16, :]
    for k in range(1, 24):
        h, yy = divmod(k, 12)
        o = 64 * h + 4 * yy
        r16 = jnp.where(c == k, xt[o : o + 16, :], r16)
    dq = jnp.float32(1.0 / 65535.0)
    lo = (r16 & 0xFFFF).astype(jnp.float32) * dq
    hi = jax.lax.shift_right_logical(r16, 16).astype(jnp.float32) * dq
    podd = (xo & 1) == 1
    q1 = (xo >> 1) == 1
    for r in range(4):
        for j in range(4):
            a_pl, b_pl = ((lo, hi), (hi, lo))[j % 2]
            ja, jb = j // 2, (j + 1) // 2
            a = jnp.where(
                q1, a_pl[4 * r + ja + 1 : 4 * r + ja + 2, :],
                a_pl[4 * r + ja : 4 * r + ja + 1, :],
            )
            b = jnp.where(
                q1, b_pl[4 * r + jb + 1 : 4 * r + jb + 2, :],
                b_pl[4 * r + jb : 4 * r + jb + 1, :],
            )
            out_ref[4 * r + j : 4 * r + j + 1, :] = jnp.where(podd, b, a)


def run_kernel_wide(rows, cand, xoff, bpx):
    p = rows.shape[0]
    grid = p // bpx
    return pl.pallas_call(
        functools.partial(resolve_kernel_wide, bpx=bpx),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bpx, 128), lambda i: (i, 0)),
            pl.BlockSpec((1, bpx), lambda i: (0, i)),
            pl.BlockSpec((1, bpx), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((16, bpx), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, p), jnp.float32),
    )(rows, cand.reshape(1, p), xoff.reshape(1, p))


def run_kernel(rows, cand, xoff, bpx):
    p = rows.shape[0]
    grid = p // bpx
    return pl.pallas_call(
        functools.partial(resolve_kernel, bpx=bpx),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bpx, 128), lambda i: (i, 0)),
            pl.BlockSpec((1, bpx), lambda i: (0, i)),
            pl.BlockSpec((1, bpx), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((16, bpx), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, p), jnp.float32),
    )(rows, cand.reshape(1, p), xoff.reshape(1, p))


def xla_chain(rows, cand, xoff):
    # Mirror of the current shadow.py chain (for a timing baseline).
    k2 = cand // 12
    yoff = cand % 12
    r16 = rows[:, 0:16]
    for k in range(1, 24):
        h, yy = divmod(k, 12)
        o = 64 * h + 4 * yy
        r16 = jnp.where((cand == k)[:, None], rows[:, o : o + 16], r16)
    dq = jnp.float32(1.0 / 65535.0)
    lo = (r16 & 0xFFFF).astype(jnp.float32) * dq
    hi = jax.lax.shift_right_logical(r16, 16).astype(jnp.float32) * dq
    podd = (xoff & 1) == 1
    q1 = (xoff >> 1) == 1
    cols = []
    for r in range(4):
        for j in range(4):
            a_pl, b_pl = ((lo, hi), (hi, lo))[j % 2]
            ja, jb = j // 2, (j + 1) // 2
            a = jnp.where(q1, a_pl[:, 4 * r + ja + 1], a_pl[:, 4 * r + ja])
            b = jnp.where(q1, b_pl[:, 4 * r + jb + 1], b_pl[:, 4 * r + jb])
            cols.append(jnp.where(podd, b, a))
    return jnp.stack(cols, axis=0)  # (16, P)


def main():
    print("backend:", jax.default_backend(), flush=True)
    p = 2088960
    # Generate ON DEVICE: a (P, 128) i32 host array is ~1 GB through the
    # axon tunnel (minutes of transfer).
    k0, k1, k2k = jax.random.split(jax.random.PRNGKey(0), 3)
    rows = jax.random.randint(k0, (p, 128), 0, 2**31 - 1, jnp.int32)
    cand = jax.random.randint(k1, (p,), 0, 24, jnp.int32)
    xoff = jax.random.randint(k2k, (p,), 0, 4, jnp.int32)
    rows.block_until_ready()
    print("data ready", flush=True)

    for runner, bpx in (
        (run_kernel, 2048),
        (run_kernel_wide, 1024),
        (run_kernel_wide, 2048),
        (run_kernel_wide, 4096),
    ):
        name = runner.__name__
        try:
            f = jax.jit(functools.partial(runner, bpx=bpx))
            out = f(rows, cand, xoff)
            _sync(out)
        except Exception as e:
            print(f"{name} bpx={bpx}: FAIL {type(e).__name__}: {str(e)[:300]}")
            continue
        # correctness (device-side compare; avoid hauling 134 MB out)
        want = jax.jit(xla_chain)(rows[:512], cand[:512], xoff[:512])
        ok = bool(jnp.all(out[:, :512] == want))
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(rows, cand, xoff)
        _sync(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name} bpx={bpx}: {dt*1e3:7.3f} ms  exact={ok}", flush=True)

    g = jax.jit(xla_chain)
    out = g(rows, cand, xoff)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(rows, cand, xoff)
    _sync(out)
    print(f"xla chain:  {(time.perf_counter() - t0) / 10 * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
