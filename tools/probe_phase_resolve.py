"""Probe: phase-resolve kernel for the shadow pair-row gather fix.

Chain under test (replaces the 7.9 ms narrow-table gather, fusion.5):
  packed (P/8, 128) dense table  ->  G = packed[idx // 8]   (6.3 ns/row)
  ->  phase_resolve(G, idx % 8)  ->  (cap/8, 128) pair-packed rows
      (row r lanes [16u:16u+16) = the 16 comps of pair 8r+u)

The kernel mirrors tap_resolve: transpose the (bpx, 128) block in-register,
8-way sublane-slice select by the per-pair phase, transpose back, then
re-pack 8 pairs per row with static sublane/lane slices.

Correctness vs numpy, then TPU timing (chained dispatches).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _phase_resolve_kernel(g_ref, ph_ref, out_ref):
    x = g_ref[...]  # (bpx, 128) f32 full gathered rows
    xt = jnp.swapaxes(x, 0, 1)  # (128, bpx)
    ph = ph_ref[...]  # (1, bpx) i32 in [0, 8)
    y = xt[0:16, :]
    for b in range(1, 8):
        y = jnp.where(ph == b, xt[16 * b : 16 * b + 16, :], y)  # (16, bpx)
    # Pad to (128, bpx) so the backward transpose stays on full tiles.
    z = jnp.concatenate([y, jnp.zeros((112, x.shape[0]), jnp.float32)], axis=0)
    zt = jnp.swapaxes(z, 0, 1)  # (bpx, 128); comps at lanes [0:16)
    z3 = zt.reshape(zt.shape[0] // 8, 8, 128)
    for u in range(8):
        out_ref[:, 16 * u : 16 * (u + 1)] = z3[:, u, 0:16]


def phase_resolve(g, ph, bpx=1024, interpret=False):
    p = g.shape[0]
    assert p % bpx == 0 and bpx % 8 == 0
    return pl.pallas_call(
        _phase_resolve_kernel,
        grid=(p // bpx,),
        in_specs=[
            pl.BlockSpec((bpx, 128), lambda i: (i, 0)),
            pl.BlockSpec((1, bpx), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((bpx // 8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((p // 8, 128), jnp.float32),
        interpret=interpret,
    )(g, ph.reshape(1, p))


def main():
    rng = np.random.default_rng(0)
    P = 503816
    CAP = 327680 + 1024  # cap + tail, multiple of bpx
    interpret = jax.default_backend() != "tpu"

    planes = [rng.random(P, dtype=np.float32) for _ in range(16)]
    table = np.stack(planes, axis=1)  # (P, 16)
    idx = rng.integers(0, P - 8, CAP).astype(np.int32)

    packed = jnp.asarray(table.reshape(P // 8, 128))
    idxj = jnp.asarray(idx)

    # correctness (small slice)
    n = 4096
    g = packed[idxj[:n] // 8]
    out = np.asarray(phase_resolve(g, idxj[:n] % 8, bpx=1024, interpret=interpret))
    want = table[idx[:n]].reshape(n // 8, 128)
    ok = np.array_equal(out, want)
    print("correct:", ok, flush=True)
    if not ok:
        bad = np.argwhere(out != want)
        print("first mismatches:", bad[:5], out[tuple(bad[0])], want[tuple(bad[0])])
        return

    if interpret:
        return

    # timing: full chain (gather + resolve), chained dispatches
    N_CHAIN = 4

    @jax.jit
    def run(packed, idx):
        def body(c, _):
            i = jnp.minimum(idx + c, P - 9)
            rows = phase_resolve(packed[i // 8], i % 8, bpx=1024)
            return (jnp.float32(0) * rows[0, 0]).astype(jnp.int32), None

        c, _ = lax.scan(body, jnp.int32(0), None, length=N_CHAIN)
        return c

    def _sync(out):
        np.asarray(out)

    for _ in range(2):
        _sync(run(packed, idxj))
    t0 = time.perf_counter()
    for _ in range(8):
        out = run(packed, idxj)
    _sync(out)
    per = (time.perf_counter() - t0) / 8 / N_CHAIN
    print(f"gather+phase_resolve: {per * 1e3:7.2f} ms  {per / CAP * 1e9:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()


def _phase_select_kernel(g_ref, ph_ref, out_ref):
    """One-transpose variant: emit comp-major (16, cap); XLA repacks."""
    x = g_ref[...]
    xt = jnp.swapaxes(x, 0, 1)  # (128, bpx)
    ph = ph_ref[...]
    y = xt[0:16, :]
    for b in range(1, 8):
        y = jnp.where(ph == b, xt[16 * b : 16 * b + 16, :], y)
    out_ref[...] = y


def phase_select(g, ph, bpx=1024, interpret=False):
    p = g.shape[0]
    return pl.pallas_call(
        _phase_select_kernel,
        grid=(p // bpx,),
        in_specs=[
            pl.BlockSpec((bpx, 128), lambda i: (i, 0)),
            pl.BlockSpec((1, bpx), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((16, bpx), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, p), jnp.float32),
        interpret=interpret,
    )(g, ph.reshape(1, p))


def variants():
    rng = np.random.default_rng(0)
    P = 503816
    CAP = 327680 + 4096
    planes = [rng.random(P, dtype=np.float32) for _ in range(16)]
    table = np.stack(planes, axis=1)
    idx = rng.integers(0, P - 8, CAP).astype(np.int32)
    packed = jnp.asarray(table.reshape(P // 8, 128))
    idxj = jnp.asarray(idx)
    N_CHAIN = 4

    def timed(fn, label):
        run = jax.jit(fn)
        def _sync(out):
            np.asarray(out)
        for _ in range(2):
            _sync(run(packed, idxj))
        t0 = time.perf_counter()
        for _ in range(8):
            out = run(packed, idxj)
        _sync(out)
        per = (time.perf_counter() - t0) / 8 / N_CHAIN
        print(f"{label:28s} {per * 1e3:7.2f} ms  {per / CAP * 1e9:5.2f} ns/row", flush=True)

    def chain(body1):
        def run(packed, idx):
            def body(c, _):
                i = jnp.minimum(idx + c, P - 9)
                rows = body1(packed, i)
                return (jnp.float32(0) * rows.ravel()[0]).astype(jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=N_CHAIN)
            return c
        return run

    # gather only (bound)
    timed(chain(lambda p_, i: p_[i // 8]), "gather_only")
    for bpx in (512, 1024, 2048):
        timed(chain(lambda p_, i, bpx=bpx: phase_resolve(p_[i // 8], i % 8, bpx=bpx)),
              f"gather+resolve bpx={bpx}")
    for bpx in (1024, 2048, 4096):
        def f(p_, i, bpx=bpx):
            y = phase_select(p_[i // 8], i % 8, bpx=bpx)  # (16, cap)
            return jnp.swapaxes(y, 0, 1).reshape(-1, 128)  # XLA repack
        timed(chain(f), f"gather+select+xla bpx={bpx}")


if __name__ == "__main__" and os.environ.get("VARIANTS"):
    variants()
