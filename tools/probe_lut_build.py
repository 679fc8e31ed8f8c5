"""Microbench window-LUT build variants at 4000^2 (target layout:
8-row x 16-col blocks at (4, 8) strides, one block per 128-lane row)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


S = 4000
QY = S // 4 + 1
QX = S // 8 + 1
NEED_Y = 4 * (QY - 1) + 8
NEED_X = 8 * (QX - 1) + 16


def prep(smap):
    padded = jnp.pad(smap, 2, mode="wrap")
    return jnp.pad(padded, ((0, NEED_Y - (S + 4)), (0, NEED_X - (S + 4))))


def v0_pieces(smap):
    """Current shipped build (16 narrow reshapes + lane concat)."""
    p2 = prep(smap)
    pieces = []
    for r in range(8):
        rows = p2[r : r + 4 * (QY - 1) + 1 : 4]
        a = rows[:, : 8 * QX].reshape(QY, QX, 8)
        b = rows[:, 8 : 8 + 8 * QX].reshape(QY, QX, 8)
        pieces.append(jnp.concatenate([a, b], axis=-1))
    return jnp.concatenate(pieces, axis=-1).reshape(-1, 128)


def _cat_y(p2):
    """(QY, 8, NEED_X): row r of block qy = p2[4qy + r] — one healthy concat
    of two big stride-4 row groups."""
    g = p2[: 4 * (QY + 1)].reshape(-1, 4, NEED_X)  # (QY+1, 4, X)
    return jnp.concatenate([g[:QY], g[1 : QY + 1]], axis=1)  # (QY, 8, X)


def v1_transpose(smap):
    """cat-y, then x-windows via reshapes fused into one transpose."""
    p2 = prep(smap)
    p2 = jnp.pad(p2, ((0, 4 * (QY + 1) - NEED_Y), (0, 0)))
    cat = _cat_y(p2)  # (QY, 8, X)
    a = cat[:, :, : 8 * QX].reshape(QY, 8, QX, 8)
    b = cat[:, :, 8 : 8 + 8 * QX].reshape(QY, 8, QX, 8)
    w = jnp.concatenate([a, b], axis=-1)  # (QY, 8, QX, 16)
    return w.transpose(0, 2, 1, 3).reshape(-1, 128)


def v2_transpose_barrier(smap):
    p2 = prep(smap)
    p2 = jnp.pad(p2, ((0, 4 * (QY + 1) - NEED_Y), (0, 0)))
    cat = jax.lax.optimization_barrier(_cat_y(p2))
    a = cat[:, :, : 8 * QX].reshape(QY, 8, QX, 8)
    b = cat[:, :, 8 : 8 + 8 * QX].reshape(QY, 8, QX, 8)
    w = jnp.concatenate([a, b], axis=-1)
    return w.transpose(0, 2, 1, 3).reshape(-1, 128)


def v3_lane128(smap):
    """cat-y (QY, 8, X) -> transpose to (QY, X, 8)?? no: build via viewing
    x in 128-lane chunks and using roll-free slicing: out[qy, qx] row =
    lanes [16r + c]; try building as (QY*QX, 8, 16) then reshape."""
    p2 = prep(smap)
    p2 = jnp.pad(p2, ((0, 4 * (QY + 1) - NEED_Y), (0, 0)))
    cat = _cat_y(p2)  # (QY, 8, X)
    catt = jnp.swapaxes(cat, 1, 2)  # (QY, X, 8) — one big transpose
    catt = jax.lax.optimization_barrier(catt)
    a = catt[:, : 8 * QX].reshape(QY, QX, 8, 8)
    b = catt[:, 8 : 8 + 8 * QX].reshape(QY, QX, 8, 8)
    w = jnp.concatenate([a, b], axis=2)  # (QY, QX, 16, 8) [c-half, r]
    # lanes must be 16r + c: current is (c16, r8) -> transpose last two
    return jnp.swapaxes(w, 2, 3).reshape(-1, 128)


def main():
    rng = np.random.default_rng(0)
    smap = jnp.asarray(rng.random((S, S), dtype=np.float32))
    ref = None
    for name, fn in [
        ("v0_pieces", v0_pieces),
        ("v1_transpose", v1_transpose),
        ("v2_barrier", v2_transpose_barrier),
        ("v3_lane128", v3_lane128),
    ]:
        try:
            t, out = timeit(jax.jit(fn), smap)
            if ref is None:
                ref = np.asarray(out[:4096])
                ok = True
            else:
                ok = bool(np.array_equal(np.asarray(out[:4096]), ref))
            print(f"{name}: {t*1e3:8.2f} ms  match={ok}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
