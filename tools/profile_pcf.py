"""Isolate PCF cost components on TPU: LUT build vs window gather vs taps."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    S = 4000
    H, W = 1080, 1920
    key = jax.random.PRNGKey(0)
    smap = jax.random.uniform(key, (S, S), jnp.float32)
    # plausible in-range window starts
    starts = jax.random.randint(key, (H, W, 2), 0, S)

    sp = S + 4
    sq = (sp + 6) // 4

    @jax.jit
    def build_lut(smap):
        padded = jnp.pad(smap, 2, mode="wrap")
        padded2 = jnp.pad(padded, ((0, sq * 4 + 3 - sp), (0, sq * 4 + 3 - sp)))
        copies = []
        for sy in range(4):
            for sx in range(4):
                sub = padded2[sy : sy + sq * 4, sx : sx + sq * 4]
                copies.append(
                    sub.reshape(sq, 4, sq, 4).transpose(0, 2, 1, 3).reshape(sq, sq, 16)
                )
        return jnp.stack(copies).reshape(16 * sq * sq, 16)

    t = timeit(build_lut, smap)
    print(f"lut build (16 transposes): {t*1e3:8.2f} ms", flush=True)
    lut = jax.block_until_ready(build_lut(smap))

    @jax.jit
    def window_gather(lut, starts):
        sy = starts[..., 0]
        sx = starts[..., 1]
        copy = (sy % 4) * 4 + sx % 4
        q = (copy * sq + sy // 4) * sq + sx // 4
        return lut[q]

    t = timeit(window_gather, lut, starts)
    print(f"window gather (2M x 64B):  {t*1e3:8.2f} ms", flush=True)

    win = jax.block_until_ready(window_gather(lut, starts)).reshape(H, W, 4, 4)
    fr = jax.random.uniform(key, (H, W, 2), jnp.float32)

    @jax.jit
    def taps(window, fr):
        lx = 1.0 + fr[..., 0]
        ly = 1.0 + fr[..., 1]
        z = fr[..., 0] * 0.5 + 0.25
        rows = [window[..., r, :] for r in range(4)]

        def sel3(i, a, b, c):
            return jnp.where((i == 0)[..., None], a, jnp.where((i == 1)[..., None], b, c))

        def col(row4, i, off):
            cols = [row4[..., c] for c in range(4)]
            return jnp.where(i == 0, cols[0 + off], jnp.where(i == 1, cols[1 + off], cols[2 + off]))

        acc = jnp.zeros_like(z)
        for j in range(-2, 3):
            sy = ly + j * 0.4
            iy = jnp.floor(sy).astype(jnp.int32)
            fy = sy - iy
            row0 = sel3(iy, rows[0], rows[1], rows[2])
            row1 = sel3(iy, rows[1], rows[2], rows[3])
            for i in range(-2, 3):
                sx2 = lx + i * 0.4
                ix = jnp.floor(sx2).astype(jnp.int32)
                fx = sx2 - ix
                c00 = col(row0, ix, 0)
                c10 = col(row0, ix, 1)
                c01 = col(row1, ix, 0)
                c11 = col(row1, ix, 1)
                top = c00 + (c10 - c00) * fx
                bot = c01 + (c11 - c01) * fx
                closest = top + (bot - top) * fy
                acc = acc + jnp.where(z > closest, 1.0, 0.0)
        return acc / 25.0

    t = timeit(taps, win, fr)
    print(f"25 taps (selects+lerps):   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
