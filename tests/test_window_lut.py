"""The Pallas window LUT must reproduce every 4x4 shadow window exactly."""

import numpy as np
import jax.numpy as jnp

from arctic_tpu.ops import shadow


def test_pcf_paths_bit_identical(rng):
    """LUT-based and runs-based PCF must agree bit-for-bit."""
    s = 64
    smap = jnp.asarray(rng.uniform(0.2, 0.8, (s, s)).astype(np.float32))
    xy = rng.uniform(-1.2, 1.2, (300, 2)).astype(np.float32)
    z = rng.uniform(-0.1, 1.1, (300, 1)).astype(np.float32)
    lsp = jnp.asarray(np.concatenate([xy, z, np.ones((300, 1), np.float32)], 1))
    a = np.asarray(shadow.pcf_shadow(smap, lsp, use_lut=True))
    b = np.asarray(shadow.pcf_shadow(smap, lsp, use_lut=False))
    np.testing.assert_array_equal(a, b)


def test_window_lut_exact(rng):
    s = 64
    smap = rng.uniform(0.1, 0.9, (s, s)).astype(np.float32)
    lutp, xb = shadow.build_window_lut(jnp.asarray(smap))
    lut = np.asarray(lutp)
    padded = np.pad(smap, 2, mode="wrap")
    # Check a spread of window origins, including borders and odd phases.
    for y in [0, 1, 2, 3, 5, 17, s - 1, s]:
        for x in [0, 1, 2, 3, 8, 33, s - 1, s]:
            row, k2, yoff, xoff = shadow.window_row_index(y, x, xb)
            block = lut[row, 64 * k2 : 64 * k2 + 64].reshape(8, 8)
            got = block[yoff : yoff + 4, xoff : xoff + 4]
            want = padded[y : y + 4, x : x + 4]
            np.testing.assert_array_equal(got, want, err_msg=f"window ({y},{x})")


def _quantize(m):
    return np.floor(np.clip(m.astype(np.float32) * 65535.0 + 0.5, 0, 65535)).astype(
        np.uint32
    )


def test_window_lut_q_exact(rng):
    """Quantized-LUT blocks must hold the u16-rounded padded map exactly."""
    s = 64
    smap = rng.uniform(0.1, 0.9, (s, s)).astype(np.float32)
    lutp, xb = shadow.build_window_lut_q(jnp.asarray(smap))
    lut = np.asarray(lutp).view(np.uint32)
    padded = _quantize(np.pad(smap, 2, mode="wrap"))
    for y in [0, 1, 2, 3, 5, 11, 12, 17, 23, s - 1, s]:
        for x in [0, 1, 2, 3, 8, 33, s - 1, s]:
            row, k2, yoff, xoff = shadow.window_row_index_q(y, x, xb)
            # lanes [64*k2, +64): 16 rows x 4 packed lanes; texels
            # (2c, 2c+1) at lane 4r + c.
            half = lut[row, 64 * k2 : 64 * k2 + 64].reshape(16, 4)
            block = np.empty((16, 8), np.uint32)
            block[:, 0::2] = half & 0xFFFF
            block[:, 1::2] = half >> 16
            got = block[yoff : yoff + 4, xoff : xoff + 4]
            want = padded[y : y + 4, x : x + 4]
            # The kernel's fused f32 mul-add may round 1 ulp differently
            # from numpy at exact .5 boundaries — allow one quantum.
            diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
            assert diff.max() <= 1, f"window ({y},{x})"


def test_pcf_quant_paths_bit_identical(rng):
    """On a map of exact u16 multiples, quantization is the identity, so
    the quantized LUT path must match the runs path bit-for-bit."""
    s = 64
    smap = jnp.asarray(
        (rng.integers(0, 65536, (s, s)) / 65535.0).astype(np.float32)
    )
    xy = rng.uniform(-1.2, 1.2, (300, 2)).astype(np.float32)
    z = rng.uniform(-0.1, 1.1, (300, 1)).astype(np.float32)
    lsp = jnp.asarray(np.concatenate([xy, z, np.ones((300, 1), np.float32)], 1))
    a = np.asarray(shadow.pcf_shadow(smap, lsp, use_lut=True, quant=True))
    b = np.asarray(shadow.pcf_shadow(smap, lsp, use_lut=False))
    np.testing.assert_array_equal(a, b)
