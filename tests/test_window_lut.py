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


def test_window_lut_q_y_range(rng):
    """A banded build must reproduce the full build exactly on every row a
    window with start_y inside the band can gather (steps outside are
    skipped and hold garbage — callers never gather them)."""
    s = 96
    smap = jnp.asarray(rng.uniform(0.1, 0.9, (s, s)).astype(np.float32))
    full, xb = shadow.build_window_lut_q(smap)
    band_lo, band_hi = 30, 70
    part, xb2 = shadow.build_window_lut_q(
        smap, y_range=jnp.asarray([band_lo, band_hi], jnp.int32)
    )
    assert xb == xb2
    full_np, part_np = np.asarray(full), np.asarray(part)
    qys = sorted({y // 12 for y in range(band_lo, band_hi + 1)})
    for qy in qys:
        rows = slice(qy * 16 * xb, (qy + 1) * 16 * xb)
        np.testing.assert_array_equal(part_np[rows], full_np[rows])
    # The band must actually skip something (step 2 covers start_y >= 96).
    skipped = slice((s // 12) * 16 * xb, ((s // 12) + 1) * 16 * xb)
    assert not np.array_equal(part_np[skipped], full_np[skipped])


def _step_map(rng, s=96):
    """Shadow map with large flat lit/shadowed regions and a noisy band:
    classification must fire on the flats and fall through on the band."""
    m = np.full((s, s), 0.9, np.float32)
    m[:, : s // 3] = 0.1
    band = slice(s // 3, 2 * s // 3)
    m[:, band] = rng.uniform(0.1, 0.9, (s, s // 3)).astype(np.float32)
    return m


def _cluster_lsp(rng, s, k=64):
    """k clusters of 128 spatially-local light-space points — the shape the
    fused path's 128-px rows have (64x2-pixel tile strips map to compact
    light-space footprints). Cluster thirds: lit (left flat, shallow z),
    shadowed (right flat, deep z), penumbra (noise band / mixed z), plus
    out-of-frustum sprinkles."""
    uc = rng.uniform(0.08, 0.92, k).astype(np.float32)
    vc = rng.uniform(0.08, 0.92, k).astype(np.float32)
    kind = np.arange(k) % 3  # 0 lit, 1 shadowed, 2 penumbra
    uc[kind == 0] = rng.uniform(0.05, 0.25, (kind == 0).sum())  # left flat
    uc[kind == 1] = rng.uniform(0.75, 0.95, (kind == 1).sum())  # right flat
    uc[kind == 2] = rng.uniform(0.40, 0.60, (kind == 2).sum())  # noise band
    u = np.clip(uc[:, None] + rng.uniform(-0.02, 0.02, (k, 128)), 0.001, 0.999)
    v = np.clip(vc[:, None] + rng.uniform(-0.02, 0.02, (k, 128)), 0.001, 0.999)
    zc = np.where(kind == 0, 0.05, np.where(kind == 1, 0.95, 0.5))
    x = (u * 2.0 - 1.0).astype(np.float32)
    y = ((1.0 - v) * 2.0 - 1.0).astype(np.float32)
    z = np.broadcast_to(zc[:, None], (k, 128)).astype(np.float32).copy()
    x[0, :8] = 3.0  # out of frustum
    z[1, :8] = 1.5  # z > 1
    return x, y, z


def test_pcf_classify_bit_identical(rng):
    """row_cap (pyramid classification + row compaction) must not change a
    single bit of any consumed pixel vs the plain quant-LUT path."""
    s = 96
    smap = jnp.asarray(_step_map(rng, s))
    x, y, z = _cluster_lsp(rng, s)
    plain = np.asarray(
        shadow.pcf_shadow_proj(smap, x, y, z, use_lut=True, quant=True)
    )
    # Generous cap: no overflow; result must be exactly equal everywhere
    # (care=None means only out-of-frustum pixels are don't-care, and both
    # paths force those to 0).
    got, rows = shadow.pcf_shadow_proj(
        smap, x, y, z, use_lut=True, quant=True, row_cap=4096, with_rows=True
    )
    np.testing.assert_array_equal(np.asarray(got), plain)
    n_rows = (x.size + (-x.size % 4096)) // 128
    assert 0 < int(rows) <= n_rows // 2, (
        f"classification fired on too few rows ({int(rows)}/{n_rows} "
        "penumbra) — the flat-region clusters must classify"
    )


def test_pcf_classify_care_mask(rng):
    """care=False pixels may get any value; care=True pixels stay exact."""
    s = 96
    smap = jnp.asarray(_step_map(rng, s))
    x, y, z = _cluster_lsp(rng, s)
    care = jnp.asarray(rng.uniform(size=x.shape) < 0.7)
    plain = np.asarray(
        shadow.pcf_shadow_proj(smap, x, y, z, use_lut=True, quant=True)
    )
    got = np.asarray(
        shadow.pcf_shadow_proj(
            smap, x, y, z, use_lut=True, quant=True, row_cap=4096, care=care
        )
    )
    m = np.asarray(care)
    np.testing.assert_array_equal(got[m], plain[m])


def test_pcf_classify_overflow_is_counted(rng):
    """A too-small row_cap must report MORE penumbra rows than the cap so
    pipeline.check_stats can make the wrong-values case loud."""
    s = 96
    smap = jnp.asarray(_step_map(rng, s))
    x, y, z = _cluster_lsp(rng, s, k=128)  # >= 33 penumbra clusters
    _, rows = shadow.pcf_shadow_proj(
        smap, x, y, z, use_lut=True, quant=True, row_cap=1, with_rows=True
    )
    assert int(rows) > shadow.effective_row_cap(x.size, 1)


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
