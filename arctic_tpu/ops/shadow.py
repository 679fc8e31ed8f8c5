"""Shadow-map PCF — exact reproduction of calculate_shadow (forward.hlsl:68-96).

Quirks preserved deliberately (they are visible in the reference's output):
- bias is 0 (forward.hlsl:81: the commented-out slope bias is NOT used)
- PCF taps at fixed +-2 * 0.0001 *UV* offsets regardless of map size
  (forward.hlsl:88), i.e. 0.4 texels apart on the 4000^2 map
- each tap is a *bilinear* fetch of the depth map through the linear-wrap
  sampler (SampleLevel with s_sampler, forward.hlsl:89) — depth values are
  filtered before comparison
- points outside the light frustum (z > 1 or uv outside [0,1]) return 0 (lit)
- taps near the border can wrap to the opposite edge (WRAP addressing)

TPU formulation: the 25 taps span ±0.8 texels + 1 texel bilinear support, so
all taps read from one 4x4 texel window per pixel — we gather the window once
(16 gathers instead of 100) and evaluate every bilinear tap arithmetically,
bit-equivalent to 25 independent SampleLevel calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

PCF_UV_STEP = 0.0001  # forward.hlsl:88


def pcf_shadow(shadow_map: Array, light_space_pos: Array) -> Array:
    """Fraction of occluded PCF taps in [0, 1] per pixel.

    shadow_map: (S, S) f32 depth from the sun pass (cleared to 1.0).
    light_space_pos: (..., 4) clip-space position under the sun's proj_view.
    """
    s = shadow_map.shape[0]
    assert shadow_map.shape == (s, s)
    w = light_space_pos[..., 3]
    proj = light_space_pos[..., :3] / w[..., None]
    u = proj[..., 0] * 0.5 + 0.5
    v = 1.0 - (proj[..., 1] * 0.5 + 0.5)
    z = proj[..., 2]
    outside = (z > 1.0) | (u < 0.0) | (v < 0.0) | (u > 1.0) | (v > 1.0)

    # Texel-space center tap (D3D: t = uv * size - 0.5).
    tx = u * s - 0.5
    ty = v * s - 0.5
    step = PCF_UV_STEP * s  # texels between adjacent taps

    # 4x4 window that contains all 25 bilinear taps (valid while step <= 0.5).
    # The map is padded by 2 wrapped texels per side so the window is one
    # contiguous (4, 4) sliced gather (fast path) with exact WRAP semantics.
    wx = jnp.floor(tx).astype(jnp.int32) - 1
    wy = jnp.floor(ty).astype(jnp.int32) - 1
    padded = jnp.pad(shadow_map, 2, mode="wrap")
    sp = s + 4
    # Pack every aligned 4-texel x-run into one 16-byte row, for all 16
    # (row-class k = y%4, x-shift sx = x%4) combinations. Built with strided
    # slices + contiguous reshapes only — XLA defers transposes to consumers,
    # which made a fully-interleaved 4x4 LUT cost ~170 ms/frame; these
    # slices stream at bandwidth. The window fetch is then 4 row gathers.
    yq = (sp + 3 + 3) // 4
    xq = (sp + 3 + 3) // 4
    padded2 = jnp.pad(padded, ((0, yq * 4 - sp), (0, xq * 4 + 3 - sp)))
    classes = []
    for k in range(4):
        for sx in range(4):
            classes.append(
                padded2[k::4, sx : sx + 4 * xq].reshape(yq, xq, 4)
            )
    runs = jnp.stack(classes).reshape(16 * yq * xq, 4)
    start_y = jnp.clip(wy + 2, 0, s)
    start_x = jnp.clip(wx + 2, 0, s)
    sx_c = start_x % 4
    qx = start_x // 4
    y = start_y[..., None] + jnp.arange(4)  # (..., 4) window rows
    idx = (((y % 4) * 4 + sx_c[..., None]) * yq + y // 4) * xq + qx[..., None]
    window = runs[idx]  # one batched gather -> (..., 4, 4)

    lx = tx - wx.astype(jnp.float32)  # local coords in the window, in [1, 2)
    ly = ty - wy.astype(jnp.float32)

    # Window rows/cols are selected with exact 3-way selects (tap texel
    # indices can only be 0..2 while |offset| <= 0.8 texels + bilinear),
    # keeping the lerp arithmetic bit-identical to SampleLevel and avoiding
    # data-dependent gathers entirely.
    rows = [window[..., r, :] for r in range(4)]  # each (..., 4)

    def sel3(i, a, b, c):
        return jnp.where((i == 0)[..., None], a, jnp.where((i == 1)[..., None], b, c))

    def col(row4, i, off):
        cols = [row4[..., c] for c in range(4)]
        return jnp.where(
            i == 0, cols[0 + off], jnp.where(i == 1, cols[1 + off], cols[2 + off])
        )

    shadow = jnp.zeros_like(tx)
    for j in range(-2, 3):  # y offset
        sy = ly + j * step
        iy = jnp.floor(sy).astype(jnp.int32)
        fy = sy - iy
        row0 = sel3(iy, rows[0], rows[1], rows[2])
        row1 = sel3(iy, rows[1], rows[2], rows[3])
        for i in range(-2, 3):  # x offset
            sx = lx + i * step
            ix = jnp.floor(sx).astype(jnp.int32)
            fx = sx - ix
            c00 = col(row0, ix, 0)
            c10 = col(row0, ix, 1)
            c01 = col(row1, ix, 0)
            c11 = col(row1, ix, 1)
            top = c00 + (c10 - c00) * fx
            bot = c01 + (c11 - c01) * fx
            closest = top + (bot - top) * fy
            shadow = shadow + jnp.where(z > closest, 1.0, 0.0)
    shadow = shadow / 25.0
    return jnp.where(outside, 0.0, shadow)
