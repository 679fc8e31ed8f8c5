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
    wx = jnp.floor(tx).astype(jnp.int32) - 1
    wy = jnp.floor(ty).astype(jnp.int32) - 1
    offs = jnp.arange(4, dtype=jnp.int32)
    rows = (wy[..., None] + offs) % s  # (..., 4)
    cols = (wx[..., None] + offs) % s
    flat = rows[..., :, None] * s + cols[..., None, :]  # (..., 4, 4)
    window = shadow_map.reshape(-1)[flat]  # (..., 4, 4)

    lx = tx - wx.astype(jnp.float32)  # local coords in the window, in [1, 2)
    ly = ty - wy.astype(jnp.float32)
    shadow = jnp.zeros_like(tx)
    for j in range(-2, 3):  # y offset
        sy = ly + j * step
        iy = jnp.floor(sy).astype(jnp.int32)
        fy = sy - iy
        for i in range(-2, 3):  # x offset
            sx = lx + i * step
            ix = jnp.floor(sx).astype(jnp.int32)
            fx = sx - ix
            c00 = jnp.take_along_axis(
                window.reshape(*window.shape[:-2], 16),
                (iy * 4 + ix)[..., None],
                axis=-1,
            )[..., 0]
            c10 = jnp.take_along_axis(
                window.reshape(*window.shape[:-2], 16),
                (iy * 4 + ix + 1)[..., None],
                axis=-1,
            )[..., 0]
            c01 = jnp.take_along_axis(
                window.reshape(*window.shape[:-2], 16),
                ((iy + 1) * 4 + ix)[..., None],
                axis=-1,
            )[..., 0]
            c11 = jnp.take_along_axis(
                window.reshape(*window.shape[:-2], 16),
                ((iy + 1) * 4 + ix + 1)[..., None],
                axis=-1,
            )[..., 0]
            top = c00 + (c10 - c00) * fx
            bot = c01 + (c11 - c01) * fx
            closest = top + (bot - top) * fy
            shadow = shadow + jnp.where(z > closest, 1.0, 0.0)
    shadow = shadow / 25.0
    return jnp.where(outside, 0.0, shadow)
