"""Texture sampling with D3D linear-wrap sampler semantics.

The reference uses one static MIN_MAG_MIP_LINEAR / WRAP sampler everywhere
(forward_pass.cpp:38-51, skybox_pass.cpp:34-41) and creates textures with a
single mip level, so sampling is plain bilinear filtering:

    t = uv * size - 0.5;  texel pair floor(t), floor(t)+1;  fractional lerp

with WRAP addressing applied per *texel* (each of the 4 taps wraps
independently). All material textures live in one 2D atlas; wrap arithmetic
happens in region-local texel space so each texture tiles within itself.

TPU note: these are pure gathers + VPU lerps; XLA fuses the weight math into
the surrounding shader. sRGB decode happens at atlas build time
(renderer.cpp:486 creates diffuse SRVs as R8G8B8A8_UNORM_SRGB, i.e. the
hardware decodes *before* filtering — pre-decoding texels is equivalent).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _bilinear_gather(data_flat: Array, row_stride: int, iy0, ix0, iy1, ix1, fy, fx, channels: int):
    """4-tap bilinear from a flattened (H*W, C) texture, indices pre-wrapped."""
    def tap(iy, ix):
        return data_flat[iy * row_stride + ix]

    c00 = tap(iy0, ix0)
    c10 = tap(iy0, ix1)
    c01 = tap(iy1, ix0)
    c11 = tap(iy1, ix1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample_bilinear_wrap(tex: Array, uv: Array) -> Array:
    """Sample a whole (H, W, C) texture at uv with linear filter + wrap."""
    h, w, c = tex.shape
    t_x = uv[..., 0] * w - 0.5
    t_y = uv[..., 1] * h - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = t_x - ix0
    fy = t_y - iy0
    out = _bilinear_gather(
        tex.reshape(h * w, c).astype(jnp.float32),
        w,
        iy0 % h,
        ix0 % w,
        (iy0 + 1) % h,
        (ix0 + 1) % w,
        fy,
        fx,
        c,
    )
    return out


def sample_atlas(atlas: Array, region: Array, uv: Array) -> Array:
    """Sample an atlas sub-texture bilinearly with per-texture WRAP.

    atlas: (AH, AW, C); region: (..., 4) i32 rows (y, x, h, w); uv: (..., 2).
    """
    ah, aw, c = atlas.shape
    ry = region[..., 0]
    rx = region[..., 1]
    rh = region[..., 2]
    rw = region[..., 3]
    t_x = uv[..., 0] * rw - 0.5
    t_y = uv[..., 1] * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = t_x - ix0
    fy = t_y - iy0
    # Wrap each tap inside its own region, then offset into the atlas.
    iy0w = ry + iy0 % rh
    iy1w = ry + (iy0 + 1) % rh
    ix0w = rx + ix0 % rw
    ix1w = rx + (ix0 + 1) % rw
    return _bilinear_gather(
        atlas.reshape(ah * aw, c).astype(jnp.float32), aw, iy0w, ix0w, iy1w, ix1w, fy, fx, c
    )


def srgb_to_linear(c: Array) -> Array:
    """IEC sRGB EOTF, the decode D3D applies to _SRGB formats."""
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: Array) -> Array:
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)
