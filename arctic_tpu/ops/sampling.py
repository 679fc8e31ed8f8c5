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

import jax
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


def sample_atlas(atlas, region: Array, uv: Array) -> Array:
    """Sample an atlas sub-texture bilinearly with per-texture WRAP.

    ``atlas`` is a TextureAtlas: images are packed with a 1-texel *wrapped*
    border (pack_atlas) and the quad table holds four parity-shifted copies
    of every 2x2 texel block, so one bilinear footprint = ONE 16-channel row
    gather — the difference between XLA's fast embedding-lookup path and 4
    scalar gathers per tap. region rows are (y, x, h, w) with (y, x) the
    padded block origin and (h, w) the logical size; wrap addressing is
    exact for arbitrary uv (first texel index mod the logical size; the
    border supplies the +1 neighbour).
    """
    ry = region[..., 0].astype(jnp.int32)
    rx = region[..., 1].astype(jnp.int32)
    rh = region[..., 2].astype(jnp.int32)
    rw = region[..., 3].astype(jnp.int32)
    t_x = uv[..., 0] * rw - 0.5
    t_y = uv[..., 1] * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = (t_x - ix0)[..., None]
    fy = (t_y - iy0)[..., None]
    ys = ry + iy0 % rh + 1  # +1: skip the top/left border row
    xs = rx + ix0 % rw + 1
    bh, bw = atlas.block_grid
    copy = (ys % 2) * 2 + xs % 2
    q = (copy * bh + ys // 2) * bw + xs // 2
    win = atlas.quads[q].astype(jnp.float32)  # (..., 16)
    c00 = win[..., 0:4]
    c10 = win[..., 4:8]
    c01 = win[..., 8:12]
    c11 = win[..., 12:16]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample_atlas_multi(atlas, regions: Array, uv: Array) -> Array:
    """Sample N sub-textures at the same uv in ONE batched quad gather.

    regions: (..., N, 4); returns (..., N, 4) RGBA — used for the material's
    diffuse/normal/metal-roughness trio (one gather op instead of three).
    """
    ry = regions[..., 0].astype(jnp.int32)
    rx = regions[..., 1].astype(jnp.int32)
    rh = regions[..., 2].astype(jnp.int32)
    rw = regions[..., 3].astype(jnp.int32)
    t_x = uv[..., 0, None] * rw - 0.5
    t_y = uv[..., 1, None] * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = (t_x - ix0)[..., None]
    fy = (t_y - iy0)[..., None]
    ys = ry + iy0 % rh + 1
    xs = rx + ix0 % rw + 1
    bh, bw = atlas.block_grid
    copy = (ys % 2) * 2 + xs % 2
    q = (copy * bh + ys // 2) * bw + xs // 2  # (..., N)
    win = atlas.quads[q].astype(jnp.float32)  # (..., N, 16)
    top = win[..., 0:4] + (win[..., 4:8] - win[..., 0:4]) * fx
    bot = win[..., 8:12] + (win[..., 12:16] - win[..., 8:12]) * fx
    return top + (bot - top) * fy


def sample_quads_flat(quads, block_grid, ry, rx, rh, rw, u, v) -> Array:
    """Bilinear tap from a quad-packed atlas, FLAT channel output.

    quads rows are [c00(C), c10(C), c01(C), c11(C)]; region fields and u/v
    are same-shaped arrays (or scalars). Returns (..., C) lerped channels
    with no rank-raising reshapes — the fused channel-first shading path
    slices individual channels out, keeping every hot array's minor dim the
    pixel dim (rank-5 (..., 4, n, 4) intermediates cost ~32 ms/frame in XLA
    layout copies at 1080p).
    """
    c = quads.shape[-1] // 4
    ry = jnp.asarray(ry).astype(jnp.int32)
    rx = jnp.asarray(rx).astype(jnp.int32)
    rh = jnp.asarray(rh).astype(jnp.int32)
    rw = jnp.asarray(rw).astype(jnp.int32)
    t_x = u * rw - 0.5
    t_y = v * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = (t_x - ix0)[..., None]
    fy = (t_y - iy0)[..., None]
    ys = ry + iy0 % rh + 1
    xs = rx + ix0 % rw + 1
    bh, bw = block_grid
    copy = (ys % 2) * 2 + xs % 2
    q = (copy * bh + ys // 2) * bw + xs // 2
    win = quads[q]  # (..., 4C) in the table's dtype (bf16 for materials)
    # Barrier before the f32 convert: XLA otherwise converts the full
    # gathered rows first and relayouts them channel-first in f32 (2x the
    # bytes of doing both on the bf16 data).
    win = jax.lax.optimization_barrier(win).astype(jnp.float32)
    top = win[..., :c] + (win[..., c : 2 * c] - win[..., :c]) * fx
    bot = win[..., 2 * c : 3 * c] + (win[..., 3 * c :] - win[..., 2 * c : 3 * c]) * fx
    return top + (bot - top) * fy


def sample_quads_packed(
    quads_packed, block_grid, ry, rx, rh, rw, u, v, channels: int = 4
) -> Array:
    """sample_quads_flat against a dense 8-quads-per-128-lane-row table.

    A (Q, 16) f32 quad table is tile-padded 16 -> 128 lanes by XLA (8x the
    memory, so 2M-row gathers run HBM-latency-bound at ~17 ns/row); packing
    8 quads per physical row makes the table dense and the same gather runs
    at cache speed. The quad index q selects row q//8 and lane group q%8.
    """
    c = channels
    ry = jnp.asarray(ry).astype(jnp.int32)
    rx = jnp.asarray(rx).astype(jnp.int32)
    rh = jnp.asarray(rh).astype(jnp.int32)
    rw = jnp.asarray(rw).astype(jnp.int32)
    t_x = u * rw - 0.5
    t_y = v * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = (t_x - ix0)[..., None]
    fy = (t_y - iy0)[..., None]
    ys = ry + iy0 % rh + 1
    xs = rx + ix0 % rw + 1
    bh, bw = block_grid
    copy = (ys % 2) * 2 + xs % 2
    q = (copy * bh + ys // 2) * bw + xs // 2
    row = quads_packed[q // 8]  # (..., 128) in the table's dtype
    k = q % 8
    w16 = 4 * c
    win = row[..., 0:w16]
    for kk in range(1, 8):
        win = jnp.where(
            (k == kk)[..., None], row[..., w16 * kk : w16 * (kk + 1)], win
        )
    # Keep the table dtype (bf16) through the extraction/relayout — the
    # layout copy then moves half the bytes; texels convert exactly to f32
    # for the lerp.
    win = jax.lax.optimization_barrier(win).astype(jnp.float32)
    top = win[..., :c] + (win[..., c : 2 * c] - win[..., :c]) * fx
    bot = win[..., 2 * c : 3 * c] + (win[..., 3 * c :] - win[..., 2 * c : 3 * c]) * fx
    return top + (bot - top) * fy


def sample_atlas_combined(atlas, region: Array, uv: Array) -> Array:
    """Sample the combined-slot atlas: ONE row gather yields every texture
    slot's bilinear footprint at once.

    region: (..., 4) the material's combined-atlas rect; returns
    (..., len(atlas.combined_slots), 4) RGBA, same order as combined_slots.
    """
    n = len(atlas.combined_slots)
    ry = region[..., 0].astype(jnp.int32)
    rx = region[..., 1].astype(jnp.int32)
    rh = region[..., 2].astype(jnp.int32)
    rw = region[..., 3].astype(jnp.int32)
    t_x = uv[..., 0] * rw - 0.5
    t_y = uv[..., 1] * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = (t_x - ix0)[..., None, None]
    fy = (t_y - iy0)[..., None, None]
    ys = ry + iy0 % rh + 1
    xs = rx + ix0 % rw + 1
    bh, bw = atlas.combined_block_grid
    copy = (ys % 2) * 2 + xs % 2
    q = (copy * bh + ys // 2) * bw + xs // 2
    win = atlas.combined_quads[q].astype(jnp.float32)  # (..., 16 * n)
    win = win.reshape(win.shape[:-1] + (4, n, 4))  # (..., texel, slot, rgba)
    c00, c10, c01, c11 = (win[..., i, :, :] for i in range(4))
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def srgb_to_linear(c: Array) -> Array:
    """IEC sRGB EOTF, the decode D3D applies to _SRGB formats."""
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: Array) -> Array:
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _tap_resolve_kernel(
    rows_ref, tq_ref, eq_ref, tfx_ref, tfy_ref, efx_ref, efy_ref, out_ref,
    *, c4: int,
):
    """Per-pixel quad select + bilinear lerp for the merged texture+
    environment gather, in VMEM.

    The XLA form relayouted the gathered (P, 128) bf16 rows pixel-minor
    (1.66 ms/frame at 1080p) and ran the tq%per / eq%8 slice selects as
    strided fusions (~1.6 ms more).  Here the rows stay lane-minor: one
    in-register f32 transpose per block turns every quad candidate into a
    sublane slice, and only the lerped channels (c4/4 + 4 planes) leave.
    Arithmetic matches sample_quads_flat/_packed exactly (convert bf16->f32
    commutes with the selects, the lerp order is identical)."""
    per = 128 // c4
    c = c4 // 4
    x = rows_ref[...].astype(jnp.float32)  # (bpx, 128)
    xt = jnp.swapaxes(x, 0, 1)  # (128, bpx)
    tq = tq_ref[...]  # (1, bpx) i32 in [0, per)
    twin = xt[0:c4, :]
    for kk in range(1, per):
        twin = jnp.where(tq == kk, xt[c4 * kk : c4 * (kk + 1), :], twin)
    tfx = tfx_ref[...]
    tfy = tfy_ref[...]
    top = twin[0:c] + (twin[c : 2 * c] - twin[0:c]) * tfx
    bot = twin[2 * c : 3 * c] + (twin[3 * c : 4 * c] - twin[2 * c : 3 * c]) * tfx
    tex = top + (bot - top) * tfy  # (c, bpx)
    eq = eq_ref[...]
    ewin = xt[0:16, :]
    for kk in range(1, 8):
        ewin = jnp.where(eq == kk, xt[16 * kk : 16 * kk + 16, :], ewin)
    efx = efx_ref[...]
    efy = efy_ref[...]
    etop = ewin[0:4] + (ewin[4:8] - ewin[0:4]) * efx
    ebot = ewin[8:12] + (ewin[12:16] - ewin[8:12]) * efx
    es = etop + (ebot - etop) * efy  # (4, bpx)
    parts = [tex, es]
    pad = 16 - (c + 4)
    if pad:
        parts.append(jnp.zeros((pad, x.shape[0]), jnp.float32))
    out_ref[...] = jnp.concatenate(parts, axis=0)


def tap_resolve(rows, tqk, eqk, tfx, tfy, efx, efy, c4: int, vma=()):
    """(P, 128) gathered merged rows -> (16, P) f32: lanes [0, c4/4) the
    lerped texture channels, [c4/4, c4/4+4) the lerped environment RGBA."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    p = rows.shape[0]
    bpx = min(4096, p)
    assert p % bpx == 0
    args = [a.reshape(1, p) for a in (tqk, eqk, tfx, tfy, efx, efy)]
    return pl.pallas_call(
        functools.partial(_tap_resolve_kernel, c4=c4),
        grid=(p // bpx,),
        in_specs=[pl.BlockSpec((bpx, 128), lambda i: (i, 0))]
        + [pl.BlockSpec((1, bpx), lambda i: (0, i))] * 6,
        out_specs=pl.BlockSpec((16, bpx), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, p), jnp.float32, vma=frozenset(vma)),
        interpret=jax.default_backend() != "tpu",
    )(rows, *args)


def pack_tex_rows(combined_quads: Array) -> Array:
    """(Nq, C4) combined-slot quad table -> (ceil(Nq/per), 128) gather rows,
    per = 128 // C4 quads per row (zero-padded lanes when C4 ∤ 128).

    Shared by pipeline.shade_gbuffer's merged texture+environment gather and
    io.build.build_buffers, which precomputes the merged table once per scene
    (rebuilding it per frame cost a 516 MB-traffic concatenate)."""
    c4 = combined_quads.shape[-1]
    per = 128 // c4
    nq_pad = -(-combined_quads.shape[0] // per) * per
    rows = jnp.pad(
        combined_quads, ((0, nq_pad - combined_quads.shape[0]), (0, 0))
    ).reshape(nq_pad // per, per * c4)
    if per * c4 < 128:
        rows = jnp.pad(rows, ((0, 0), (0, 128 - per * c4)))
    return rows


def quad_index(block_grid, ry, rx, rh, rw, u, v):
    """Shared index math of the quad samplers -> (q, fx, fy).

    Identical arithmetic to sample_quads_flat/_packed's prologue (bit-exact
    taps when a caller gathers the same quad row itself, e.g. the merged
    texture+environment gather in pipeline.shade_gbuffer).
    """
    ry = jnp.asarray(ry).astype(jnp.int32)
    rx = jnp.asarray(rx).astype(jnp.int32)
    rh = jnp.asarray(rh).astype(jnp.int32)
    rw = jnp.asarray(rw).astype(jnp.int32)
    t_x = u * rw - 0.5
    t_y = v * rh - 0.5
    ix0 = jnp.floor(t_x).astype(jnp.int32)
    iy0 = jnp.floor(t_y).astype(jnp.int32)
    fx = t_x - ix0
    fy = t_y - iy0
    ys = ry + iy0 % rh + 1
    xs = rx + ix0 % rw + 1
    bh, bw = block_grid
    copy = (ys % 2) * 2 + xs % 2
    q = (copy * bh + ys // 2) * bw + xs // 2
    return q, fx, fy


def lerp_quad(win: Array, fx, fy) -> Array:
    """Bilinear lerp of a gathered f32 [c00|c10|c01|c11] quad window."""
    c = win.shape[-1] // 4
    fx = fx[..., None]
    fy = fy[..., None]
    top = win[..., :c] + (win[..., c : 2 * c] - win[..., :c]) * fx
    bot = win[..., 2 * c : 3 * c] + (win[..., 3 * c :] - win[..., 2 * c : 3 * c]) * fx
    return top + (bot - top) * fy
