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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

PCF_UV_STEP = 0.0001  # forward.hlsl:88


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _select_mats() -> jnp.ndarray:
    """(4, 128, 512) 0/1 selection matrices: S[r, 4w+cc, 16w+4r+cc] = 1.

    A (Xb, 128) @ (128, 512) matmul with S[r] scatters each 128-column
    source block's texels into its 32 windows' 16-lane rows at row-slot r —
    a lane interleave done on the MXU. Each output lane receives exactly ONE
    input, so the result is bit-exact even through the multi-pass f32 matmul
    (a 24-bit mantissa splits exactly into three bf16 passes; x*1 and the
    non-overlapping adds are exact)."""
    import numpy as np

    s = np.zeros((4, 128, 512), np.float32)
    for r in range(4):
        for w in range(32):
            for cc in range(4):
                s[r, 4 * w + cc, 16 * w + 4 * r + cc] = 1.0
    # Stored f32: Mosaic faults on this kernel when the VMEM operand is held
    # in bf16 and upcast in-kernel for the small-xb f32 matmul path
    # (observed: TPU worker crash at shadow_size 512 even with the bf16
    # matmul guarded out). The bf16 path downcasts in-kernel instead — the
    # 0/1 entries convert exactly.
    return jnp.asarray(s)


def _lut_kernel(in4_hbm, smat_ref, out_ref, slab, sems, *, xb: int, sq8: int):
    # One step builds windows for 32 consecutive qy rows (132 shared source
    # rows) — batching amortizes the per-step DMA/dispatch overhead that
    # dominated a one-qy-per-step version. The slab DMA is double-buffered
    # across grid steps (each step's source is independent).
    sy = pl.program_id(0)
    sx = pl.program_id(1)
    q = pl.program_id(2)
    step = (sy * 4 + sx) * sq8 + q
    total = 16 * sq8
    slot = jax.lax.rem(step, 2)

    def dma(st, sl):
        # Decode (sy, sx, q) of step ``st`` (grid iterates q fastest).
        qq = jax.lax.rem(st, sq8)
        rest = st // sq8
        sxx = jax.lax.rem(rest, 4)
        syy = rest // 4
        return pltpu.make_async_copy(
            in4_hbm.at[sxx, pl.ds(128 * qq + syy, 132)], slab.at[sl], sems.at[sl]
        )

    @pl.when(step == 0)
    def _():
        dma(step, slot).start()

    @pl.when(step + 1 < total)
    def _():
        dma(step + 1, 1 - slot).start()

    dma(step, slot).wait()

    # Stack g window-rows per matmul so M = g * xb fills the systolic array
    # (per-j M == xb wastes 3/4 of the MXU rows at xb == 32 and quadruples
    # the instruction count).
    g = max(1, min(32, 128 // xb))
    while 32 % g:
        g -= 1
    for j0 in range(0, 32, g):
        acc = jnp.zeros((g * xb, 512), jnp.float32)
        for r in range(4):
            x = jnp.concatenate(
                [slab[slot, 4 * (j0 + jj) + r] for jj in range(g)], axis=0
            )  # (g * xb, 128)
            # Manual 3-way bf16 split of the f32 depths (24-bit mantissa =
            # 3 x 8 bits, exact; the one-hot smat is exact in bf16 and each
            # output lane receives exactly one product) — bit-identical to
            # Precision.HIGHEST at half its MXU passes (3 vs 6).
            hi = x.astype(jnp.bfloat16)
            r1 = x - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            smat_bf16 = smat_ref[r].astype(jnp.bfloat16)
            for part in (hi, mid, lo):
                acc = acc + jax.lax.dot_general(
                    part,
                    smat_bf16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        # Emit in the consumer's final (rows, 128) gather layout directly
        # (row = j * 4xb + g128 * xb + b, see window_row_index) — the old
        # (..., xb, 512) output needed a 1 GB XLA reshape+copy per frame.
        for jj in range(g):
            for g128 in range(4):
                out_ref[0, pl.ds((j0 + jj) * 4 * xb + g128 * xb, xb), :] = acc[
                    jj * xb : (jj + 1) * xb, 128 * g128 : 128 * (g128 + 1)
                ]


def window_row_index(start_y, start_x, sq8: int, xb: int):
    """Packed-LUT location of the 4x4 window at padded coords (y, x).

    Returns (row, k): the window's 16 lanes live at [16*k, 16*k + 16) of
    lut[row]. Mirrors the _lut_kernel store order: grid block
    (cls*sq8 + qy//32), then row-in-block (qy%32)*4*xb + ((qx%32)//8)*xb
    + qx//32, where cls = (y%4)*4 + x%4, qy = y//4, qx = x//4.
    """
    cls = (start_y % 4) * 4 + start_x % 4
    qy = start_y // 4
    qx = start_x // 4
    row = ((cls * sq8 + qy // 32) * 32 + qy % 32) * 4 * xb + (
        (qx % 32) // 8
    ) * xb + qx // 32
    return row, qx % 8


def build_window_lut(shadow_map: Array) -> tuple[Array, int, int]:
    """All 4x4 windows of the (wrap-padded) shadow map, 8 per 128-lane row.

    Returns (lut (N, 128) f32, sq8, xb): the window starting at padded
    coords (y, x) lives at lanes [16k, 16k+16) (laid out [r*4+cc]) of row
    ``row`` with (row, k) = window_row_index(y, x, sq8, xb). Built by a
    Pallas kernel at streaming bandwidth directly in this gather layout
    (XLA's transpose-based construction costs ~170 ms/frame, and emitting
    an (..., xb, 512) shape cost a 1 GB reshape+copy per frame).
    """
    s = shadow_map.shape[0]
    sp = s + 4
    padded = jnp.pad(shadow_map, 2, mode="wrap")
    # 128-column source blocks, rounded up to a multiple of 8: the kernel's
    # HBM->VMEM slab is (132, xb, 128) and Mosaic faults when the
    # second-minor dim is not 8-aligned (f32 VMEM tiles are (8, 128); a
    # dense HBM source DMA'd into a padded VMEM layout crashes the TPU
    # worker — observed at shadow_size 512 where the tight count is 5).
    xb = _round_up(-(-(sp + 3) // 128), 8)
    sq = s // 4 + 1
    sq8 = -(-sq // 32)
    yp = 128 * sq8 + 8
    padded2 = jnp.pad(padded, ((0, yp - sp), (0, xb * 128 + 3 - sp)))
    # Four x-shifted contiguous views, 128 cols per MXU source block.
    in4 = jnp.stack(
        [padded2[:, sx : sx + xb * 128].reshape(yp, xb, 128) for sx in range(4)]
    )

    lut = pl.pallas_call(
        functools.partial(_lut_kernel, xb=xb, sq8=sq8),
        grid=(4, 4, sq8),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 128, 512), lambda *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 32 * 4 * xb, 128), lambda sy, sx, q: ((sy * 4 + sx) * sq8 + q, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((16 * sq8, 32 * 4 * xb, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 132, xb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(in4, _select_mats())
    return lut.reshape(-1, 128), sq8, xb


def pcf_shadow(shadow_map: Array, light_space_pos: Array, use_lut: bool | None = None) -> Array:
    """Fraction of occluded PCF taps in [0, 1] per pixel.

    shadow_map: (S, S) f32 depth from the sun pass (cleared to 1.0).
    light_space_pos: (..., 4) clip-space position under the sun's proj_view.
    """
    w = light_space_pos[..., 3]
    proj = light_space_pos[..., :3] / w[..., None]
    return pcf_shadow_proj(
        shadow_map, proj[..., 0], proj[..., 1], proj[..., 2], use_lut=use_lut
    )


def pcf_shadow_proj(
    shadow_map: Array, x: Array, y: Array, z: Array, use_lut: bool | None = None
) -> Array:
    """pcf_shadow on already-divided NDC components (channel-first callers
    pass the three (..., S) planes directly; the sun is orthographic so the
    fused path's interpolated xyz needs no divide)."""
    s = shadow_map.shape[0]
    assert shadow_map.shape == (s, s)
    u = x * 0.5 + 0.5
    v = 1.0 - (y * 0.5 + 0.5)
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
    start_y = jnp.clip(wy + 2, 0, s)  # padded-coords window origin
    start_x = jnp.clip(wx + 2, 0, s)

    # Gathers cost ~14 ns/row flat on TPU, so the one-row-per-window Pallas
    # LUT (2M rows/frame) beats the strided-runs path (4 rows per window,
    # 8M rows) once the LUT build is batched. The runs path remains for CPU
    # (pallas interpret mode is slow) — both are bit-identical (tested).
    if use_lut is None:
        use_lut = jax.default_backend() == "tpu"
    if use_lut:
        lutp, sq8, xb = build_window_lut(shadow_map)
        jrow, k = window_row_index(start_y, start_x, sq8, xb)
        # Out-of-frustum pixels return 0 without reading the map — point
        # their (discarded) window gathers at one cached row.
        jrow = jnp.where(outside, 0, jrow)
        row = lutp[jrow]  # (..., 128): 8 packed windows, one row gather
        window = row[..., 0:16]
        for kk in range(1, 8):
            window = jnp.where(
                (k == kk)[..., None], row[..., 16 * kk : 16 * kk + 16], window
            )  # flat (..., 16), lanes [r*4 + c]
        # Fence: without it XLA relayouts the gathered 128-lane rows (1 GB,
        # a 3.2 ms copy at 1080p) to channel-first before this extraction;
        # fencing makes the 8x smaller (..., 16) window the layout boundary.
        window = jax.lax.optimization_barrier(window)
    else:
        padded = jnp.pad(shadow_map, 2, mode="wrap")
        sp = s + 4
        yq = (sp + 3 + 3) // 4
        xq = (sp + 3 + 3) // 4
        padded2 = jnp.pad(padded, ((0, yq * 4 - sp), (0, xq * 4 + 3 - sp)))
        classes = []
        for kcl in range(4):
            for sx in range(4):
                classes.append(padded2[kcl::4, sx : sx + 4 * xq].reshape(yq, xq, 4))
        runs = jnp.stack(classes).reshape(16 * yq * xq, 4)
        sx_c = start_x % 4
        qx = start_x // 4
        yrow = start_y[..., None] + jnp.arange(4)  # (..., 4) window rows
        idx = (((yrow % 4) * 4 + sx_c[..., None]) * yq + yrow // 4) * xq + qx[..., None]
        window = runs[idx].reshape(start_y.shape + (16,))  # (..., 16) flat

    lx = tx - wx.astype(jnp.float32)  # local coords in the window, in [1, 2)
    ly = ty - wy.astype(jnp.float32)

    # Window rows/cols are selected with exact 3-way selects (tap texel
    # indices can only be 0..2 while |offset| <= 0.8 texels + bilinear),
    # keeping the lerp arithmetic bit-identical to SampleLevel and avoiding
    # data-dependent gathers entirely.
    rows = [window[..., 4 * r : 4 * r + 4] for r in range(4)]  # each (..., 4)

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
