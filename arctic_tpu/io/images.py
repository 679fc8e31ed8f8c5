"""Image IO: PNG/JPEG via PIL, Radiance HDR (RGBE) natively.

Replaces stb_image in the reference (stb_image_impl.cpp; stbi_load for LDR
textures app.cpp:247-280, stbi_loadf for the HDRI renderer.cpp:111-126).
The RGBE codec is implemented here (and in native/arctic_native.cpp as the
fast path) because PIL has no Radiance support.
"""

from __future__ import annotations

import os

import numpy as np


def load_ldr(path: str) -> np.ndarray:
    """Load an 8-bit image as (H, W, 4) u8 RGBA (stbi_load ..., 4)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(img)).save(path)


# ----------------------------- Radiance HDR --------------------------------


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) u8 RGBE -> (..., 3) f32 linear (stb __hdr_convert rule)."""
    rgbe = rgbe.astype(np.int32)
    e = rgbe[..., 3]
    scale = np.where(e > 0, np.ldexp(1.0, e - (128 + 8)), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def _float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    rgb = np.asarray(rgb, np.float32)
    maxc = rgb.max(axis=-1)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    nz = maxc >= 1e-32
    mant, exp = np.frexp(np.where(nz, maxc, 1.0))
    scale = mant * 256.0 / np.where(nz, maxc, 1.0)
    out[..., :3] = np.clip(rgb * (scale * nz)[..., None], 0, 255).astype(np.uint8)
    out[..., 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    return out


def load_hdr(path: str) -> np.ndarray:
    """Radiance .hdr (RGBE, RLE or flat) -> (H, W, 3) f32 linear."""
    if _native() is not None:
        try:
            return _native().load_hdr(path)
        except Exception:
            pass
    with open(path, "rb") as f:
        data = f.read()
    # Header: lines until blank, then resolution line.
    pos = 0

    def line():
        nonlocal pos
        end = data.index(b"\n", pos)
        s = data[pos:end]
        pos = end + 1
        return s

    magic = line()
    if not (magic.startswith(b"#?RADIANCE") or magic.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        ln = line()
        if ln == b"":
            break
    res = line().split()
    if res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res}")
    h, w = int(res[1]), int(res[3])

    img = np.zeros((h, w, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, count=len(data) - pos, offset=pos)
    bp = 0
    for y in range(h):
        if w < 8 or w > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2 or (buf[bp + 2] & 0x80):
            # Flat (or old-RLE, unsupported) scanline format.
            row = buf[bp : bp + w * 4].reshape(w, 4)
            img[y] = row
            bp += w * 4
            continue
        assert (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) == w
        bp += 4
        for c in range(4):
            x = 0
            while x < w:
                cnt = int(buf[bp])
                if cnt > 128:  # run
                    img[y, x : x + cnt - 128, c] = buf[bp + 1]
                    x += cnt - 128
                    bp += 2
                else:  # literal
                    img[y, x : x + cnt, c] = buf[bp + 1 : bp + 1 + cnt]
                    x += cnt
                    bp += 1 + cnt
    return _rgbe_to_float(img)


def save_hdr(path: str, rgb: np.ndarray) -> None:
    """Write a flat (non-RLE) Radiance HDR file."""
    rgbe = _float_to_rgbe(rgb)
    h, w = rgbe.shape[:2]
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


_native_mod = None
_native_checked = False


def _native():
    """The optional C++ fast path (native/arctic_native.cpp)."""
    global _native_mod, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from arctic_tpu.io import native as _n

            _native_mod = _n if _n.available() else None
        except Exception:
            _native_mod = None
    return _native_mod
