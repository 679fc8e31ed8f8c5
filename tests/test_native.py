"""C++ native library (if built) must agree with the numpy reference paths."""

import numpy as np
import pytest

from arctic_tpu.io import images
from arctic_tpu.io import native
from arctic_tpu.io.procedural import uv_sphere

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def _numpy_tangents(m):
    # Call the pure-numpy implementation directly (bypassing the native path).
    from arctic_tpu.io import build as b

    i0, i1, i2 = m.indices[:, 0], m.indices[:, 1], m.indices[:, 2]
    positions, normals, uvs, indices = m.positions, m.normals, m.uvs, m.indices
    e1 = positions[i1] - positions[i0]
    e2 = positions[i2] - positions[i0]
    d1 = uvs[i1] - uvs[i0]
    d2 = uvs[i2] - uvs[i0]
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    r = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1.0, det))
    t_face = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) * r[:, None]
    b_face = (e2 * d1[:, 0:1] - e1 * d2[:, 0:1]) * r[:, None]
    tan = np.zeros_like(positions)
    btn = np.zeros_like(positions)
    for tri_idx in (i0, i1, i2):
        np.add.at(tan, tri_idx, t_face)
        np.add.at(btn, tri_idx, b_face)
    n = normals
    tan = tan - n * np.sum(n * tan, axis=1, keepdims=True)
    ln = np.linalg.norm(tan, axis=1, keepdims=True)
    alt = np.cross(n, np.where(np.abs(n[:, 0:1]) < 0.9, [[1.0, 0, 0]], [[0, 1.0, 0]]))
    tan = np.where(ln > 1e-8, tan / np.maximum(ln, 1e-20), alt / np.linalg.norm(alt, axis=1, keepdims=True))
    handed = np.where(np.sum(np.cross(n, tan) * btn, axis=1, keepdims=True) < 0, -1.0, 1.0)
    btn = np.cross(n, tan) * handed
    return tan.astype(np.float32), btn.astype(np.float32)


def test_native_tangents_match_numpy():
    m = uv_sphere(1.0, 8, 12)
    t_np, b_np = _numpy_tangents(m)
    t_c, b_c = native.compute_tangents(m.positions, m.normals, m.uvs, m.indices)
    np.testing.assert_allclose(t_c, t_np, atol=2e-5)
    np.testing.assert_allclose(b_c, b_np, atol=2e-5)


def test_native_hdr_matches_python(tmp_path, rng):
    img = (rng.uniform(0, 20, (8, 16, 3)) ** 2).astype(np.float32)
    p = str(tmp_path / "n.hdr")
    images.save_hdr(p, img)
    a = native.load_hdr(p)
    # Force the pure-python decoder for comparison.
    import arctic_tpu.io.images as im

    saved, saved_chk = im._native_mod, im._native_checked
    im._native_mod, im._native_checked = None, True
    try:
        b = images.load_hdr(p)
    finally:
        im._native_mod, im._native_checked = saved, saved_chk
    np.testing.assert_array_equal(a, b)
