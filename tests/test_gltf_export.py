"""GLB writer -> loader round trip must reproduce the scene exactly.

This is the bench's asset path (bench.py exports the procedural
Sponza-class scene and benchmarks the loaded GLB): a writer bug that the
loader happened to invert would corrupt the benchmark silently, so the
round trip is asserted buffer-by-buffer against ground truth here.
"""

import os

import numpy as np

from arctic_tpu.io import procedural
from arctic_tpu.io.gltf import load_gltf
from arctic_tpu.io.gltf_export import save_glb


def _roundtrip(tmp_path, meshes, objects, materials):
    path = os.path.join(tmp_path, "scene.glb")
    save_glb(path, meshes, objects, materials)
    return load_gltf(path)


def test_glb_roundtrip_cornell(tmp_path):
    meshes, objects, materials, _env = procedural.cornell_like_scene()
    m2, o2, mat2 = _roundtrip(str(tmp_path), meshes, objects, materials)

    assert len(m2) == len(meshes)
    for a, b in zip(meshes, m2):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.normals, b.normals)
        # v goes through 1 - (1 - v): exact only on [0.5, 2] (Sterbenz),
        # so allow 1-ulp wiggle elsewhere.
        np.testing.assert_allclose(a.uvs, b.uvs, atol=2e-6)
        np.testing.assert_array_equal(a.indices, b.indices)
        assert a.material == b.material

    assert len(o2) == len(objects)
    # The loader's stack walk reverses sibling order; match by content.
    def key(obj):
        trs, mi = obj
        return (mi, tuple(np.asarray(trs, np.float32).reshape(-1).tolist()))

    for a, b in zip(sorted(objects, key=key), sorted(o2, key=key)):
        np.testing.assert_allclose(np.asarray(a[0], np.float32), b[0], atol=1e-6)
        assert a[1] == b[1]

    assert len(mat2) == len(materials)
    for a, b in zip(materials, mat2):
        # PNG is lossless on u8; loader may add/strip alpha — compare RGB.
        np.testing.assert_array_equal(a.diffuse[..., :3], b.diffuse[..., :3])
        np.testing.assert_array_equal(a.normal[..., :3], b.normal[..., :3])
        np.testing.assert_array_equal(
            a.metal_roughness[..., :3], b.metal_roughness[..., :3]
        )


def test_glb_roundtrip_sponza_class(tmp_path):
    """The actual bench asset: 250k-triangle multi-material colonnade."""
    meshes, objects, materials, _env = procedural.sponza_like_scene()
    m2, o2, mat2 = _roundtrip(str(tmp_path), meshes, objects, materials)
    assert len(m2) == len(meshes) and len(o2) == len(objects)
    total = sum(len(m.indices) for m in meshes)
    total2 = sum(len(m.indices) for m in m2)
    assert total == total2
    for a, b in zip(meshes, m2):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.indices, b.indices)
