"""IO tests: glTF (embedded), OBJ+MTL, Radiance HDR round-trip."""

import base64
import json
import struct

import numpy as np
import pytest

from arctic_tpu.io import images
from arctic_tpu.io.gltf import load_gltf
from arctic_tpu.io.obj import load_obj


def _make_test_gltf(tmp_path, use_glb=False):
    # Two triangles (a quad), one node with a translation, base color texture.
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    nrm = np.tile([0, 0, 1], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()

    from PIL import Image

    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 0] = 200
    tex[..., 3] = 255
    Image.fromarray(tex).save(tmp_path / "base.png")

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2, 0, 0]}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}
        ],
        "textures": [{"source": 0}],
        "images": [{"uri": "base.png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    if use_glb:
        doc["buffers"] = [{"byteLength": len(blob)}]
        js = json.dumps(doc).encode()
        js += b" " * ((-len(js)) % 4)
        bl = blob + b"\x00" * ((-len(blob)) % 4)
        glb = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8 + len(bl))
        glb += struct.pack("<I4s", len(js), b"JSON") + js
        glb += struct.pack("<I4s", len(bl), b"BIN\x00") + bl
        p = tmp_path / "test.glb"
        p.write_bytes(glb)
        return p
    doc["buffers"] = [
        {
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64," + base64.b64encode(blob).decode(),
        }
    ]
    p = tmp_path / "test.gltf"
    p.write_text(json.dumps(doc))
    return p


@pytest.mark.parametrize("use_glb", [False, True])
def test_gltf_roundtrip(tmp_path, use_glb):
    path = _make_test_gltf(tmp_path, use_glb)
    meshes, objects, materials = load_gltf(str(path))
    assert len(meshes) == 1 and len(objects) == 1 and len(materials) == 1
    m = meshes[0]
    assert m.positions.shape == (4, 3)
    np.testing.assert_array_equal(m.indices, [[0, 1, 2], [0, 2, 3]])
    # FlipUVs applied.
    np.testing.assert_allclose(m.uvs, [[0, 1], [1, 1], [1, 0], [0, 0]])
    trs, mesh_idx = objects[0]
    np.testing.assert_allclose(trs[:3, 3], [2, 0, 0])
    assert materials[0].diffuse[0, 0, 0] == 200
    # Missing MR map -> white fallback (metal=1, rough=1 quirk, app.cpp:244).
    assert materials[0].metal_roughness[0, 0, 2] == 255


def _rewrite_gltf(path, edit):
    """Load the .gltf JSON, apply `edit(doc)`, write it back."""
    doc = json.loads(path.read_text())
    edit(doc)
    path.write_text(json.dumps(doc))


def test_gltf_extensions_required_raises(tmp_path):
    """A required-but-unsupported extension must fail loudly, not mis-parse
    (Assimp errors out and the reference aborts, app.cpp:177-185)."""
    from arctic_tpu.io.gltf import GltfUnsupportedError

    path = _make_test_gltf(tmp_path)
    _rewrite_gltf(
        path,
        lambda d: d.update(
            extensionsRequired=["KHR_draco_mesh_compression"],
            extensionsUsed=["KHR_draco_mesh_compression"],
        ),
    )
    with pytest.raises(GltfUnsupportedError, match="KHR_draco_mesh_compression"):
        load_gltf(str(path))


def test_gltf_optional_extension_warns(tmp_path, caplog):
    import logging

    path = _make_test_gltf(tmp_path)
    _rewrite_gltf(path, lambda d: d.update(extensionsUsed=["KHR_materials_ior"]))
    with caplog.at_level(logging.WARNING, logger="arctic.gltf"):
        meshes, objects, materials = load_gltf(str(path))
    assert len(meshes) == 1  # optional extensions degrade gracefully
    assert any("KHR_materials_ior" in r.message for r in caplog.records)


def test_gltf_non_triangle_primitive_warns(tmp_path, caplog):
    """Non-triangle primitives are skipped (only TRIANGLES render) but the
    drop must be LOUD — silent geometry loss violates the fail-fast rule."""
    import logging

    path = _make_test_gltf(tmp_path)

    def add_lines(doc):
        doc["meshes"][0]["primitives"].append(
            {"attributes": {"POSITION": 0}, "indices": 3, "mode": 1}
        )

    _rewrite_gltf(path, add_lines)
    with caplog.at_level(logging.WARNING, logger="arctic.gltf"):
        meshes, objects, materials = load_gltf(str(path))
    assert len(meshes) == 1  # the LINES primitive was skipped...
    assert any("LINES" in r.message for r in caplog.records)  # ...loudly


def test_obj_with_mtl(tmp_path):
    (tmp_path / "box.mtl").write_text(
        "newmtl red\nmap_Kd red.png\n"
    )
    from PIL import Image

    img = np.zeros((2, 2, 4), np.uint8)
    img[..., 0] = 255
    img[..., 3] = 255
    Image.fromarray(img).save(tmp_path / "red.png")
    (tmp_path / "quad.obj").write_text(
        "mtllib box.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "usemtl red\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
    )
    meshes, objects, materials = load_obj(str(tmp_path / "quad.obj"))
    assert len(meshes) == 1
    m = meshes[0]
    assert len(m.indices) == 2  # quad fan -> 2 triangles
    assert m.positions.shape[0] == 4  # deduplicated
    np.testing.assert_allclose(m.uvs[0], [0, 1])  # v flipped
    assert materials[0].diffuse[0, 0, 0] == 255


def test_hdr_roundtrip(tmp_path, rng):
    img = (rng.uniform(0, 50, (16, 32, 3)) ** 2).astype(np.float32)
    p = tmp_path / "test.hdr"
    images.save_hdr(str(p), img)
    back = images.load_hdr(str(p))
    assert back.shape == img.shape
    # RGBE has ~1% mantissa precision.
    err = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
    assert err.max() < 0.01
