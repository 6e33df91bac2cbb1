import base64
import json
import struct

import numpy as np
import pytest

from rt_tpu.io.obj_loader import load_obj
from rt_tpu.io.gltf_loader import add_gltf_to_scene, load_gltf, material_from_gltf
from rt_tpu.scene import SceneBuilder, MAT_METAL, MAT_LAMBERTIAN

OBJ_TEXT = """# test cube face
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
o quad
f 1/1 2/2 3/3 4/4
o tri
f 1/1 2/2 3/3
"""


def test_load_obj_triangulation_and_uvs(tmp_path):
    path = tmp_path / "quad.obj"
    path.write_text(OBJ_TEXT)
    models = load_obj(str(path))
    assert [m["name"] for m in models] == ["quad", "tri"]
    quad = models[0]
    assert quad["vertices"].shape == (2, 3, 3)  # fan-triangulated
    np.testing.assert_allclose(quad["vertices"][0, 0], [0, 0, 0])
    np.testing.assert_allclose(quad["vertices"][1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    assert quad["uvs"].shape == (2, 3, 2)
    np.testing.assert_allclose(quad["uvs"][0, 1], [1, 0])


def test_load_obj_negative_indices_and_transform(tmp_path):
    path = tmp_path / "neg.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    scale = np.diag([2.0, 2.0, 2.0, 1.0])
    models = load_obj(str(path), transform=scale)
    np.testing.assert_allclose(models[0]["vertices"][0, 1], [2, 0, 0])
    assert models[0]["uvs"] is None


def _minimal_gltf(tmp_path, with_texture=False):
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    blob = positions.tobytes() + uvs.tobytes() + indices.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "byteLength": len(blob),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "meshes": [
            {
                "name": "tri",
                "primitives": [
                    {
                        "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                        "indices": 2,
                        "material": 0,
                    }
                ],
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.9, 0.2, 0.1, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 0.4,
                }
            }
        ],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "scenes": [{"nodes": [0]}],
    }
    if with_texture:
        from PIL import Image
        import io as _io

        img = Image.fromarray(
            (np.random.default_rng(0).uniform(0, 255, (4, 4, 3))).astype(np.uint8)
        )
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        doc["images"] = [
            {
                "uri": "data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode()
            }
        ]
        doc["textures"] = [{"source": 0}]
        doc["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    path = tmp_path / "scene.gltf"
    path.write_text(json.dumps(doc))
    return str(path)


def test_load_gltf_minimal(tmp_path):
    path = _minimal_gltf(tmp_path)
    prims = load_gltf(path)
    assert len(prims) == 1
    tri = prims[0]
    assert tri["vertices"].shape == (1, 3, 3)
    np.testing.assert_allclose(tri["vertices"][0, 1], [1, 0, 0])
    np.testing.assert_allclose(tri["uvs"][0, 2], [0, 1])
    np.testing.assert_allclose(tri["base_color_factor"], [0.9, 0.2, 0.1, 1.0])
    assert tri["roughness"] == pytest.approx(0.4)


def test_load_gltf_node_transforms(tmp_path):
    path = _minimal_gltf(tmp_path)
    prims = load_gltf(path, apply_node_transforms=True)
    np.testing.assert_allclose(prims[0]["vertices"][0, 0], [1, 2, 3])


def test_gltf_texture_decode(tmp_path):
    path = _minimal_gltf(tmp_path, with_texture=True)
    prims = load_gltf(path)
    assert prims[0]["base_color_image"].shape == (4, 4, 3)


def test_material_from_gltf_compat_and_corrected(tmp_path):
    path = _minimal_gltf(tmp_path)
    prim = load_gltf(path)[0]
    b = SceneBuilder()
    # Compat: everything becomes Metal with fuzz=roughness (material.rs:20-33).
    mat = material_from_gltf(b, prim, compat_all_metal=True)
    assert b._materials[mat].kind == MAT_METAL
    assert b._materials[mat].fuzz == pytest.approx(0.4)
    # Corrected: metallic 0.0 -> lambertian.
    mat2 = material_from_gltf(b, prim, compat_all_metal=False)
    assert b._materials[mat2].kind == MAT_LAMBERTIAN


def test_add_gltf_to_scene_builds(tmp_path):
    path = _minimal_gltf(tmp_path)
    b = SceneBuilder()
    n = add_gltf_to_scene(b, path)
    assert n == 1
    scene = b.build(use_bvh=False)
    assert scene.num_triangles == 1


def test_glb_container(tmp_path):
    gltf_path = _minimal_gltf(tmp_path)
    doc = json.load(open(gltf_path))
    uri = doc["buffers"][0].pop("uri")
    blob = base64.b64decode(uri.split(",", 1)[1])
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
    blob += b"\0" * ((4 - len(blob) % 4) % 4)
    glb = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(json_bytes) + 8 + len(blob))
    glb += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    glb += struct.pack("<II", len(blob), 0x004E4942) + blob
    path = tmp_path / "scene.glb"
    path.write_bytes(glb)
    prims = load_gltf(str(path))
    assert prims[0]["vertices"].shape == (1, 3, 3)
