"""glTF loader tests against a hand-built embedded-buffer asset."""

import base64
import json
import struct

import numpy as np

from prismarine_core_tpu.models.gltf_loader import load_gltf


def _make_gltf(tmp_path, glb=False):
    # one quad (4 verts, 2 tris, u16 indices) translated by a node TRS
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    bin_data = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.2, 0.1, 1.0],
            "metallicFactor": 0.3, "roughnessFactor": 0.5},
            "emissiveFactor": [0.0, 1.0, 0.0]}],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    if glb:
        payload = json.dumps(gltf).encode()
        payload += b" " * (-len(payload) % 4)
        bin_pad = bin_data + b"\0" * (-len(bin_data) % 4)
        body = (struct.pack("<III", 0x46546C67, 2, 0)
                + struct.pack("<II", len(payload), 0x4E4F534A) + payload
                + struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad)
        body = body[:8] + struct.pack("<I", len(body)) + body[12:]
        p = tmp_path / "q.glb"
        p.write_bytes(body)
    else:
        gltf["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(bin_data).decode())
        p = tmp_path / "q.gltf"
        p.write_text(json.dumps(gltf))
    return p


def test_gltf_json(tmp_path):
    soup, mats, _ = load_gltf(str(_make_gltf(tmp_path)), scale=2.0)
    assert int(soup.num_valid()) == 2
    v0 = np.asarray(soup.v0)[0]
    # translation (2,0,0) then root scale 2 -> x in [4, 6]
    assert 4.0 <= v0[0] <= 6.0
    np.testing.assert_allclose(np.asarray(mats.diffuse[0]),
                               [0.9, 0.2, 0.1, 1.0], rtol=1e-6)
    np.testing.assert_allclose(float(mats.specular[0, 1]), 0.5)  # rough
    np.testing.assert_allclose(float(mats.specular[0, 2]), 0.3)  # metal
    np.testing.assert_allclose(np.asarray(mats.emissive[0, :3]),
                               [0, 1, 0])
    np.testing.assert_allclose(np.asarray(soup.n0)[0], [0, 0, 1],
                               atol=1e-6)


def test_gltf_glb(tmp_path):
    soup, mats, _ = load_gltf(str(_make_gltf(tmp_path, glb=True)))
    assert int(soup.num_valid()) == 2
