"""glTF 2.0 ingest — the analog of the reference viewer's tinygltf path.

Mirrors ``Source/Examples/Viewer.cpp:66-278``: parse glTF JSON, resolve
buffers/bufferViews/accessors (the reference virtualizes these on the GPU,
``Structs.hpp:226-234``; we resolve them at load time into the dense
TriangleSoup), walk the node hierarchy composing transforms, and map
pbrMetallicRoughness materials onto the MaterialTable.

Supported: .gltf (JSON + external/base64 buffers) and .glb containers;
POSITION/NORMAL/TEXCOORD_0 attributes; u8/u16/u32 indices and non-indexed
primitives; TRIANGLES mode; node matrix or TRS transforms; baseColor /
metallic-roughness / emissive factors and baseColorTexture images.
"""

from __future__ import annotations

import base64
import json
import os
import struct
from typing import Tuple

import numpy as np

from prismarine_core_tpu.models.geometry import TriangleSoup
from prismarine_core_tpu.models.materials import MaterialTable
from prismarine_core_tpu.models.textures import TextureStack

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT4": 16}


def _load_glb(path: str):
    with open(path, "rb") as f:
        data = f.read()
    magic, version, _length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67, "not a GLB file"
    offset = 12
    gltf = None
    bin_chunk = b""
    while offset < len(data):
        clen, ctype = struct.unpack_from("<II", data, offset)
        chunk = data[offset + 8: offset + 8 + clen]
        if ctype == 0x4E4F534A:  # JSON
            gltf = json.loads(chunk.decode("utf-8"))
        elif ctype == 0x004E4942:  # BIN
            bin_chunk = chunk
        offset += 8 + clen
    return gltf, bin_chunk


def _resolve_buffers(gltf: dict, base: str, bin_chunk: bytes):
    bufs = []
    for b in gltf.get("buffers", []):
        uri = b.get("uri")
        if uri is None:
            bufs.append(bin_chunk)
        elif uri.startswith("data:"):
            bufs.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base, uri), "rb") as f:
                bufs.append(f.read())
    return bufs


def _read_accessor(gltf: dict, bufs, idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    itemsize = np.dtype(dtype).itemsize * ncomp
    stride = view.get("byteStride", itemsize)
    start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    raw = bufs[view["buffer"]]
    if stride == itemsize:
        arr = np.frombuffer(raw, dtype, count * ncomp,
                            offset=start).reshape(count, ncomp)
    else:
        arr = np.zeros((count, ncomp), dtype)
        for i in range(count):
            arr[i] = np.frombuffer(raw, dtype, ncomp,
                                   offset=start + i * stride)
    if acc.get("normalized") and dtype != np.float32:
        arr = arr.astype(np.float32) / np.iinfo(dtype).max
    return arr


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(list(node["scale"]) + [1.0]).astype(np.float32)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.asarray([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
             2 * (x * z + y * w), 0],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
             2 * (y * z - x * w), 0],
            [2 * (x * z - y * w), 2 * (y * z + x * w),
             1 - 2 * (x * x + y * y), 0],
            [0, 0, 0, 1],
        ], np.float32)
        m = r @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def load_gltf(
    path: str, scale: float = 1.0, capacity: int | None = None,
    texture_resolution: int = 256,
) -> Tuple[TriangleSoup, MaterialTable, TextureStack]:
    base = os.path.dirname(os.path.abspath(path))
    if path.lower().endswith(".glb"):
        gltf, bin_chunk = _load_glb(path)
    else:
        with open(path, "r") as f:
            gltf = json.load(f)
        bin_chunk = b""
    bufs = _resolve_buffers(gltf, base, bin_chunk)

    # materials
    mat_dicts = []
    images: list = []
    img_cache: dict[int, int] = {}

    def _texture_slot(tex_index: int) -> int:
        """glTF texture index -> TextureStack slot (decode on demand)."""
        if tex_index in img_cache:
            return img_cache[tex_index]
        try:
            tex = gltf["textures"][tex_index]
            img = gltf["images"][tex["source"]]
            if "uri" in img and not img["uri"].startswith("data:"):
                from PIL import Image
                arr = np.asarray(
                    Image.open(os.path.join(base, img["uri"]))
                    .convert("RGBA"), np.float32) / 255.0
            else:
                if "uri" in img:
                    raw = base64.b64decode(img["uri"].split(",", 1)[1])
                else:
                    view = gltf["bufferViews"][img["bufferView"]]
                    s = view.get("byteOffset", 0)
                    raw = bufs[view["buffer"]][s: s + view["byteLength"]]
                import io

                from PIL import Image
                arr = np.asarray(Image.open(io.BytesIO(raw))
                                 .convert("RGBA"), np.float32) / 255.0
            slot = len(images)
            images.append(arr)
            img_cache[tex_index] = slot
            return slot
        except Exception:
            img_cache[tex_index] = -1
            return -1

    for m in gltf.get("materials", []):
        pbr = m.get("pbrMetallicRoughness", {})
        bc = pbr.get("baseColorFactor", [1, 1, 1, 1])
        d = {
            "diffuse": tuple(bc[:3]),
            "alpha": float(bc[3]),
            "metallic": float(pbr.get("metallicFactor", 1.0)),
            "roughness": float(pbr.get("roughnessFactor", 1.0)),
            "emissive": tuple(m.get("emissiveFactor", (0, 0, 0))),
        }
        if "baseColorTexture" in pbr:
            d["tex_diffuse"] = _texture_slot(
                pbr["baseColorTexture"]["index"])
        # The remaining three texture kinds of surface.comp:102-163:
        # metallicRoughness (G=roughness, B=metallic — multiplies the
        # specular record whose y/z are exactly those), emissive, normal.
        if "metallicRoughnessTexture" in pbr:
            d["tex_specular"] = _texture_slot(
                pbr["metallicRoughnessTexture"]["index"])
        if "emissiveTexture" in m:
            d["tex_emissive"] = _texture_slot(
                m["emissiveTexture"]["index"])
        if "normalTexture" in m:
            d["tex_bump"] = _texture_slot(m["normalTexture"]["index"])
        mat_dicts.append(d)
    if not mat_dicts:
        mat_dicts.append({"diffuse": (0.7, 0.7, 0.7)})

    # geometry: walk the scene graph composing transforms
    tri_parts = []

    def emit_mesh(mesh_idx: int, mat: np.ndarray):
        mesh = gltf["meshes"][mesh_idx]
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:  # TRIANGLES only
                continue
            attrs = prim["attributes"]
            pos = _read_accessor(gltf, bufs, attrs["POSITION"]).astype(
                np.float32)
            pos = pos @ mat[:3, :3].T + mat[:3, 3]
            nrm = None
            if "NORMAL" in attrs:
                nrm = _read_accessor(gltf, bufs, attrs["NORMAL"]).astype(
                    np.float32)
                nm = np.linalg.inv(mat[:3, :3]).T
                nrm = nrm @ nm.T
                nrm /= np.maximum(
                    np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
            uv = None
            if "TEXCOORD_0" in attrs:
                uv = _read_accessor(
                    gltf, bufs, attrs["TEXCOORD_0"]).astype(np.float32)
            if "indices" in prim:
                idx = _read_accessor(
                    gltf, bufs, prim["indices"]).reshape(-1).astype(
                        np.int64)
            else:
                idx = np.arange(len(pos), dtype=np.int64)
            faces = idx.reshape(-1, 3)
            mid = prim.get("material", 0)
            tri_parts.append((pos, nrm, uv, faces, mid))

    def walk(node_idx: int, parent: np.ndarray):
        node = gltf["nodes"][node_idx]
        mat = parent @ _node_matrix(node)
        if "mesh" in node:
            emit_mesh(node["mesh"], mat)
        for child in node.get("children", []):
            walk(child, mat)

    root_scale = np.diag([scale, scale, scale, 1.0]).astype(np.float32)
    scene_def = gltf.get("scenes", [{}])[gltf.get("scene", 0)]
    for n in scene_def.get("nodes", range(len(gltf.get("nodes", [])))):
        walk(n, root_scale)
    if not tri_parts:
        raise ValueError(f"no triangle primitives in {path}")

    # flatten into one indexed mesh
    all_v, all_n, all_t, all_f, all_m = [], [], [], [], []
    off = 0
    for pos, nrm, uv, faces, mid in tri_parts:
        all_v.append(pos)
        all_n.append(nrm if nrm is not None
                     else np.zeros_like(pos))
        all_t.append(uv if uv is not None
                     else np.zeros((len(pos), 2), np.float32))
        all_f.append(faces + off)
        all_m.append(np.full(len(faces), mid, np.int32))
        off += len(pos)
    verts = np.concatenate(all_v)
    nrms = np.concatenate(all_n)
    uvs = np.concatenate(all_t)
    faces = np.concatenate(all_f)
    mids = np.concatenate(all_m)
    if not np.abs(nrms).sum():
        nrms = None

    soup = TriangleSoup.from_arrays(
        verts, faces, normals=nrms, texcoords=uvs, mat_ids=mids,
        capacity=capacity)
    mats = MaterialTable.build(mat_dicts)
    textures = (TextureStack.from_images(images, texture_resolution)
                if images else TextureStack.empty())
    return soup, mats, textures
