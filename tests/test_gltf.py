"""glTF 2.0 loader (scene/gltf_loader.py) — scene ingestion parity with
the reference's Unity asset extraction."""
import base64
import json
import struct

import numpy as np

from truetrace_tpu.scene.gltf_loader import load_gltf


def _tri_gltf(tmp_path, glb=False):
    """One triangle + one emissive-transmissive material, with a child
    node carrying a translate+scale transform."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile([0, 0, 1], (3, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    blob += b"\x00" * ((-len(blob)) % 4)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"children": [1]},
            {"mesh": 0, "translation": [2, 0, 0], "scale": [2, 2, 2]},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                "metallicFactor": 0.3, "roughnessFactor": 0.4},
            "emissiveFactor": [1, 1, 1],
            "extensions": {
                "KHR_materials_emissive_strength": {"emissiveStrength": 5},
                "KHR_materials_transmission": {"transmissionFactor": 0.7},
                "KHR_materials_ior": {"ior": 1.33}},
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    if glb:
        doc_b = json.dumps(doc).encode()
        doc_b += b" " * ((-len(doc_b)) % 4)
        out = (b"glTF" + struct.pack("<II", 2, 0)
               + struct.pack("<II", len(doc_b), 0x4E4F534A) + doc_b
               + struct.pack("<II", len(blob), 0x004E4942) + blob)
        path = tmp_path / "tri.glb"
        path.write_bytes(out)
        # GLB total length fix-up
        data = bytearray(path.read_bytes())
        struct.pack_into("<I", data, 8, len(data))
        path.write_bytes(bytes(data))
    else:
        doc["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                    + base64.b64encode(blob).decode())
        path = tmp_path / "tri.gltf"
        path.write_text(json.dumps(doc))
    return str(path)


def _check(meshes, mats):
    assert len(meshes) == 1 and len(mats) == 1
    m = meshes[0]
    # node transform applied: translate (2,0,0), scale 2
    np.testing.assert_allclose(m.positions[0], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.positions[1], [4, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.positions[2], [2, 2, 0], atol=1e-6)
    np.testing.assert_allclose(m.normals, np.tile([0, 0, 1], (3, 1)),
                               atol=1e-6)
    assert m.indices.shape == (1, 3)
    mat = mats[0]
    np.testing.assert_allclose(mat.base_color, (0.8, 0.2, 0.1))
    np.testing.assert_allclose(mat.emission, (5, 5, 5))
    assert abs(mat.spec_trans - 0.7) < 1e-6
    assert abs(mat.ior - 1.33) < 1e-6
    assert abs(mat.metallic - 0.3) < 1e-6


def test_load_gltf_json(tmp_path):
    _check(*load_gltf(_tri_gltf(tmp_path, glb=False)))


def test_load_glb(tmp_path):
    _check(*load_gltf(_tri_gltf(tmp_path, glb=True)))


def test_renders(tmp_path):
    import jax.numpy as jnp
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.ir import Camera, EnvMap
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats = load_gltf(_tri_gltf(tmp_path))
    scene = compile_scene(meshes, mats, env=EnvMap.constant((0, 0, 0)))
    cam = Camera.look_at(eye=(3, 1, 5), target=(3, 0.7, 0), fov_y_deg=45)
    img = np.asarray(render(scene, cam, RenderConfig(
        width=16, height=16, bounces=2, bsdf="disney"), spp=4))
    assert np.isfinite(img).all()
    assert img.max() > 0.5      # emissive triangle visible
