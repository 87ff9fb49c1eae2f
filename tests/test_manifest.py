"""Scene manifests (scene/manifest.py): one JSON file -> renderable
scene (the framework's tier-3 config, SURVEY.md section 5.6)."""
import json

import numpy as np

from truetrace_tpu.scene.manifest import load_manifest


def test_manifest_roundtrip(tmp_path):
    hm = np.zeros((17, 17), np.float32)
    np.save(tmp_path / "flat.npy", hm)
    doc = {
        "meshes": [
            {"primitive": "uv_sphere", "translate": [0, 1.5, 0],
             "radius": 0.6, "material": "glow"},
            {"primitive": "grid", "sx": 6.0, "sz": 6.0,
             "material": "floor"},
        ],
        "materials": {
            "glow": {"emission": [8, 6, 2]},
            "floor": {"base_color": [0.6, 0.6, 0.6], "roughness": 0.9},
            "grass": {"base_color": [0.3, 0.5, 0.2]},
        },
        "material_overrides": {"floor": {"roughness": 0.4}},
        "env": {"constant": [0.1, 0.12, 0.2]},
        "terrain": {"heightmap": "flat.npy", "origin": [-5, -1, -5],
                    "size": [10, 10], "materials": ["grass"]},
        "camera": {"eye": [0, 2.5, 6], "target": [0, 1, 0], "fov": 45},
        "render": {"width": 24, "height": 24, "bounces": 3,
                   "bsdf": "lambert", "traversal": "bvh2",
                   "light_sampling": "cdf"},
    }
    mpath = tmp_path / "scene.json"
    mpath.write_text(json.dumps(doc))
    scene, cam, cfg = load_manifest(str(mpath))

    assert scene.n_tris() > 0
    assert scene.terrain is not None
    assert cfg.bounces == 3 and cfg.bsdf == "lambert"
    # override applied
    fid = None
    rough = np.asarray(scene.materials.roughness)
    assert (np.abs(rough - 0.4) < 1e-6).any()
    # light list picked up the glow sphere
    assert scene.light_tris.tri_index.shape[0] > 0

    from truetrace_tpu.integrate.pathtrace import render
    img = np.asarray(render(scene, cam, cfg, spp=4))
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_manifest_gltf_entry(tmp_path):
    # reuse the glTF test fixture
    from tests.test_gltf import _tri_gltf
    gpath = _tri_gltf(tmp_path)
    doc = {
        "meshes": [{"gltf": "tri.gltf"}],
        "env": {"constant": [0.2, 0.2, 0.2]},
        "camera": {"eye": [3, 1, 5], "target": [3, 0.7, 0]},
        "render": {"width": 8, "height": 8, "bounces": 1,
                   "bsdf": "lambert", "traversal": "bvh2",
                   "light_sampling": "cdf"},
    }
    mpath = tmp_path / "s.json"
    mpath.write_text(json.dumps(doc))
    scene, cam, cfg = load_manifest(str(mpath))
    assert scene.n_tris() == 1
