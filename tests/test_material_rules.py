"""Material auto-pairing rules (scene/material_rules.py) — the headless
counterpart of the reference's MaterialMappings.xml pairing DB
(AssetManager.cs:686-702): foreign assets with naming-convention-only
PBR intent get sensible Disney assignments at load."""
import json
import os

import numpy as np
import pytest

from truetrace_tpu.scene.material_rules import (
    DEFAULT_RULES, apply_rules, auto_pair, load_rules)
from truetrace_tpu.scene.mesh import HostMaterial


def test_name_rules_fill_defaults():
    m = apply_rules("gold_trim_01", HostMaterial())
    assert m.metallic == 1.0 and m.base_color[0] > 0.9
    g = apply_rules("window_GLASS", HostMaterial())
    assert g.spec_trans == 1.0 and g.ior == 1.5
    c = apply_rules("curtain_red", HostMaterial())
    assert c.sheen > 0 and c.roughness == 0.9
    lamp = apply_rules("ceiling_lamp", HostMaterial(base_color=(1, 0.5, 0.2)))
    assert lamp.emission[0] == 8.0 and lamp.emission[2] == pytest.approx(1.6)


def test_explicit_loader_data_wins():
    # the MTL said roughness 0.1 (non-default): a "concrete" rule must
    # not override it; a "!" -prefixed key would
    m = apply_rules("concrete_floor", HostMaterial(roughness=0.1))
    assert m.roughness == 0.1
    m2 = apply_rules("x", HostMaterial(roughness=0.1),
                     rules=[{"match": "x", "set": {"!roughness": 0.77}}])
    assert m2.roughness == pytest.approx(0.77)


def test_user_rules_db(tmp_path):
    p = tmp_path / "rules.json"
    p.write_text(json.dumps(
        [{"match": "wood", "set": {"roughness": 0.11, "clearcoat": 0.9}}]))
    rules = load_rules(str(p))
    m = apply_rules("wood_desk", HostMaterial(), rules)
    assert m.roughness == 0.11 and m.clearcoat == 0.9  # user beats default
    # defaults still appended
    g = apply_rules("glass", HostMaterial(), rules)
    assert g.spec_trans == 1.0


OBJ = """mtllib foreign.mtl
v 0 0 0
v 1 0 0
v 0 1 0
usemtl gold_handle
f 1 2 3
usemtl glass_pane
f 1 3 2
"""
MTL = """newmtl gold_handle
Kd 0.7 0.65 0.6
newmtl glass_pane
Kd 0.9 0.95 1.0
"""


def test_foreign_obj_auto_pairs(tmp_path):
    (tmp_path / "foreign.obj").write_text(OBJ)
    (tmp_path / "foreign.mtl").write_text(MTL)
    from truetrace_tpu.scene.obj_loader import load_obj_scene
    _, mats, _, _, _ = load_obj_scene(str(tmp_path / "foreign.obj"),
                                      auto_pair=True)
    gold = next(m for m in mats if m.metallic == 1.0)
    glass = next(m for m in mats if m.spec_trans == 1.0)
    assert np.allclose(gold.base_color, (0.7, 0.65, 0.6))  # Kd kept
    assert glass.ior == 1.5


def test_manifest_auto_pair(tmp_path):
    (tmp_path / "foreign.obj").write_text(OBJ)
    (tmp_path / "foreign.mtl").write_text(MTL)
    man = {"meshes": [{"obj": "foreign.obj"}], "auto_pair": True,
           "env": {"constant": [0.3, 0.3, 0.3]},
           "camera": {"eye": [0, 0.5, 3], "target": [0, 0.3, 0]}}
    (tmp_path / "scene.json").write_text(json.dumps(man))
    from truetrace_tpu.scene.manifest import load_manifest
    scene, cam, cfg = load_manifest(str(tmp_path / "scene.json"))
    st = np.asarray(scene.materials.spec_trans)
    mt = np.asarray(scene.materials.metallic)
    assert (st == 1.0).any() and (mt == 1.0).any()
