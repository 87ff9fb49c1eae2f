"""Regression tests for the round-4 ADVICE loader findings:
MTL -s/-o variable-arity options (obj_loader), KHR_materials_volume
attenuationDistance spec default (+inf, gltf_loader), and Mitsuba
<point name="center"> sphere placement (mitsuba_loader)."""
import json

import numpy as np

from truetrace_tpu.scene.gltf_loader import load_gltf
from truetrace_tpu.scene.mitsuba_loader import load_mitsuba
from truetrace_tpu.scene.obj_loader import _parse_mtl


def _write_mtl(tmp_path, body):
    p = tmp_path / "m.mtl"
    p.write_text(body)
    return str(p)


def test_mtl_map_option_single_value(tmp_path):
    """`map_Kd -s 2 brick.png` (legal 1-value form) must parse with v=u
    — the fixed 2-arg parser crashed with float('brick.png')."""
    tex = {}
    mats = _parse_mtl(_write_mtl(tmp_path, """newmtl a
Kd 0.5 0.5 0.5
map_Kd -s 2 brick.png
"""), tex)
    assert mats["a"].uv_scale == (2.0, 2.0, 0.0, 0.0)
    assert tex["a"]["tex_albedo"].endswith("brick.png")


def test_mtl_map_option_three_values(tmp_path):
    """3-value form `-s u v w`: w consumed (ignored), filename intact."""
    tex = {}
    mats = _parse_mtl(_write_mtl(tmp_path, """newmtl a
map_Kd -s 2 3 1 brick.png
map_Pr -o 0.25 0.5 0 rough.png
"""), tex)
    assert mats["a"].uv_scale == (2.0, 3.0, 0.25, 0.5)


def test_gltf_attenuation_color_without_distance(tmp_path):
    """glTF spec: attenuationDistance defaults to +inf (no attenuation).
    attenuationColor authored alone must NOT produce absorption (the
    integrator maps scatter_dist<=0 to Beer-Lambert over distance 1)."""
    def doc_for(volume_ext):
        return {"asset": {"version": "2.0"},
                "materials": [{"extensions":
                               {"KHR_materials_volume": volume_ext}}],
                "buffers": []}

    def mat_for(volume_ext, name):
        p = tmp_path / name
        p.write_text(json.dumps(doc_for(volume_ext)))
        return load_gltf(str(p))[1][0]

    m = mat_for({"attenuationColor": [1.0, 0.5, 0.2]}, "nodist.gltf")
    assert m.transmit_color == (-1.0, -1.0, -1.0)  # sentinel: none
    assert m.scatter_dist == 0.0

    m = mat_for({"attenuationColor": [1.0, 0.5, 0.2],
                 "attenuationDistance": 0.25}, "dist.gltf")
    np.testing.assert_allclose(m.transmit_color, (1.0, 0.5, 0.2))
    assert abs(m.scatter_dist - 0.25) < 1e-7


def test_mitsuba_point_center_positions_sphere(tmp_path):
    """<point name="center" x= y= z=> spheres must be positioned, not
    silently dropped at the origin."""
    xml = """<scene version="3.0.0">
      <shape type="sphere">
        <point name="center" x="3" y="4" z="5"/>
        <float name="radius" value="0.5"/>
        <bsdf type="diffuse"/>
      </shape>
    </scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    meshes, mats, cam, env = load_mitsuba(str(p))
    assert len(meshes) == 1
    center = meshes[0].positions.mean(axis=0)
    np.testing.assert_allclose(center, [3, 4, 5], atol=0.05)
    r = np.linalg.norm(meshes[0].positions - center, axis=1).max()
    assert abs(r - 0.5) < 0.05
