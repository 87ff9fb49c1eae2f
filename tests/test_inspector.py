"""Scene inspector/validator (headless analogue of the reference's editor
suite validation panels)."""
import numpy as np

from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene
from truetrace_tpu.tools.inspector import inspect_scene


def test_clean_scene_passes():
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats, with_cwbvh=True)
    r = inspect_scene(scene)
    assert r.ok()
    assert r.stats["triangles"] == 36
    assert r.stats["mesh_lights"] == 2
    assert r.stats["cwbvh_stack_depth"] >= 2
    assert "scene report" in r.render()


def test_bad_texture_id_is_error():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    mats = [HostMaterial(tex_albedo=5)]     # no atlas at all
    scene = compile_scene([HostMesh(pos, idx, np.zeros(1, np.int32))],
                          mats, with_cwbvh=True)
    r = inspect_scene(scene)
    assert not r.ok()
    assert any(f.check == "textures" for f in r.errors)


def test_degenerate_and_dark_scene_warnings():
    pos = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],    # collinear
                    [0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    mats = [HostMaterial()]
    scene = compile_scene([HostMesh(pos, idx, np.zeros(2, np.int32))],
                          mats, with_cwbvh=True)
    r = inspect_scene(scene)
    assert r.ok()      # warnings are not errors
    checks = {f.check for f in r.warnings}
    assert "geometry" in checks     # the degenerate triangle
    assert "lights" in checks       # nothing emits
