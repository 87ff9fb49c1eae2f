"""AssetManager lifecycle: add/remove/update queues + commit policy
(reference Resources/AssetManager.cs:430-520 queues, 1610-1845 UpdateTLAS).
Invariant tested throughout: any sequence of queued mutations + commit()
renders identically to a from-scratch compile of the same state."""
import numpy as np

from tests.test_instanced_render import _sources_and_instances
from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.asset_manager import AssetManager
from truetrace_tpu.scene.instances import (compile_scene_instanced,
                                           make_transform)
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh

CAM = Camera.look_at(eye=(0, 3.0, 6.0), target=(0, 0.5, 0), fov_y_deg=45)
CFG = RenderConfig(width=24, height=24, bounces=2, bsdf="lambert",
                   traversal="tlas", light_sampling="cdf")


def _img(scene):
    return np.asarray(render(scene, CAM, CFG, spp=8))


def _manager():
    sources, mats, instances = _sources_and_instances()
    am = AssetManager(materials=mats)
    src_h = [am.add_mesh(s) for s in sources]
    inst_h = [am.add_instance(src_h[sid], m) for sid, m in instances]
    return am, src_h, inst_h, sources, mats, instances


def test_commit_matches_direct_compile():
    am, _, _, sources, mats, instances = _manager()
    scene = am.commit()
    ref, _ = compile_scene_instanced(sources, mats, instances)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)


def test_transform_update_fast_path():
    """set_transform + commit == fresh compile; BLAS builds not re-run."""
    am, _, inst_h, sources, mats, instances = _manager()
    am.commit()

    import truetrace_tpu.scene.asset_manager as am_mod
    calls = []
    orig = am_mod.build_source
    am_mod.build_source = lambda m, **kw: calls.append(1) or orig(m, **kw)
    try:
        m_new = make_transform((-0.6, 0.7, 0.4), rot_y=1.1)
        am.set_transform(inst_h[1], m_new)
        scene = am.commit()
    finally:
        am_mod.build_source = orig

    moved = list(instances)
    moved[1] = (moved[1][0], m_new)
    ref, _ = compile_scene_instanced(sources, mats, moved)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)
    assert calls == [], "transform-only commit must not rebuild any BLAS"


def test_add_remove_instance_and_blas_cache():
    """Adding/removing instances re-aggregates but reuses cached BLAS
    builds (only NEW sources run build_source)."""
    am, src_h, inst_h, sources, mats, instances = _manager()
    am.commit()

    import truetrace_tpu.scene.asset_manager as am_mod
    calls = []
    orig = am_mod.build_source
    am_mod.build_source = lambda m, **kw: calls.append(1) or orig(m, **kw)
    try:
        m_new = make_transform((0.0, 0.4, 1.5), rot_y=0.9, scale=0.6)
        am.add_instance(src_h[0], m_new)
        am.remove_instance(inst_h[2])
        scene = am.commit()
    finally:
        am_mod.build_source = orig

    new_insts = [instances[0], instances[1], instances[3], (0, m_new)]
    ref, _ = compile_scene_instanced(sources, mats, new_insts)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)
    assert calls == [], "instance add/remove must reuse cached BLASes"


def test_update_mesh_rebuilds_only_that_source():
    am, src_h, _, sources, mats, instances = _manager()
    am.commit()

    import truetrace_tpu.scene.asset_manager as am_mod
    calls = []
    orig = am_mod.build_source
    am_mod.build_source = lambda m, **kw: calls.append(m) or orig(m, **kw)
    try:
        bigger = HostMesh(sources[0].positions * 1.4, sources[0].indices,
                          sources[0].mat_id)
        am.update_mesh(src_h[0], bigger)
        scene = am.commit()
    finally:
        am_mod.build_source = orig

    assert len(calls) == 1, "only the edited source rebuilds"
    new_sources = [bigger, sources[1], sources[2]]
    ref, _ = compile_scene_instanced(new_sources, mats, instances)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)


def test_material_edit_no_rebuild_unless_emission():
    am, _, _, sources, mats, instances = _manager()
    am.commit()

    # non-emissive edit: table swap only
    am.set_material(1, HostMaterial(base_color=(0.2, 0.6, 0.9)))
    assert not am._topology_dirty
    scene = am.commit()
    mats2 = list(mats)
    mats2[1] = HostMaterial(base_color=(0.2, 0.6, 0.9))
    ref, _ = compile_scene_instanced(sources, mats2, instances)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)

    # emission edit changes the light topology -> full rebuild path
    am.set_material(1, HostMaterial(base_color=(0.2, 0.6, 0.9),
                                    emission=(3.0, 3.0, 3.0)))
    assert am._topology_dirty
    scene = am.commit()
    mats3 = list(mats2)
    mats3[1] = HostMaterial(base_color=(0.2, 0.6, 0.9),
                            emission=(3.0, 3.0, 3.0))
    ref, _ = compile_scene_instanced(sources, mats3, instances)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)


def test_remove_mesh_drops_its_instances():
    am, src_h, _, sources, mats, instances = _manager()
    am.commit()
    am.remove_mesh(src_h[0])            # both boxes disappear
    scene = am.commit()
    kept = [(sid - 1, m) for sid, m in instances if sid != 0]
    ref, _ = compile_scene_instanced(sources[1:], mats, kept)
    np.testing.assert_allclose(_img(scene), _img(ref), rtol=1e-4, atol=1e-5)
