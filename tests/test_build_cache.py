"""On-disk build cache: second compile of the same scene skips the
builders and reproduces the Scene bit-exactly (reference persisted
"Build Aggregated BVH", README.md:131; scene/build_cache.py)."""
import numpy as np
import pytest

import truetrace_tpu.scene.mesh as mesh_mod
from truetrace_tpu.scene.cornell import make
from truetrace_tpu.scene.mesh import compile_scene


def _scenes_equal(a, b):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cache_round_trip_bit_exact(tmp_path):
    meshes, mats, _ = make()
    s1 = compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True,
                       cache_dir=str(tmp_path))
    files = list(tmp_path.glob("scene_*.npz"))
    assert len(files) == 1
    s2 = compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True,
                       cache_dir=str(tmp_path))
    _scenes_equal(s1, s2)


def test_cache_hit_skips_builders(tmp_path, monkeypatch):
    meshes, mats, _ = make()
    compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True,
                  cache_dir=str(tmp_path))

    def boom(*a, **k):
        raise AssertionError("builder ran on a cache hit")

    monkeypatch.setattr(mesh_mod, "build_bvh2", boom)
    import truetrace_tpu.build.cwbvh as cwbvh_mod
    monkeypatch.setattr(cwbvh_mod, "build_cwbvh", boom)
    import truetrace_tpu.build.lightbvh as lb_mod
    monkeypatch.setattr(lb_mod, "build_light_bvh", boom)
    s = compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True,
                      cache_dir=str(tmp_path))
    assert int(s.cw_nodes.shape[0]) > 0


def test_cache_key_tracks_inputs(tmp_path):
    meshes, mats, _ = make()
    compile_scene(meshes, mats, with_cwbvh=True, cache_dir=str(tmp_path))
    # geometry change -> new entry
    m2 = [mesh_mod.HostMesh(m.positions * 1.1, m.indices, m.mat_id,
                            normals=m.normals, uvs=m.uvs) for m in meshes]
    compile_scene(m2, mats, with_cwbvh=True, cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("scene_*.npz"))) == 2
    # leaf_k change -> new entry (auto is 6 at this scale, so use 3)
    compile_scene(meshes, mats, with_cwbvh=True, leaf_k=3,
                  cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("scene_*.npz"))) == 3


def test_cache_renders_identically(tmp_path):
    import jax.numpy as jnp
    from truetrace_tpu.integrate.pathtrace import (RenderConfig,
                                                   render_sample)
    from truetrace_tpu.scene.ir import Camera
    meshes, mats, cam = make()
    s1 = compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True)
    compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True,
                  cache_dir=str(tmp_path))
    s2 = compile_scene(meshes, mats, with_cwbvh=True, with_light_bvh=True,
                       cache_dir=str(tmp_path))
    cfg = RenderConfig(width=8, height=8, bounces=2, bsdf="disney",
                       traversal="wavefront", light_sampling="tree")
    r1 = np.asarray(render_sample(s1, cam, cfg, 0))
    r2 = np.asarray(render_sample(s2, cam, cfg, 0))
    np.testing.assert_array_equal(r1, r2)
