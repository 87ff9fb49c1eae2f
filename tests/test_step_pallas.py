"""Pallas fused step core (kernels/step_pallas.py) — bit-parity with the
XLA Moller+decode path on real traversals (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

import truetrace_tpu.kernels.cwbvh_wavefront as wf
from truetrace_tpu.core import rng
from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
from truetrace_tpu.scene import atrium
from truetrace_tpu.scene.mesh import compile_scene
from truetrace_tpu.scene.ir import camera_rays


@pytest.fixture(scope="module")
def scene_rays():
    meshes, mats, cam, env = atrium.make(detail=0.2)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True)
    R = 512
    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro, rd = camera_rays(cam, 32, R // 32, pix.astype(jnp.int32), jit2)
    # add incoherent bounce-style rays
    u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
    gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
    rd2 = to_world(gn, sample_cosine_hemisphere(u2))
    ro2 = ro + rd * 2.0
    return scene, (jnp.concatenate([ro, ro2]), jnp.concatenate([rd, rd2]))


def _run(scene, ro, rd, pallas, any_hit):
    old = wf._PALLAS_STEP
    wf._PALLAS_STEP = pallas
    try:
        hit = wf._traverse(scene.cw_nodes, scene.cw_leaf_rows, ro, rd,
                           jnp.float32(1e30), any_hit, scene.cw_stack)
    finally:
        wf._PALLAS_STEP = old
    return hit


def test_closest_hit_bit_parity(scene_rays):
    scene, (ro, rd) = scene_rays
    a = _run(scene, ro, rd, False, False)
    b = _run(scene, ro, rd, True, False)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))
    assert int((np.asarray(a.tri) >= 0).sum()) > 100     # non-trivial


def test_any_hit_bit_parity(scene_rays):
    scene, (ro, rd) = scene_rays
    a = _run(scene, ro, rd, False, True)
    b = _run(scene, ro, rd, True, True)
    np.testing.assert_array_equal(np.asarray(a.tri) >= 0,
                                  np.asarray(b.tri) >= 0)
