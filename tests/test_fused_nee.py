"""Fused-NEE mixed dispatch parity (RenderConfig.fuse_nee).

The fused path defers each bounce's NEE shadow rays into the next
bounce's mixed trace (closest + any-hit lanes in one occupancy cascade,
kernels/cwbvh_wavefront.py mixed_hit_wavefront) with a post-loop flush.
Visibility queries and the radiance addition order are identical, so the
image must match the unfused path to float tolerance. (The knob is
default-off: measured slower on v5e — see RenderConfig.fuse_nee.)
"""
import numpy as np
import jax.numpy as jnp
import pytest

from truetrace_tpu.integrate.pathtrace import (
    RenderConfig, render, render_sample_with_stats)
from truetrace_tpu.scene import atrium
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def scene_cam():
    meshes, mats, cam, env = atrium.make(detail=0.3)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    return scene, cam


def _render(scene, cam, fuse, restir=False):
    cfg = RenderConfig(width=16, height=16, bounces=3, bsdf="disney",
                       traversal="wavefront", light_sampling="tree",
                       fuse_nee=fuse, restir_capture=restir)
    pix = jnp.arange(16 * 16, dtype=jnp.uint32)
    return render_sample_with_stats(scene, cam, cfg, pix, 0)


def test_fused_matches_unfused(scene_cam):
    scene, cam = scene_cam
    assert scene.tri_shadow is None     # fused path requires all-opaque
    rf, _ = _render(scene, cam, True)
    ru, _ = _render(scene, cam, False)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ru), atol=1e-5)


def test_fused_restir_captures_match(scene_cam):
    scene, cam = scene_cam
    rf, sf = _render(scene, cam, True, restir=True)
    ru, su = _render(scene, cam, False, restir=True)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ru), atol=1e-5)
    for k in ("direct", "indirect", "x2", "tp1"):
        np.testing.assert_allclose(np.asarray(sf[k]), np.asarray(su[k]),
                                   atol=1e-5, err_msg=k)


def test_nee_sort_bitwise_identical():
    """nee_sort permutes the shadow dispatch by light distance and
    inverse-permutes the result — same visibility queries, same per-lane
    addition order, so the image must be BITWISE identical."""
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene as _cs

    meshes, mats, cam = cornell.make()
    scene = _cs(meshes, mats, with_cwbvh=True, with_light_bvh=True)
    base = RenderConfig(width=24, height=24, bounces=3, bsdf="disney",
                        traversal="wavefront", light_sampling="tree")
    img0 = np.asarray(render(scene, cam, base, spp=2))
    img1 = np.asarray(render(scene, cam, base.replace(nee_sort=True),
                             spp=2))
    np.testing.assert_array_equal(img0, img1)
