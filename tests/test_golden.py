"""Golden-image correctness ladder (BASELINE.md): the full fast stack
(OBJ ingestion -> atlas -> CWBVH wavefront + light-tree NEE + MIS) must
agree with simpler unbiased estimators of the same scene within noise.
The scene is the sponza_like asset exported to disk and loaded back
through the real pipeline (scene/sponza_like.py)."""
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def sponza_scene(tmp_path_factory):
    from truetrace_tpu.build.env_cdf import build_env_cdf, procedural_sky
    from truetrace_tpu.scene import sponza_like

    d = tmp_path_factory.mktemp("sponza_like")
    obj = sponza_like.export(str(d), detail=0.7)
    from truetrace_tpu.scene.obj_loader import load_obj_scene
    meshes, mats, atlas, rects, level_y = load_obj_scene(obj)
    # soft wide sun so the no-NEE estimator converges at test spp
    env = build_env_cdf(procedural_sky(
        sun_dir=(0.3, 0.85, 0.44), sun_intensity=25.0, sun_angle_deg=18.0))
    from truetrace_tpu.scene.ir import Camera
    cam = Camera.look_at(eye=(-9.5, 2.1, 0.0), target=(6.0, 3.2, -0.5),
                         fov_y_deg=55)
    scene = compile_scene(meshes, mats, env=env, atlas=atlas,
                          atlas_rects=rects, atlas_level_y=level_y,
                          with_cwbvh=True, with_light_bvh=True)
    return scene, cam


def _mean_rgb(img):
    return np.asarray(img).reshape(-1, 3).mean(axis=0)


def test_wavefront_treenee_matches_bvh2_cdfnee(sponza_scene):
    """Same estimator family, independent acceleration + light-selection
    stacks: CWBVH wavefront + light-tree NEE vs BVH2 + power-CDF NEE."""
    scene, cam = sponza_scene
    kw = dict(width=48, height=36, bounces=3, bsdf="disney")
    a = render(scene, cam, RenderConfig(traversal="wavefront",
                                        light_sampling="tree", **kw),
               spp=12)
    b = render(scene, cam, RenderConfig(traversal="bvh2",
                                        light_sampling="cdf", **kw),
               spp=12)
    ma, mb = _mean_rgb(a), _mean_rgb(b)
    assert np.all(np.isfinite(ma)) and np.all(np.isfinite(mb))
    np.testing.assert_allclose(ma, mb, rtol=0.06, atol=5e-3)


def test_treenee_matches_brute_no_nee(sponza_scene):
    """NEE+MIS vs the plain BSDF-sampling estimator (no NEE): converged
    means must agree — any MIS weight/pdf bug shows up as an energy
    offset here."""
    scene, cam = sponza_scene
    kw = dict(width=40, height=30, bounces=3, bsdf="disney",
              traversal="wavefront")
    a = render(scene, cam, RenderConfig(light_sampling="tree", **kw),
               spp=12)
    b = render(scene, cam, RenderConfig(use_nee=False, **kw), spp=64)
    ma, mb = _mean_rgb(a), _mean_rgb(b)
    np.testing.assert_allclose(ma, mb, rtol=0.12, atol=8e-3)
