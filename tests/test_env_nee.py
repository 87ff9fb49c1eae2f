"""End-to-end env-map NEE: the three-strategy NEE integrator must stay
unbiased with a textured sky (env strategy active)."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.build.env_cdf import build_env_cdf, procedural_sky
from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene


@pytest.fixture(scope="module")
def plane_under_sky():
    # a diffuse ground plane lit by the procedural sun+sky
    verts = np.array([[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]],
                     np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    mesh = HostMesh(positions=verts, indices=idx,
                    mat_id=np.zeros(2, np.int32))
    mats = [HostMaterial(base_color=(0.6, 0.6, 0.6), roughness=0.8)]
    env = build_env_cdf(procedural_sky(h=32, w=64, sun_intensity=200.0,
                                       sun_angle_deg=5.0))
    cam = Camera.look_at(eye=(0, 2.0, -6), target=(0, 0, 0), fov_y_deg=50)
    scene = compile_scene(mesh and [mesh], mats, env=env)
    return scene, cam


def test_env_nee_unbiased(plane_under_sky):
    scene, cam = plane_under_sky
    cfg_nee = RenderConfig(width=24, height=24, bounces=2, use_nee=True)
    cfg_pt = RenderConfig(width=24, height=24, bounces=2, use_nee=False)
    img_nee = np.asarray(render(scene, cam, cfg_nee, spp=96))
    img_pt = np.asarray(render(scene, cam, cfg_pt, spp=768))
    assert np.isfinite(img_nee).all() and np.isfinite(img_pt).all()
    # ground-plane rows only (sky rows are identical by construction)
    ground_nee = img_nee[16:].mean(axis=(0, 1))
    ground_pt = img_pt[16:].mean(axis=(0, 1))
    np.testing.assert_allclose(ground_nee, ground_pt, rtol=0.15)


def test_env_nee_reduces_variance(plane_under_sky):
    """With a small bright sun, NEE at equal spp must be much less noisy."""
    scene, cam = plane_under_sky
    cfg_nee = RenderConfig(width=24, height=24, bounces=2, use_nee=True)
    cfg_pt = RenderConfig(width=24, height=24, bounces=2, use_nee=False)
    a = np.asarray(render(scene, cam, cfg_nee, spp=8, base_sample=0))
    b = np.asarray(render(scene, cam, cfg_nee, spp=8, base_sample=8))
    c = np.asarray(render(scene, cam, cfg_pt, spp=8, base_sample=0))
    d = np.asarray(render(scene, cam, cfg_pt, spp=8, base_sample=8))
    var_nee = np.mean((a[16:] - b[16:]) ** 2)
    var_pt = np.mean((c[16:] - d[16:]) ** 2)
    assert var_nee < var_pt
