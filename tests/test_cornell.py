"""Golden integration test: Cornell box (BASELINE config 1).

Checks physical invariants of the full pipeline (camera, BVH, NEE+MIS,
RNG, accumulation) rather than pixel-exact goldens: NEE and BSDF-only
estimators must converge to the same image (unbiasedness), and known
regions must have the right colors (red/green wall bleed, light brightest).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def scene_cam():
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    return scene, cam


def test_scene_stats(scene_cam):
    scene, _ = scene_cam
    assert scene.n_tris() == 36          # 5 walls*2 + light*2 + 2 boxes*12
    assert scene.light_tris.tri_index.shape[0] == 2


def test_render_basic(scene_cam):
    scene, cam = scene_cam
    cfg = RenderConfig(width=64, height=64, bounces=3)
    img = np.asarray(render(scene, cam, cfg, spp=8))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.5               # light visible
    assert img.mean() > 0.01             # scene is lit
    # light region (top middle) is the brightest area
    top = img[:12].mean()
    bottom = img[-12:].mean()
    assert top > bottom * 0.5            # sanity; light is at top


def test_nee_matches_bsdf_only(scene_cam):
    """Unbiasedness: NEE+MIS estimator converges to the BSDF-only one."""
    scene, cam = scene_cam
    cfg_nee = RenderConfig(width=32, height=32, bounces=4, use_nee=True)
    cfg_pt = RenderConfig(width=32, height=32, bounces=4, use_nee=False)
    img_nee = np.asarray(render(scene, cam, cfg_nee, spp=192))
    img_pt = np.asarray(render(scene, cam, cfg_pt, spp=1024))
    m_nee = img_nee.mean(axis=(0, 1))
    m_pt = img_pt.mean(axis=(0, 1))
    # means agree within Monte Carlo noise
    np.testing.assert_allclose(m_nee, m_pt, rtol=0.12)


def test_color_bleed(scene_cam):
    """Red wall on the left of the image, green on the right (camera view)."""
    scene, cam = scene_cam
    cfg = RenderConfig(width=64, height=64, bounces=3)
    img = np.asarray(render(scene, cam, cfg, spp=32))
    mid = img[24:40]
    left = mid[:, 4:14].mean(axis=(0, 1))
    right = mid[:, 50:60].mean(axis=(0, 1))
    # camera at -z looking +z: +x (red wall) appears on the LEFT
    assert left[0] > left[1], f"left should be reddish: {left}"
    assert right[1] > right[0], f"right should be greenish: {right}"


def test_depth_of_field_blurs_background(scene_cam):
    """Thin-lens DoF: with a wide aperture focused near, the far wall gets
    blurrier (higher local variance reduction... measured via edge
    contrast of the box silhouettes vs the pinhole render)."""
    import jax.numpy as jnp
    from truetrace_tpu.scene.ir import Camera
    scene, cam = scene_cam
    cfg = RenderConfig(width=48, height=48, bounces=2)
    pin = np.asarray(render(scene, cam, cfg, spp=48))
    cam_dof = Camera.look_at(eye=(0.276, 0.276, -0.8),
                             target=(0.276, 0.276, 0.0), fov_y_deg=39.0,
                             aperture=0.03, focus_dist=0.5)
    dof = np.asarray(render(scene, cam_dof, cfg, spp=48))
    assert np.isfinite(dof).all()
    # the lens must actually move samples: images differ substantially
    rel = np.abs(dof - pin).mean() / max(pin.mean(), 1e-6)
    assert rel > 0.1, rel
    # and defocus lowers edge contrast once MC noise is averaged away:
    # compare 4x-downsampled gradient energy
    def sharp(img):
        d = img.reshape(12, 4, 12, 4, 3).mean((1, 3)).sum(-1)
        return np.abs(np.diff(d, axis=1)).mean()
    assert sharp(dof) < sharp(pin), (sharp(dof), sharp(pin))
