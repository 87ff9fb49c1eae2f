"""Partial rendering (ray budgeting) + temporal auto-exposure.

Reference counterparts: DoPartialRendering / PartialRenderingFactor
(RayTracingShader.compute:91-97) and AutoExpose.compute (histogram
median + asymmetric temporal adaptation)."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.post.pipeline import PostConfig, auto_exposure_temporal
from truetrace_tpu.renderer import Renderer, RendererConfig
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def scene_cam():
    meshes, mats, cam = cornell.make()
    return compile_scene(meshes, mats), cam


def _run(scene, cam, k, frames):
    cfg = RendererConfig(width=32, height=32, bounces=2, bsdf="lambert",
                         traversal="bvh2", light_sampling="cdf",
                         partial_rendering=k)
    r = Renderer(scene, cam, cfg)
    st = r.init_state()
    for _ in range(frames):
        display, radiance, st = r.step(st)
    return np.asarray(radiance), r, st


def test_partial_converges_to_full(scene_cam):
    scene, cam = scene_cam
    full, _, _ = _run(scene, cam, 1, 8)
    part, _, _ = _run(scene, cam, 4, 11)   # 3 warm-up + 8 real
    assert np.isfinite(part).all()
    # every interleave phase has traced: after the k-frame warm-up the
    # untraced-pixel fraction drops to sampling-noise level (a pixel can
    # still be black with only 2 samples — env=0 misses)
    early, _, _ = _run(scene, cam, 4, 2)
    ze, zp = (early.mean(-1) == 0).mean(), (part.mean(-1) == 0).mean()
    assert zp < 0.2 and zp < ze - 0.2, (ze, zp)
    np.testing.assert_allclose(part.mean(), full.mean(), rtol=0.1)

    # per-frame ray count really is 1/k (the interactivity lever)
    cfg = RendererConfig(width=32, height=32, bounces=2, bsdf="lambert",
                         traversal="bvh2", light_sampling="cdf",
                         partial_rendering=4)
    r = Renderer(scene, cam, cfg)
    st = r.init_state()
    d, rad, st = r.step(st)
    assert rad.shape == (32, 32, 3)


def _run_cfg(scene, cam, frames, **kw):
    cfg = RendererConfig(width=32, height=32, bounces=2, bsdf="lambert",
                         traversal="bvh2", light_sampling="cdf", **kw)
    r = Renderer(scene, cam, cfg)
    st = r.init_state()
    display = radiance = None
    for _ in range(frames):
        display, radiance, st = r.step(st)
    return np.asarray(display), np.asarray(radiance), st


def test_partial_composes_with_restir_svgf(scene_cam):
    """Round-4 item: the 1/k lever works INSIDE the quality pipeline
    (reference gates only raygen, RayTracingShader.compute:91-97): stale
    pixels submit no fresh ReSTIR candidate; reservoirs persist and the
    full-res composed G-buffer feeds the denoiser."""
    scene, cam = scene_cam
    disp_f, rad_f, _ = _run_cfg(scene, cam, 6, use_restir=True,
                                denoiser="svgf")
    disp_p, rad_p, _ = _run_cfg(scene, cam, 9, use_restir=True,
                                denoiser="svgf", partial_rendering=4)
    assert np.isfinite(disp_p).all() and np.isfinite(rad_p).all()
    # same scene brightness once warm (ReSTIR shade on composed buffers)
    np.testing.assert_allclose(rad_p.mean(), rad_f.mean(), rtol=0.25)


def test_partial_composes_with_restir_di(scene_cam):
    scene, cam = scene_cam
    _, rad_f, _ = _run_cfg(scene, cam, 6, use_restir_di=True)
    _, rad_p, _ = _run_cfg(scene, cam, 9, use_restir_di=True,
                           partial_rendering=4)
    assert np.isfinite(rad_p).all()
    np.testing.assert_allclose(rad_p.mean(), rad_f.mean(), rtol=0.25)


def test_partial_composes_with_cache_and_upscale(scene_cam):
    scene, cam = scene_cam
    _, rad_p, st = _run_cfg(scene, cam, 6, use_radiance_cache=True,
                            upscale=2, partial_rendering=2)
    assert np.isfinite(rad_p).all()
    assert rad_p.shape == (32, 32, 3)
    assert rad_p.mean() > 0.01


def test_temporal_exposure_adapts_smoothly():
    bright = jnp.ones((16, 16, 3)) * 4.0
    dim = jnp.ones((16, 16, 3)) * 0.05
    # cold start jumps to target
    _, e0 = auto_exposure_temporal(bright, jnp.float32(-1.0))
    assert float(e0) > 0
    # constant input -> steady exposure (no pumping)
    _, e1 = auto_exposure_temporal(bright, e0)
    assert abs(float(e1) - float(e0)) < 0.02 * abs(float(e0))
    # brightness step: exposure moves toward the new target, but only a
    # fraction per frame (time-constant adaptation, not a jump)
    _, e_target = auto_exposure_temporal(dim, jnp.float32(-1.0))
    _, e_step = auto_exposure_temporal(dim, e0)
    move = abs(float(e_step) - float(e0))
    full = abs(float(e_target) - float(e0))
    assert 0.0 < move < 0.1 * full + 1e-6
    # repeated frames converge monotonically toward the target
    e = e0
    for _ in range(400):
        _, e = auto_exposure_temporal(dim, e)
    assert abs(float(e) - float(e_target)) < 0.1 * abs(float(e_target))


def test_renderer_threads_exposure_state(scene_cam):
    scene, cam = scene_cam
    cfg = RendererConfig(width=16, height=16, bounces=2, bsdf="lambert",
                         traversal="bvh2", light_sampling="cdf",
                         post=PostConfig(auto_expose=True))
    r = Renderer(scene, cam, cfg)
    st = r.init_state()
    assert st.exposure is not None and float(st.exposure) < 0
    _, _, st = r.step(st)
    e1 = float(st.exposure)
    assert e1 > 0
    _, _, st = r.step(st)
    assert abs(float(st.exposure) - e1) < 0.5 * e1 + 1e-6
