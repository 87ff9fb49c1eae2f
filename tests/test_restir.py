"""ReSTIR GI: convergence to the plain estimator + variance reduction."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.integrate.restir import ReSTIRState, restir_gi_step
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def setup():
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=32, height=32, bounces=3, restir_capture=True)
    return scene, cam, cfg


def test_restir_runs_and_is_finite(setup):
    scene, cam, cfg = setup
    state = ReSTIRState.create(cfg.height, cfg.width)
    img, state, _ = restir_gi_step(scene, cam, cfg, state, 0)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert float(state.M.max()) >= 1.0
    img2, state, _ = restir_gi_step(scene, cam, cfg, state, 1)
    assert np.isfinite(np.asarray(img2)).all()
    assert float(state.M.max()) > 1.0   # temporal accumulation happened


def test_restir_mean_matches_path_trace(setup):
    """Averaged ReSTIR frames must agree with the plain estimator's
    converged mean within the M-cap bias budget."""
    scene, cam, cfg = setup
    ref = np.asarray(render(scene, cam, cfg, spp=256))

    state = ReSTIRState.create(cfg.height, cfg.width)
    acc = np.zeros((32, 32, 3), np.float32)
    n_frames = 24
    for s in range(n_frames):
        img, state, _ = restir_gi_step(scene, cam, cfg, state, s)
        acc += np.asarray(img)
    acc /= n_frames
    # interior means (avoid the light itself dominating)
    m_restir = np.median(acc.sum(-1))
    m_ref = np.median(ref.sum(-1))
    assert abs(m_restir - m_ref) / m_ref < 0.25, (m_restir, m_ref)


def test_restir_reduces_indirect_noise(setup):
    """Frame-to-frame difference of the *indirect* component after warmup
    must be far below the plain 1-spp indirect estimator's (direct lighting
    is identical in both pipelines and would dominate a whole-image
    comparison)."""
    import jax.numpy as jnp
    from truetrace_tpu.integrate.pathtrace import render_sample_with_stats

    scene, cam, cfg = setup
    state = ReSTIRState.create(cfg.height, cfg.width)
    inds = []
    for s in range(8):
        _, state, aux = restir_gi_step(scene, cam, cfg, state, s)
        inds.append(np.asarray(aux["indirect"]))
    var_restir = np.mean((inds[-1] - inds[-2]) ** 2)

    pix = jnp.arange(32 * 32, dtype=jnp.uint32)
    _, s1 = render_sample_with_stats(scene, cam, cfg, pix, jnp.uint32(50))
    _, s2 = render_sample_with_stats(scene, cam, cfg, pix, jnp.uint32(51))
    var_pt = np.mean((np.asarray(s1["indirect"])
                      - np.asarray(s2["indirect"])) ** 2)
    assert var_restir < var_pt * 0.5, (var_restir, var_pt)


def test_restir_asvgf_pipeline():
    """ReSTIR-ASVGF (reference ReSTIRASVGF.compute): validation gradients
    drive the filter; output finite and state advances."""
    import numpy as np
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    r = Renderer(scene, cam, RendererConfig(
        width=24, height=24, bounces=3, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", use_restir=True, denoiser="asvgf"))
    st = r.init_state()
    for _ in range(3):
        display, rad, st = r.step(st)
    assert np.isfinite(np.asarray(display)).all()
    assert np.asarray(rad).max() > 0.0
    assert float(np.asarray(st.restir.M).mean()) > 1.0
