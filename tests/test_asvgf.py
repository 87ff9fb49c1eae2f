"""ASVGF: temporal-gradient detection of lighting changes."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig
from truetrace_tpu.post.asvgf import ASVGFState, asvgf_step
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def setup():
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=33, height=33, bounces=2)
    return scene, cam, cfg


def test_asvgf_runs_and_accumulates(setup):
    scene, cam, cfg = setup
    state = ASVGFState.create(cfg.height, cfg.width)
    outs = []
    for s in range(4):
        out, state, aux = asvgf_step(scene, cam, cfg, state, s)
        outs.append(np.asarray(out))
        assert np.isfinite(outs[-1]).all()
    # static scene: gradients should settle low after warmup
    assert float(aux["gradient"].mean()) < 0.5
    # history accumulates
    assert float(state.svgf.hist_len.max()) >= 3.0


def test_asvgf_detects_lighting_change(setup):
    scene, cam, cfg = setup
    state = ASVGFState.create(cfg.height, cfg.width)
    for s in range(3):
        _, state, aux_before = asvgf_step(scene, cam, cfg, state, s)
    # double the light emission: replay luminance must mismatch history
    bright = scene.replace(materials=scene.materials.replace(
        emission=scene.materials.emission * 4.0))
    _, state, aux_after = asvgf_step(bright, cam, cfg, state, 3)
    g_before = float(aux_before["gradient"].mean())
    g_after = float(aux_after["gradient"].mean())
    assert g_after > g_before * 2.0, (g_before, g_after)
    # and the denoiser's effective history shortens where it changed
    assert float(aux_after["alpha"].mean()) > float(
        aux_before["alpha"].mean())
