"""Differentiable rendering: AD gradients vs finite differences.

BASELINE.md gate: pixel gradients w.r.t. albedo / emission / roughness must
`allclose` finite differences. The counter-based RNG makes renders exactly
deterministic, so central differences are noise-free (same paths on both
sides up to the parameter's effect on f/emission — the detached estimator's
own derivative).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def setup():
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=24, height=24, bounces=3, bsdf="disney")
    return scene, cam, cfg


def _loss(scene, cam, cfg, spp=8):
    img = render(scene, cam, cfg, spp=spp)
    return jnp.mean(img)


def _fd_check(setup, set_param, get_param, eps, rtol, atol=1e-6,
              direction=None):
    """AD directional derivative vs central differences.

    Valid pointwise only for parameters the *sampler* does not depend on
    (albedo, emission): then FD with common random numbers and the
    detached-AD estimator differentiate the identical function. Sampler-
    dependent parameters (roughness) are validated at the BSDF level
    instead (test_grad_roughness_bsdf_level)."""
    scene, cam, cfg = setup

    def loss_of(val):
        return _loss(set_param(scene, val), cam, cfg)

    v0 = get_param(scene)
    g_ad = jax.grad(loss_of)(v0)
    if direction is None:
        r = np.random.default_rng(0)
        direction = jnp.asarray(r.normal(size=v0.shape).astype(np.float32))
    fd = (loss_of(v0 + eps * direction) - loss_of(v0 - eps * direction)) \
        / (2 * eps)
    ad = jnp.sum(g_ad * direction)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(fd),
                               rtol=rtol, atol=atol)


def test_grad_albedo(setup):
    _fd_check(
        setup,
        lambda s, v: s.replace(materials=s.materials.replace(base_color=v)),
        lambda s: s.materials.base_color,
        eps=1e-3, rtol=0.05)


def test_grad_emission(setup):
    # perturb only the light material: emission of non-lights is a
    # non-differentiable point (the light list gates them discontinuously)
    scene, _, _ = setup
    d = np.zeros(scene.materials.emission.shape, np.float32)
    d[3] = (1.0, 0.8, 0.6)          # MAT_LIGHT row
    _fd_check(
        setup,
        lambda s, v: s.replace(materials=s.materials.replace(emission=v)),
        lambda s: s.materials.emission,
        eps=1e-2, rtol=0.05, direction=jnp.asarray(d))


def test_grad_roughness_bsdf_level():
    """Roughness changes the sampler, so image-level FD and detached AD are
    different (both-unbiased) estimators — compare instead on a fixed-
    direction BSDF integral where they must agree exactly."""
    from truetrace_tpu.core.math import dot, sample_uniform_sphere
    from truetrace_tpu.kernels.disney import disney_eval
    from truetrace_tpu.scene.mesh import HostMaterial, material_table
    from truetrace_tpu.integrate.pathtrace import gather_material
    from truetrace_tpu.core import rng as trng

    R = 1 << 14
    wo = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.9165151]), (R, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
    u = trng.uniform2(jnp.arange(R, dtype=jnp.uint32), jnp.uint32(5),
                      jnp.uint32(9))
    wi = sample_uniform_sphere(u)

    def integral(rough):
        table = material_table([HostMaterial(base_color=(0.7, 0.6, 0.5),
                                             metallic=0.5)])
        mat = gather_material(table, jnp.zeros((R,), jnp.int32))
        mat = mat.replace(roughness=jnp.full((R,), rough))
        f, _ = disney_eval(mat, n, wo, wi)
        return jnp.mean(jnp.sum(f, -1) * jnp.abs(dot(wi, n))) * 4 * jnp.pi

    r0 = jnp.float32(0.4)
    ad = jax.grad(integral)(r0)
    eps = 1e-3
    fd = (integral(r0 + eps) - integral(r0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(fd),
                               rtol=0.02, atol=1e-4)


def test_grad_nonzero_and_finite(setup):
    scene, cam, cfg = setup
    from truetrace_tpu.diff.render_grad import render_loss_and_grad
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss, grads, img = render_loss_and_grad(scene, cam, cfg, target, spp=4)
    assert np.isfinite(float(loss))
    g = grads["base_color"]
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0
    assert np.isfinite(np.asarray(grads["roughness"])).all()
    assert np.isfinite(np.asarray(grads["emission"])).all()


def test_optimization_recovers_albedo(setup):
    """A few gradient steps must move a perturbed wall color toward the
    target image's (end-to-end inverse-rendering sanity)."""
    scene, cam, cfg = setup
    from truetrace_tpu.diff.render_grad import (
        render_loss_and_grad, set_material_params, get_material_params)
    target = render(scene, cam, cfg, spp=8)

    pert = scene.replace(materials=scene.materials.replace(
        base_color=scene.materials.base_color.at[1].set(
            jnp.asarray([0.2, 0.6, 0.7]))))
    losses = []
    cur = pert
    for i in range(10):
        loss, grads, _ = render_loss_and_grad(cur, cam, cfg, target, spp=4,
                                              base_sample=100 + i * 7)
        p = get_material_params(cur)
        g = grads["base_color"]
        step = 0.05 / jnp.maximum(jnp.abs(g).max(), 1e-6)   # normalized step
        p["base_color"] = jnp.clip(p["base_color"] - step * g, 0.0, 1.0)
        cur = set_material_params(cur, p)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_grad_env_intensity_fd():
    """FD gate for the environment-intensity gradient (linear parameter:
    AD and central differences must agree tightly)."""
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.ir import EnvMap

    meshes, mats, cam = cornell.make()
    env = EnvMap.constant((0.4, 0.5, 0.7))
    scene = compile_scene(meshes, mats, env=env)
    cfg = RenderConfig(width=16, height=16, bounces=2, bsdf="lambert")

    def loss_of(inten):
        sc = scene.replace(env=scene.env.replace(intensity=inten))
        return _loss(sc, cam, cfg, spp=4)

    g_ad = float(jax.grad(loss_of)(jnp.float32(1.0)))
    eps = 1e-2
    g_fd = (float(loss_of(jnp.float32(1.0 + eps)))
            - float(loss_of(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert abs(g_ad - g_fd) <= 0.02 * max(abs(g_fd), 1e-6), (g_ad, g_fd)
    assert abs(g_ad) > 1e-6


def test_grad_light_radiance_fd():
    """FD gate for analytic-light radiance gradients."""
    from truetrace_tpu.integrate.lights import AnalyticLights
    from truetrace_tpu.scene import cornell

    meshes, mats, cam = cornell.make()
    lights = AnalyticLights(
        position=jnp.asarray([[0.0, 0.45, 0.3]], jnp.float32),
        direction=jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32),
        radiance=jnp.asarray([[3.0, 2.0, 1.0]], jnp.float32),
        ltype=jnp.asarray([0], jnp.int32),
        spot_cos=jnp.asarray([[0.9, 0.8]], jnp.float32),
        extent=jnp.asarray([[0.3, 0.3]], jnp.float32),
        softness=jnp.asarray([0.0], jnp.float32))
    scene = compile_scene(meshes, mats, lights=lights)
    cfg = RenderConfig(width=16, height=16, bounces=2, bsdf="lambert")

    def loss_of(rad):
        sc = scene.replace(lights=scene.lights.replace(radiance=rad))
        return _loss(sc, cam, cfg, spp=4)

    r0 = scene.lights.radiance
    g_ad = np.asarray(jax.grad(loss_of)(r0))
    d = np.asarray([[0.7, -0.3, 0.5]], np.float32)
    eps = 1e-2
    lp = float(loss_of(r0 + eps * d))
    lm = float(loss_of(r0 - eps * d))
    fd_dir = (lp - lm) / (2 * eps)
    ad_dir = float((g_ad * d).sum())
    assert abs(ad_dir - fd_dir) <= 0.05 * max(abs(fd_dir), 1e-7), \
        (ad_dir, fd_dir)
    assert abs(ad_dir) > 1e-8


def test_scene_params_roundtrip(setup):
    from truetrace_tpu.diff.render_grad import (get_scene_params,
                                                set_scene_params)
    scene, cam, cfg = setup
    p = get_scene_params(scene)
    assert "env_intensity" in p
    p2 = {k: v * 2.0 if v.dtype.kind == "f" else v for k, v in p.items()}
    sc = set_scene_params(scene, p2)
    assert float(sc.env.intensity) == 2.0 * float(scene.env.intensity)
    np.testing.assert_allclose(np.asarray(sc.materials.base_color),
                               2.0 * np.asarray(scene.materials.base_color))


def test_remat_backward_memory(setup):
    """SURVEY M3 gate: with remat + detached traversal, backward temp
    memory must stay within 2x of the forward pass (per XLA's own
    memory analysis)."""
    scene, cam, _ = setup
    cfg = RenderConfig(width=32, height=32, bounces=6, bsdf="disney",
                       remat=True)

    def fwd(bc):
        sc = scene.replace(materials=scene.materials.replace(
            base_color=bc))
        return _loss(sc, cam, cfg, spp=1)

    bc0 = scene.materials.base_color
    c_fwd = jax.jit(fwd).lower(bc0).compile()
    c_bwd = jax.jit(jax.grad(fwd)).lower(bc0).compile()
    m_fwd = c_fwd.memory_analysis().temp_size_in_bytes
    m_bwd = c_bwd.memory_analysis().temp_size_in_bytes
    assert m_bwd <= 2.0 * max(m_fwd, 1 << 20), (m_fwd, m_bwd)
