"""Learned denoiser (post/neural.py — the reference's OIDN plugin slot)."""
import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.post.neural import (denoise, init_params, loss_fn,
                                       make_train_step)


def _batch(key, h=32, w=32):
    k1, k2 = jax.random.split(key)
    target = jax.random.uniform(k1, (1, h, w, 3)) * 0.5
    noisy = target * jax.random.gamma(k2, 2.0, (1, h, w, 3)) / 2.0
    albedo = jnp.full((1, h, w, 3), 0.5)
    normal = jnp.concatenate([jnp.zeros((1, h, w, 2)),
                              jnp.ones((1, h, w, 1))], -1)
    return dict(noisy=noisy, target=target, albedo=albedo, normal=normal)


def test_forward_shapes_and_finiteness():
    params = init_params(jax.random.PRNGKey(0), 32, 32)
    b = _batch(jax.random.PRNGKey(1))
    out = denoise(params, b["noisy"][0], b["albedo"][0], b["normal"][0])
    assert out.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0


def test_training_reduces_loss():
    params = init_params(jax.random.PRNGKey(0), 32, 32)
    tx, step = make_train_step(3e-3)
    opt_state = tx.init(params)
    b = _batch(jax.random.PRNGKey(2))
    l0 = float(loss_fn(params, b))
    for _ in range(120):
        params, opt_state, loss = step(params, opt_state, b)
    l1 = float(loss_fn(params, b))
    assert np.isfinite(l1)
    assert l1 < 0.75 * l0, (l0, l1)
    # and the denoised output is closer to the target than the input
    out = denoise(params, b["noisy"][0], b["albedo"][0], b["normal"][0])
    err_in = float(jnp.mean(jnp.abs(b["noisy"][0] - b["target"][0])))
    err_out = float(jnp.mean(jnp.abs(out - b["target"][0])))
    assert err_out < err_in


def test_param_roundtrip_serialization():
    from flax import serialization
    params = init_params(jax.random.PRNGKey(0), 32, 32)
    raw = serialization.to_bytes(params)
    params2 = serialization.from_bytes(params, raw)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_renderer_neural_denoiser():
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    r = Renderer(scene, cam, RendererConfig(
        width=32, height=32, bounces=2, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", denoiser="neural"))
    st = r.init_state()
    display, rad, st = r.step(st)
    assert np.isfinite(np.asarray(display)).all()
