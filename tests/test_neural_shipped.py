"""The SHIPPED denoiser weights must actually denoise (VERDICT r3 item 2:
'a test asserting the shipped weights beat noisy input on a fresh
render'). Fresh = a Cornell variant rendered here, never in the training
mix's RNG stream."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "denoiser.msgpack")


def _psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, None) - np.clip(b, 0, None)) ** 2))
    return float(10.0 * np.log10(max(float(np.max(b)) ** 2, 1e-9)
                                 / max(mse, 1e-12)))


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="no shipped weights")
def test_shipped_weights_beat_noisy_on_fresh_render():
    import jax
    from flax import serialization

    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.post.neural import denoise, init_params
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make(light_radiance=17.0)
    scene = compile_scene(meshes, mats, with_cwbvh=True)
    res = 64

    cfg = RenderConfig(width=res, height=res, bounces=3,
                       bsdf="disney", traversal="wavefront")
    noisy = np.asarray(render(scene, cam, cfg, spp=2))
    target = np.asarray(render(scene, cam, cfg, spp=96, base_sample=100))

    cfg1 = RenderConfig(width=res, height=res, bounces=1, bsdf="disney",
                        traversal="wavefront")
    from truetrace_tpu.integrate.pathtrace import render_sample_with_stats
    pixel = jnp.arange(res * res, dtype=jnp.uint32)
    _, st = render_sample_with_stats(scene, cam, cfg1, pixel, 0)
    albedo = np.asarray(st["albedo"]).reshape(res, res, 3)
    normal = np.asarray(st["normal"]).reshape(res, res, 3)

    params = init_params(jax.random.PRNGKey(0), res, res)
    with open(WEIGHTS, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    out = np.asarray(denoise(params, jnp.asarray(noisy),
                             jnp.asarray(albedo), jnp.asarray(normal)))
    p_noisy = _psnr(noisy, target)
    p_neural = _psnr(out, target)
    assert p_neural > p_noisy, (p_noisy, p_neural)
