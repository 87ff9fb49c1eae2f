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


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="shipped weights missing")
def test_neural_taa_cuts_flicker():
    """denoiser="neural_taa" (U-Net + clamped temporal blend) threads its
    history through FrameState and cuts frame-to-frame flicker vs the
    plain neural path on a static 1-spp sequence (the matrix showed
    plain neural flickering ~3x the temporal filters)."""
    import numpy as np

    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats, with_cwbvh=True,
                          with_light_bvh=True)

    def run(den):
        cfg = RendererConfig(width=48, height=48, bounces=2,
                             bsdf="disney", traversal="wavefront",
                             light_sampling="tree", denoiser=den,
                             neural_weights=WEIGHTS)
        r = Renderer(scene, cam, cfg)
        st = r.init_state()
        outs = []
        for _ in range(6):
            st = st._replace(accum=st.accum.reset())
            _, rad, st = r.step(st)
            outs.append(np.asarray(rad))
        return outs, st

    outs_n, _ = run("neural")
    outs_t, st_t = run("neural_taa")
    assert st_t.neural_hist is not None
    assert np.isfinite(st_t.neural_hist).all()
    for o in outs_t:
        assert np.isfinite(o).all()

    def tm(x):
        x = np.clip(x, 0, None)
        return x / (1 + x)

    def flicker(outs):
        return np.mean([np.abs(tm(outs[i]) - tm(outs[i - 1])).mean()
                        for i in (4, 5)])

    fn, ft = flicker(outs_n), flicker(outs_t)
    assert ft < 0.6 * fn, (fn, ft)
    # the temporal blend must not wash the image out
    assert abs(tm(outs_t[-1]).mean() - tm(outs_n[-1]).mean()) < 0.05
