"""ReCur recurrent denoiser (reference PostProcess/ReCurDenoiser/
ReCur.compute + ReCurDenoiser.cs)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.post.recur import ReCurState, recur_denoise


def _gbuffer(h, w):
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    depth = np.full((h, w), 5.0, np.float32)
    albedo = np.full((h, w, 3), 0.5, np.float32)
    return (jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(depth))


def test_temporal_variance_reduction():
    """Feeding i.i.d. noisy frames of a constant signal must converge to
    the mean with far less variance than a single frame."""
    h = w = 32
    albedo, normal, depth = _gbuffer(h, w)
    rng = np.random.default_rng(0)
    state = ReCurState.create(h, w)
    target = 0.4
    out = None
    for _ in range(24):
        noisy = jnp.asarray(
            rng.exponential(target, (h, w, 3)).astype(np.float32))
        out, state = recur_denoise(noisy, albedo, normal, depth, state)
    img = np.asarray(out)
    assert np.isfinite(img).all()
    # the denoiser reconstructs the input signal (demod+remod cancels;
    # ao ~ 1 on a flat plane)
    assert abs(img.mean() - target) < 0.08
    assert img.std() < 0.06                       # single frame std ~ 0.4


def test_edges_survive():
    """A hard albedo/normal edge must not be blurred across."""
    h = w = 32
    albedo, normal, depth = _gbuffer(h, w)
    normal = normal.at[:, :16, 0].set(1.0)
    normal = normal.at[:, :16, 2].set(0.0)
    rng = np.random.default_rng(1)
    state = ReCurState.create(h, w)
    base = np.ones((h, w, 3), np.float32)
    base[:, :16] *= 0.1       # dark left, bright right
    for _ in range(16):
        noisy = jnp.asarray(base * rng.exponential(
            1.0, (h, w, 3)).astype(np.float32))
        out, state = recur_denoise(noisy, albedo, normal, depth, state)
    img = np.asarray(out)
    assert img[:, :14].mean() < 0.35 * img[:, 18:].mean()


def test_ssao_darkens_corners():
    """A step in depth creates occlusion at the nearer side's silhouette."""
    from truetrace_tpu.post.recur import _ssao
    h = w = 32
    depth = np.full((h, w), 5.0, np.float32)
    depth[:, 16:] = 4.0        # right half pops toward the camera
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    ao = np.asarray(_ssao(jnp.asarray(normal), jnp.asarray(depth)))
    assert ao.min() >= 0.0 and ao.max() <= 1.0
    # occlusion right at the far side of the step
    assert ao[16, 14] < ao[16, 4]


def test_renderer_integration():
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    r = Renderer(scene, cam, RendererConfig(
        width=24, height=24, bounces=2, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", denoiser="recur"))
    st = r.init_state()
    for _ in range(2):
        display, rad, st = r.step(st)
    assert np.isfinite(np.asarray(display)).all()
    assert np.asarray(rad).max() > 0.0


def test_recur_composed_sequence_stable():
    """Round-5 regression: emissive pixels (albedo ~ 0) must NOT blow up
    the recurrent ladder across frames — the pre-fix composed ReCur
    exploded ~400x from frame 1 (emission demodulated by the albedo
    floor, then blurred into neighbours)."""
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats, with_cwbvh=True,
                          with_light_bvh=True)
    cfg = RendererConfig(width=32, height=32, bounces=2, bsdf="lambert",
                         traversal="wavefront", light_sampling="tree",
                         denoiser="recur")
    r = Renderer(scene, cam, cfg)
    st = r.init_state()
    for i in range(4):
        st = st._replace(accum=st.accum.reset())
        _, rad, st = r.step(st)
        a = np.asarray(rad)
        assert np.isfinite(a).all()
        # bounded by the scene's peak radiance (the light's emission)
        assert a.max() <= 16.0, (i, a.max())
        assert a.mean() < 1.0, (i, a.mean())
