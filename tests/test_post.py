import jax.numpy as jnp
import numpy as np

from truetrace_tpu.post.pipeline import (
    Accumulator, PostConfig, auto_exposure, bloom, postprocess, sharpen_cas,
    taa, tonemap_aces, tonemap_agx, tonemap_reinhard)


def _img(seed=0, h=32, w=32, scale=2.0):
    r = np.random.default_rng(seed)
    return jnp.asarray((r.uniform(size=(h, w, 3)) ** 2 * scale)
                       .astype(np.float32))


def test_accumulator_is_running_mean():
    acc = Accumulator.create(8, 8)
    frames = [_img(i, 8, 8) for i in range(5)]
    for f in frames:
        acc = acc.add(f)
    mean = jnp.stack(frames).mean(axis=0)
    np.testing.assert_allclose(np.asarray(acc.image), np.asarray(mean),
                               rtol=1e-5, atol=1e-6)
    assert float(acc.count) == 5.0
    assert float(acc.reset().count) == 0.0


def test_tonemaps_range_and_monotone():
    x = jnp.linspace(0.0, 20.0, 256).reshape(-1, 1, 1).repeat(3, axis=-1)
    for tm in (tonemap_aces, tonemap_reinhard, tonemap_agx):
        y = np.asarray(tm(x))
        assert np.isfinite(y).all()
        assert y.min() >= -1e-5 and y.max() <= 1.0 + 1e-5
    # reinhard strictly monotone
    y = np.asarray(tonemap_reinhard(x))[:, 0, 0]
    assert np.all(np.diff(y) > 0)


def test_auto_exposure_normalizes():
    img = _img(1) * 100.0
    out = auto_exposure(img)
    from truetrace_tpu.core.math import luminance
    log_avg = float(jnp.exp(jnp.mean(jnp.log(jnp.maximum(
        luminance(out), 1e-6)))))
    assert abs(log_avg - 0.18) < 0.02


def test_bloom_adds_energy_near_bright():
    img = jnp.zeros((32, 32, 3), jnp.float32).at[16, 16].set(50.0)
    out = np.asarray(bloom(img, strength=0.5))
    assert out[14, 14].sum() > 0.0     # halo spread
    assert out.sum() > float(img.sum()) * 0.99


def test_taa_converges_and_clamps():
    cur = _img(2)
    hist = _img(3) * 10.0              # wild history gets clamped
    out = np.asarray(taa(cur, hist, alpha=0.2))
    assert np.isfinite(out).all()
    # clamped to neighborhood: not far above local max
    assert out.max() <= float(cur.max()) * 1.01


def test_postprocess_chain():
    img = _img(4, scale=5.0)
    cfg = PostConfig(tonemap="aces", auto_expose=True, bloom_strength=0.1,
                     sharpen=0.2)
    out, hist = postprocess(img, cfg, history=None)
    out = np.asarray(out)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    out2, _ = postprocess(img, cfg, history=hist)
    assert np.isfinite(np.asarray(out2)).all()


def test_firefly_clamp():
    from truetrace_tpu.post.pipeline import firefly_clamp
    img = jnp.ones((16, 16, 3), jnp.float32).at[8, 8].set(500.0)
    out = np.asarray(firefly_clamp(img, factor=3.0))
    assert out[8, 8, 0] <= 3.0 + 1e-3       # firefly killed
    # a 2x2 bright region (legit highlight) survives
    img2 = jnp.ones((16, 16, 3)).at[4:6, 4:6].set(100.0)
    out2 = np.asarray(firefly_clamp(img2, factor=3.0))
    assert out2[4:6, 4:6].max() > 90.0


def test_taau_upscale():
    from truetrace_tpu.post.pipeline import taau_upscale
    low = _img(7, h=16, w=16)
    up, hist = taau_upscale(low, None, scale=2)
    assert up.shape == (32, 32, 3)
    up2, _ = taau_upscale(_img(8, h=16, w=16), hist, scale=2)
    assert np.isfinite(np.asarray(up2)).all()
    # temporal blend moves toward the new frame but keeps history
    assert not np.allclose(np.asarray(up2), np.asarray(up))


def test_taau_reconstructs_subpixel_detail():
    """The jitter-aware upscaler must recover detail a box upscale cannot:
    feed a jittered low-res sampling of a striped pattern for a full
    Halton cycle and compare against the high-res ground truth."""
    import jax.numpy as jnp
    from truetrace_tpu.post.pipeline import taau_jitter, taau_upscale

    scale, h, w = 2, 24, 24
    H, W = h * scale, w * scale

    def f(py, px):      # continuous pattern, stripes of ~3 high-res px
        v = 0.5 + 0.5 * np.sin((px + 2.0 * py) * (2 * np.pi / 6.0))
        return np.repeat(v[..., None], 3, axis=-1).astype(np.float32)

    yy, xx = np.mgrid[0:H, 0:W]
    truth = f(yy + 0.5, xx + 0.5)

    hist = None
    for i in range(48):
        j = np.asarray(taau_jitter(i))
        ly, lx = np.mgrid[0:h, 0:w]
        low = f((ly + j[1]) * scale, (lx + j[0]) * scale)
        out, hist = taau_upscale(jnp.asarray(low), hist, scale=scale,
                                 jitter=jnp.asarray(j), alpha=0.35)
    err = np.abs(np.asarray(out) - truth).mean()
    # nearest-neighbor box upscale of an unjittered frame, for scale
    box = np.repeat(np.repeat(f((ly + 0.5) * scale, (lx + 0.5) * scale),
                              scale, 0), scale, 1)
    box_err = np.abs(box - truth).mean()
    assert err < 0.5 * box_err, (err, box_err)


def test_renderer_taau_upscale_smoke():
    """Renderer with upscale=2 traces quarter the rays and emits the full
    output resolution."""
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene.ir import Camera, EnvMap
    from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene

    v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    mesh = HostMesh(positions=v, indices=np.array([[0, 1, 2]], np.int32),
                    mat_id=np.zeros(1, np.int32))
    scene = compile_scene([mesh], [HostMaterial(base_color=(0.8, 0.2, 0.2))],
                          env=EnvMap.constant((0.5, 0.6, 0.7)))
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=45)
    cfg = RendererConfig(width=32, height=32, bounces=2, bsdf="lambert",
                         traversal="bvh2", light_sampling="cdf",
                         upscale=2)
    r = Renderer(scene, cam, cfg)
    st = r.init_state()
    for _ in range(3):
        disp, img, st = r.step(st)
    assert disp.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert st.taau_history.shape == (32, 32, 3)


def test_agx_looks():
    """AgX punchy/golden looks (reference baked-LUT looks, analytic
    form): monotone in exposure, in [0,1]; punchy raises saturation vs
    base, golden warms the hue (R/B ratio up) and mutes saturation."""
    import numpy as np
    from truetrace_tpu.post.pipeline import (tonemap_agx,
                                             tonemap_agx_golden,
                                             tonemap_agx_punchy)
    x = jnp.asarray(np.random.RandomState(3).uniform(
        0.02, 4.0, (64, 3)).astype(np.float32))
    for f in (tonemap_agx_punchy, tonemap_agx_golden):
        y = np.asarray(f(x))
        assert y.min() >= 0.0 and y.max() <= 1.0
    base = np.asarray(tonemap_agx(x))
    punchy = np.asarray(tonemap_agx_punchy(x))
    golden = np.asarray(tonemap_agx_golden(x))

    def sat(img):
        mu = img.mean(-1, keepdims=True)
        return np.abs(img - mu).mean()
    assert sat(punchy) > sat(base) * 1.05, (sat(punchy), sat(base))
    # golden applies a global warm cast (hue shift) PLUS muted
    # saturation: white-balance its neutral response out first, then
    # the residual saturation must sit below punchy's
    neutral = np.asarray(tonemap_agx_golden(
        jnp.ones((1, 3), jnp.float32)))[0]
    golden_wb = golden / np.maximum(neutral, 1e-6)
    assert sat(golden_wb) < sat(punchy), (sat(golden_wb), sat(punchy))
    warm = jnp.asarray([[1.0, 1.0, 1.0]])
    g = np.asarray(tonemap_agx_golden(warm))[0]
    assert g[0] > g[2] * 1.1, g          # neutral input turns golden
    # monotone in exposure (no banding/inversion): scaling up input
    # never darkens any channel
    y1 = np.asarray(tonemap_agx_punchy(x))
    y2 = np.asarray(tonemap_agx_punchy(x * 1.5))
    assert (y2 >= y1 - 1e-5).all()


def test_lut3d_bake_matches_analytic():
    """A baked ACES LUT applied through the trilinear sampler tracks the
    analytic curve (reference ToneMapTex baked-LUT parity)."""
    import numpy as np
    from truetrace_tpu.post.pipeline import (apply_lut3d,
                                             bake_tonemap_lut,
                                             tonemap_aces)
    lut = bake_tonemap_lut("aces", size=65)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 8, (64, 3)).astype(np.float32))
    got = np.asarray(apply_lut3d(x, lut))
    want = np.asarray(tonemap_aces(x))
    assert np.abs(got - want).max() < 0.02, np.abs(got - want).max()


def test_cube_lut_roundtrip(tmp_path):
    """.cube parsing: header keys, DOMAIN_*, red-fastest data order; an
    identity cube applied display-referred is a no-op."""
    import numpy as np
    from truetrace_tpu.post.pipeline import apply_lut3d, load_cube_lut
    n = 3
    lines = ["TITLE \"identity\"", "LUT_3D_SIZE 3",
             "DOMAIN_MIN 0.0 0.0 0.0", "DOMAIN_MAX 1.0 1.0 1.0"]
    for b in range(n):
        for g in range(n):
            for r in range(n):
                lines.append(f"{r/2} {g/2} {b/2}")
    p = tmp_path / "id.cube"
    p.write_text("\n".join(lines) + "\n")
    lut, (dmin, dmax) = load_cube_lut(str(p))
    assert lut.shape == (3, 3, 3, 3) and dmax == (1.0, 1.0, 1.0)
    # red-fastest: lut[b][g][r]
    np.testing.assert_allclose(lut[0, 0, 2], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(lut[2, 0, 0], [0.0, 0.0, 1.0])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))
    got = np.asarray(apply_lut3d(x, jnp.asarray(lut), shaper=False,
                                 domain=(dmin, dmax)))
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-5)


def test_cube_lut_save_roundtrip(tmp_path):
    """save_cube_lut -> load_cube_lut round-trips a baked LUT."""
    import numpy as np
    from truetrace_tpu.post.pipeline import (bake_tonemap_lut,
                                             load_cube_lut,
                                             save_cube_lut)
    lut = bake_tonemap_lut("reinhard", size=5)
    p = tmp_path / "r.cube"
    save_cube_lut(str(p), lut)
    back, (dmin, dmax) = load_cube_lut(str(p))
    np.testing.assert_allclose(back, np.asarray(lut), atol=1e-5)
    assert dmin == (0.0, 0.0, 0.0) and dmax == (1.0, 1.0, 1.0)


def test_postprocess_lut_mode():
    """PostConfig(tonemap="lut") routes through apply_lut3d and matches
    the analytic pipeline within LUT-resolution tolerance."""
    import numpy as np
    from truetrace_tpu.post.pipeline import (PostConfig, bake_tonemap_lut,
                                             postprocess)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 4, (8, 8, 3)).astype(np.float32))
    lut = bake_tonemap_lut("agx_punchy", size=65)
    out_lut, _ = postprocess(img, PostConfig(tonemap="lut", lut3d=lut))
    out_ana, _ = postprocess(img, PostConfig(tonemap="agx_punchy"))
    assert np.abs(np.asarray(out_lut) - np.asarray(out_ana)).max() < 0.03


def test_renderer_lut_post_mode():
    """RendererConfig(post=PostConfig(tonemap="lut", lut3d=...)) routes
    the composed frame's display output through the LUT (full-path
    smoke: bake ACES, compare against the analytic ACES config)."""
    import numpy as np

    from truetrace_tpu.post.pipeline import PostConfig, bake_tonemap_lut
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats, with_cwbvh=True,
                          with_light_bvh=True)

    def display(post):
        cfg = RendererConfig(width=32, height=32, bounces=2,
                             bsdf="disney", traversal="wavefront",
                             light_sampling="tree", post=post)
        r = Renderer(scene, cam, cfg)
        st = r.init_state()
        disp, _, _ = r.step(st)
        return np.asarray(disp)

    lut = bake_tonemap_lut("aces", size=65)
    d_lut = display(PostConfig(tonemap="lut", lut3d=lut))
    d_ana = display(PostConfig(tonemap="aces"))
    assert np.isfinite(d_lut).all()
    assert np.abs(d_lut - d_ana).max() < 0.05, np.abs(d_lut - d_ana).max()
