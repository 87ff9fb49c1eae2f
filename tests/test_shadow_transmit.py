"""Cutout-alpha + stained-glass shadow transport (reference
triangle_intersect_shadow, CommonData.cginc:593-634 and the alpha-mapped
any-hit skips, IntersectionKernels.compute:264-498)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import (
    HostMaterial, HostMesh, compile_scene, shadow_tint_table)


def _quad(y, half, mat, down=False):
    pos = np.array([[-half, y, -half], [half, y, -half],
                    [half, y, half], [-half, y, half]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    if not down:
        idx = idx[:, ::-1].copy()
    return HostMesh(pos, idx, np.full(2, mat, np.int32))


def test_transmit_wavefront_matches_brute():
    from truetrace_tpu.kernels.cwbvh_wavefront import transmit_wavefront
    from truetrace_tpu.kernels.traverse_ref import transmit_brute

    rng = np.random.default_rng(3)
    mats = [HostMaterial(),                                   # opaque
            HostMaterial(alpha=0.4),                          # cutout
            HostMaterial(base_color=(0.9, 0.2, 0.1),
                         spec_trans=1.0)]                     # red glass
    T = 160
    p0 = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (T, 3)).astype(np.float32)
    mid = rng.integers(0, 3, T).astype(np.int32)
    mesh = HostMesh(
        np.concatenate([p0, p0 + e1, p0 + e2]),
        np.stack([np.arange(T), T + np.arange(T), 2 * T + np.arange(T)],
                 -1).astype(np.int32),
        mid)
    scene = compile_scene([mesh], mats, with_cwbvh=True)
    assert scene.tri_shadow is not None

    R = 512
    ro = jnp.asarray(rng.uniform(-3, 3, (R, 3)).astype(np.float32))
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    tm = jnp.full((R,), 4.0, jnp.float32)

    tp_w = np.asarray(transmit_wavefront(
        scene.cw_nodes, scene.cw_leaf_rows, scene.tri_shadow, ro, rd, tm))
    tp_b = np.asarray(transmit_brute(
        scene.tri_p0, scene.tri_e1, scene.tri_e2, scene.tri_shadow,
        ro, rd, tm))
    np.testing.assert_allclose(tp_w, tp_b, rtol=1e-4, atol=1e-5)
    # the scene has glass + cutouts: some rays must land strictly between
    # 0 and 1 (partial transmission), or the test is vacuous
    assert ((tp_b.max(-1) > 1e-3) & (tp_b.max(-1) < 0.999)).any()


def _glass_scene(glass_mat):
    mats = [HostMaterial(base_color=(0.75, 0.75, 0.75)),      # floor
            HostMaterial(emission=(20.0, 20.0, 20.0)),        # light
            glass_mat]                                        # pane
    floor = _quad(0.0, 3.0, 0)
    light = _quad(4.0, 0.7, 1, down=True)
    pane = _quad(2.0, 2.0, 2, down=True)
    scene = compile_scene([floor, light, pane], mats, with_cwbvh=True)
    cam = Camera.look_at(eye=(0, 2.2, 6.0), target=(0, 0.3, 0),
                         fov_y_deg=40)
    return scene, cam


def test_stained_glass_tints_direct_light():
    """Floor lit through a red glass pane must be red-dominant; through an
    opaque pane it must be dark."""
    cfg = RenderConfig(width=32, height=32, bounces=1, bsdf="lambert",
                       traversal="wavefront", light_sampling="cdf")
    scene_r, cam = _glass_scene(HostMaterial(base_color=(0.9, 0.05, 0.05),
                                             spec_trans=1.0))
    img_r = np.asarray(render(scene_r, cam, cfg, spp=32))
    scene_o, _ = _glass_scene(HostMaterial(base_color=(0.9, 0.05, 0.05)))
    img_o = np.asarray(render(scene_o, cam, cfg, spp=32))

    # pick floor pixels (lower half of the image)
    fr = img_r[20:, :, :].mean(axis=(0, 1))
    fo = img_o[20:, :, :].mean(axis=(0, 1))
    assert fr[0] > 4.0 * max(fr[1], 1e-5), fr       # red transmission
    assert fr[0] > 5.0 * max(fo[0], 1e-5), (fr, fo)  # opaque blocks


def test_cutout_alpha_half_shadow():
    """alpha=0.5 pane: direct light on the floor ~ half of the no-pane
    level (both NEE transmittance AND closest-hit pass-through)."""
    cfg = RenderConfig(width=32, height=32, bounces=1, bsdf="lambert",
                       traversal="wavefront", light_sampling="cdf")
    scene_h, cam = _glass_scene(HostMaterial(alpha=0.5))
    scene_n, _ = _glass_scene(HostMaterial(alpha=0.0))   # fully cut out
    img_h = np.asarray(render(scene_h, cam, cfg, spp=64))
    img_n = np.asarray(render(scene_n, cam, cfg, spp=64))
    fh = img_h[20:, :, :].mean()
    fn = img_n[20:, :, :].mean()
    assert abs(fh / max(fn, 1e-6) - 0.5) < 0.1, (fh, fn)


def test_alpha_zero_quad_is_invisible():
    """A fully cut-out surface must not affect the render at all —
    closest-hit pass-through + shadow transmittance together."""
    cfg = RenderConfig(width=24, height=24, bounces=2, bsdf="lambert",
                       traversal="wavefront", light_sampling="cdf")
    scene_c, cam = _glass_scene(HostMaterial(alpha=0.0))
    mats = [HostMaterial(base_color=(0.75, 0.75, 0.75)),
            HostMaterial(emission=(20.0, 20.0, 20.0))]
    scene_w = compile_scene([_quad(0.0, 3.0, 0), _quad(4.0, 0.7, 1,
                                                       down=True)],
                            mats, with_cwbvh=True)
    a = np.asarray(render(scene_c, cam, cfg, spp=48))
    b = np.asarray(render(scene_w, cam, cfg, spp=48))
    assert b.mean() > 0.01
    rel = abs(a.mean() - b.mean()) / b.mean()
    assert rel < 0.03, (a.mean(), b.mean())
