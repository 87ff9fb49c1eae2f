"""Round-2 integration fixes: composed frames (cache + ReSTIR DI + GI +
denoiser in ONE step, like the reference's single Render() pass chain,
RayTracingMaster.cs:954-1131), approx-MIS unbiasedness, NEE russian
roulette, and the leaf-row-aware CWBVH oracle on compiled scenes."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def scene_cam():
    meshes, mats, cam = cornell.make()
    return compile_scene(meshes, mats, with_cwbvh=True,
                         with_light_bvh=True), cam


def test_approx_mis_unbiased(scene_cam):
    """nee_mis="approx" must converge to the same image as "exact": only
    the MIS weighting function changes, and the two strategy weights still
    sum to 1 for every light point."""
    scene, cam = scene_cam
    kw = dict(width=24, height=24, bounces=3, bsdf="lambert",
              traversal="bvh2", light_sampling="tree")
    a = np.asarray(render(scene, cam,
                          RenderConfig(nee_mis="exact", **kw), spp=128))
    b = np.asarray(render(scene, cam,
                          RenderConfig(nee_mis="approx", **kw), spp=128))
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-6)
    assert rel < 0.03, (a.mean(), b.mean())


def test_nee_rr_unbiased(scene_cam):
    """NEE shadow-ray roulette reweights survivors — the mean must match
    the non-rouletted render."""
    scene, cam = scene_cam
    kw = dict(width=24, height=24, bounces=3, bsdf="lambert",
              traversal="bvh2")
    a = np.asarray(render(scene, cam, RenderConfig(nee_rr=0.0, **kw),
                          spp=160))
    b = np.asarray(render(scene, cam, RenderConfig(nee_rr=0.05, **kw),
                          spp=160))
    rel = abs(a.mean() - b.mean()) / max(a.mean(), 1e-6)
    assert rel < 0.04, (a.mean(), b.mean())


def test_cwbvh_rows_oracle_matches_brute(scene_cam):
    """traversal="cwbvh" (the rows-aware oracle) through a compiled Scene
    must agree with brute force — regression for the patched-node word-5
    divergence (nodes carry base LEAF-ROW ids after pack_leaf_rows)."""
    from truetrace_tpu.core import rng
    from truetrace_tpu.kernels.cwbvh_ref import closest_hit_cwbvh_rows
    from truetrace_tpu.scene.ir import camera_rays

    scene, cam = scene_cam
    R = 512
    pix = jnp.arange(R, dtype=jnp.uint32) * 7
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro, rd = camera_rays(cam, 64, 64, (pix % (64 * 64)).astype(jnp.int32),
                         jit2)
    hit = closest_hit_cwbvh_rows(scene.cw_nodes, scene.cw_leaf_rows,
                                 ro, rd, jnp.float32(1e30))
    # brute-force oracle
    p0 = np.asarray(scene.tri_p0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    ron, rdn = np.asarray(ro), np.asarray(rd)
    t_ref = np.full(R, 1e30, np.float32)
    for i in range(p0.shape[0]):
        pv = np.cross(rdn, e2[i])
        det = (e1[i] * pv).sum(-1)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
        tv = ron - p0[i]
        u = (tv * pv).sum(-1) * inv
        qv = np.cross(tv, e1[i])
        v = (rdn * qv).sum(-1) * inv
        t = (e2[i] * qv).sum(-1) * inv
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
            & (t > 1e-4)
        t_ref = np.where(ok & (t < t_ref), t, t_ref)
    np.testing.assert_allclose(np.asarray(hit.t), t_ref, rtol=1e-4,
                               atol=1e-4)


def test_composed_frame_all_features(scene_cam):
    """cache + ReSTIR DI + ReSTIR GI + SVGF + firefly clamp in ONE frame
    step (the configuration the reference actually runs) — and its energy
    stays consistent with a plain path trace."""
    from truetrace_tpu.renderer import Renderer, RendererConfig

    scene, cam = scene_cam
    # energy consistency: cache + DI + GI composed (no denoiser — SVGF's
    # warmup blur shifts means at tiny resolutions) vs plain path trace
    r = Renderer(scene, cam, RendererConfig(
        width=24, height=24, bounces=2, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", use_restir=True, use_restir_di=True,
        use_radiance_cache=True, cache_capacity=1 << 12))
    st = r.init_state()
    vals = []
    for _ in range(8):
        display, rad, st = r.step(st)
        vals.append(float(np.asarray(rad).mean()))
    ref = np.asarray(render(scene, cam, RenderConfig(
        width=24, height=24, bounces=2, bsdf="lambert",
        traversal="bvh2"), spp=96))
    rel = abs(np.mean(vals) - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.3, (np.mean(vals), ref.mean())

    # all features INCLUDING the denoiser: valid, finite frames
    r = Renderer(scene, cam, RendererConfig(
        width=24, height=24, bounces=2, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", use_restir=True, use_restir_di=True,
        use_radiance_cache=True, cache_capacity=1 << 12,
        denoiser="svgf"))
    st = r.init_state()
    for _ in range(3):
        display, rad, st = r.step(st)
    d = np.asarray(display)
    assert np.isfinite(d).all() and d.min() >= 0.0 and d.max() <= 1.0


def test_composed_restir_asvgf(scene_cam):
    """ReSTIR + ASVGF composition: validation gradients drive the filter
    without an extra G-buffer trace."""
    from truetrace_tpu.renderer import Renderer, RendererConfig

    scene, cam = scene_cam
    r = Renderer(scene, cam, RendererConfig(
        width=24, height=24, bounces=2, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", use_restir=True, denoiser="asvgf"))
    st = r.init_state()
    for _ in range(3):
        display, rad, st = r.step(st)
    assert np.isfinite(np.asarray(display)).all()
    assert np.asarray(rad).max() > 0.0
