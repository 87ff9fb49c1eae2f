"""ReSTIR DI (integrate/restir_di.py): unbiasedness vs the path tracer's
direct lighting, variance reduction from reuse."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.integrate.restir_di import ReSTIRDIState, restir_di_step
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


def _setup(h=32, w=32):
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=w, height=h, bounces=1, bsdf="lambert")
    return scene, cam, cfg


def test_di_matches_pathtraced_direct():
    """Mean of many ReSTIR-DI frames == converged 1-bounce path trace
    (emitted + NEE direct) — the unbiasedness gate."""
    scene, cam, cfg = _setup()
    H = W = 32
    # reference: 1-bounce path trace with NEE gives emitted + direct
    ref = np.asarray(render(scene, cam, cfg, spp=192))

    state = ReSTIRDIState.create(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    N = 48
    for s in range(N):
        img, state, _ = restir_di_step(scene, cam, cfg, state, s,
                                       n_candidates=4, n_spatial=1)
        acc += np.asarray(img)
    mean = acc / N
    # compare interior means (edges see roll-wrap taps)
    a = mean[4:-4, 4:-4]
    b = ref[4:-4, 4:-4]
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-6)
    assert rel < 0.05, (a.mean(), b.mean())
    # per-channel agreement too
    for c in range(3):
        relc = abs(a[..., c].mean() - b[..., c].mean()) \
            / max(b[..., c].mean(), 1e-6)
        assert relc < 0.08, (c, a[..., c].mean(), b[..., c].mean())


def _many_light_scene(h=32, w=32, n_side=4):
    """Open box floor lit by a grid of small emitters with wildly varying
    power — the regime where RIS candidate selection matters."""
    from truetrace_tpu.scene.ir import Camera
    from truetrace_tpu.scene.mesh import HostMaterial, HostMesh

    rng = np.random.default_rng(0)
    mats = [HostMaterial(base_color=(0.7, 0.7, 0.7))]
    pos_l, idx_l, mid_l = [], [], []
    # floor
    pos_l.append(np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                          np.float32))
    idx_l.append(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    mid_l.append(np.zeros(2, np.int32))
    off = 4
    for i in range(n_side):
        for j in range(n_side):
            power = float(rng.uniform(0.5, 40.0))
            mats.append(HostMaterial(emission=(power, power, power)))
            cx = -2.2 + 4.4 * i / (n_side - 1)
            cz = -2.2 + 4.4 * j / (n_side - 1)
            s = 0.12
            pos_l.append(np.array(
                [[cx - s, 2.5, cz - s], [cx + s, 2.5, cz - s],
                 [cx + s, 2.5, cz + s], [cx - s, 2.5, cz + s]], np.float32))
            idx_l.append(np.array([[0, 2, 1], [0, 3, 2]], np.int32) + off)
            mid_l.append(np.full(2, len(mats) - 1, np.int32))
            off += 4
    mesh = HostMesh(np.concatenate(pos_l), np.concatenate(idx_l),
                    np.concatenate(mid_l))
    scene = compile_scene([mesh], mats)
    cam = Camera.look_at(eye=(0, 4.0, 6.5), target=(0, 0.5, 0),
                         fov_y_deg=50)
    cfg = RenderConfig(width=w, height=h, bounces=1, bsdf="lambert")
    return scene, cam, cfg


def test_di_reuse_reduces_variance():
    """With the same per-frame candidate budget, frames with temporal +
    spatial reuse must average lower error than independent fresh frames
    (reuse sharpens the RIS selection; a 16-light scene makes candidate
    selection the dominant noise source)."""
    scene, cam, cfg = _many_light_scene()
    H = W = 32
    ref = np.asarray(render(scene, cam, cfg, spp=192))

    def err(img):
        return np.abs(np.asarray(img)[4:-4, 4:-4]
                      - ref[4:-4, 4:-4]).mean()

    # fresh: independent frames, no temporal history, no spatial taps
    e_fresh = []
    for s in range(6):
        img, _, _ = restir_di_step(scene, cam, cfg,
                                   ReSTIRDIState.create(H, W), 100 + s,
                                   n_candidates=2, n_spatial=0)
        e_fresh.append(err(img))
    # reuse: sequential frames sharing state + spatial taps
    state = ReSTIRDIState.create(H, W)
    e_reuse = []
    for s in range(12):
        img, state, _ = restir_di_step(scene, cam, cfg, state, s,
                                       n_candidates=2, n_spatial=1)
        if s >= 6:
            e_reuse.append(err(img))
    assert np.mean(e_reuse) < 0.85 * np.mean(e_fresh), \
        (np.mean(e_fresh), np.mean(e_reuse))


def test_renderer_di_integration():
    from truetrace_tpu.renderer import Renderer, RendererConfig

    scene, cam, _ = _setup()
    r = Renderer(scene, cam, RendererConfig(
        width=24, height=24, bounces=1, bsdf="lambert", traversal="bvh2",
        light_sampling="cdf", use_restir_di=True))
    st = r.init_state()
    for _ in range(2):
        display, rad, st = r.step(st)
    assert np.isfinite(np.asarray(display)).all()
    assert np.asarray(rad).max() > 0.0
