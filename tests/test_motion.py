"""Motion-vector reprojection (post/motion.py) + ReSTIR temporal
validation (the reference's per-pixel motion reprojection and
ExtraSampleValidation, ReSTIRGI.compute:120-192)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.post.motion import motion_vectors, project, world_from_depth
from truetrace_tpu.scene.ir import Camera


def test_static_camera_zero_motion():
    cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), fov_y_deg=45)
    depth = jnp.full((16, 16), 5.0)
    mv = np.asarray(motion_vectors(cam, cam, depth))
    assert np.abs(mv).max() < 1e-3


def test_lateral_shift_matches_expected_pixels():
    """Camera translating right by dx world units: a fronto-parallel plane
    at distance d moves by dx / (2*d*tan(fov/2)/H) pixels."""
    H = W = 32
    d = 5.0
    fov = 45.0
    cam0 = Camera.look_at(eye=(0, 0, d), target=(0, 0, 0), fov_y_deg=fov)
    shift = 0.4
    cam1 = Camera.look_at(eye=(shift, 0, d), target=(shift, 0, 0),
                          fov_y_deg=fov)
    depth = jnp.full((H, W), d)
    mv = np.asarray(motion_vectors(cam0, cam1, depth))
    expect_dx = -shift / (2 * d * np.tan(np.radians(fov) / 2) / H)
    # depth is ray distance, so the analytic value holds at the center
    # ray only (corners see extra parallax)
    center = mv[15:17, 15:17]
    np.testing.assert_allclose(center[..., 0], expect_dx, atol=0.05)
    np.testing.assert_allclose(center[..., 1], 0.0, atol=0.05)


def test_project_roundtrip():
    cam = Camera.look_at(eye=(1, 2, 6), target=(0, 0.5, 0), fov_y_deg=50)
    depth = jnp.asarray(np.random.default_rng(0).uniform(
        3, 8, (16, 16)).astype(np.float32))
    p = world_from_depth(cam, depth)
    px, py, ok = project(cam, p, 16, 16)
    xs = np.arange(16) + 0.5
    np.testing.assert_allclose(np.asarray(px) + 0.5,
                               np.tile(xs, (16, 1)), atol=1e-2)
    assert bool(jnp.all(ok))


def test_restir_motion_reprojection_runs():
    """Moving-camera ReSTIR with motion reprojection stays finite and
    keeps history alive (the gates don't nuke everything)."""
    from truetrace_tpu.integrate.pathtrace import RenderConfig
    from truetrace_tpu.integrate.restir import ReSTIRState, restir_gi_step
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam0 = cornell.make()
    scene = compile_scene(meshes, mats)
    H = W = 32
    cfg = RenderConfig(width=W, height=H, bounces=3, bsdf="lambert",
                       restir_capture=True)
    state = ReSTIRState.create(H, W)
    for s in range(4):
        _, state, _ = restir_gi_step(scene, cam0, cfg, state, s)
    # small lateral pan of the actual scene camera
    cam1 = cam0.replace(
        c2w=cam0.c2w.at[3, :3].add(jnp.asarray([0.01, 0.0, 0.0])))
    img, st_mv, aux = restir_gi_step(scene, cam1, cfg, state, 10,
                                     prev_cam=cam0)
    assert np.isfinite(np.asarray(img)).all()
    assert float(np.asarray(st_mv.M).mean()) > 1.5  # history survives


def test_validation_drops_stale_history():
    """Changing the light's emission must trigger the validation gradient
    and cut temporal M (the ExtraSampleValidation behavior)."""
    from truetrace_tpu.integrate.pathtrace import RenderConfig
    from truetrace_tpu.integrate.restir import ReSTIRState, restir_gi_step
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    H = W = 32
    cfg = RenderConfig(width=W, height=H, bounces=3, bsdf="lambert",
                       restir_capture=True)
    state = ReSTIRState.create(H, W)
    for s in range(6):
        _, state, _ = restir_gi_step(scene, cam, cfg, state, s)
    # 10x the light
    bright = scene.replace(materials=scene.materials.replace(
        emission=scene.materials.emission * 10.0))
    _, state2, aux = restir_gi_step(bright, cam, cfg, state, 20)
    g = np.asarray(aux["gradient"])
    assert g.max() > 0.4       # change detected somewhere
    # pixels with strong gradients lost their history
    m = np.asarray(state2.M)
    strong = g > 0.5
    if strong.any():
        assert m[strong].mean() < np.asarray(state.M)[strong].mean()
