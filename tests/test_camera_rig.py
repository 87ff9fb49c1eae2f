"""Camera controllers (reference FlyCamera.cs + demo animation paths)."""
import numpy as np

from truetrace_tpu.scene.camera_rig import (FlyCamera, orbit_path,
                                            spline_path)


def test_flycamera_moves_in_local_frame():
    fc = FlyCamera(position=np.array([0, 1, 5], np.float32))
    cam0 = fc.camera()
    # looking down -z by default
    fwd0 = -np.asarray(cam0.c2w)[2, :3]
    np.testing.assert_allclose(fwd0, [0, 0, -1], atol=1e-6)
    # forward motion moves along -z
    fc.move(forward=2.0)
    np.testing.assert_allclose(fc.position, [0, 1, 3], atol=1e-6)
    # yaw 90 deg left, forward now moves along -x
    fc.look(d_yaw=np.pi / 2).move(forward=1.0)
    np.testing.assert_allclose(fc.position, [-1, 1, 3], atol=1e-5)
    # pitch clamps short of the pole
    fc.look(d_pitch=10.0)
    assert fc.pitch < 0.5 * np.pi


def test_flycamera_camera_matches_lookat():
    fc = FlyCamera(position=np.array([2, 1, 2], np.float32))
    fc.look(d_yaw=0.7, d_pitch=-0.2)
    cam = fc.camera()
    c2w = np.asarray(cam.c2w)
    # orthonormal frame, eye in row 3
    np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3),
                               atol=1e-5)
    np.testing.assert_allclose(c2w[3, :3], fc.position, atol=1e-6)


def test_orbit_path_circles_center():
    cams = orbit_path((1, 0, -2), radius=3.0, height=2.0, n_frames=8)
    assert len(cams) == 8
    eyes = np.stack([np.asarray(c.c2w)[3, :3] for c in cams])
    d = np.linalg.norm(eyes - np.array([1, 2, -2]), axis=-1)
    np.testing.assert_allclose(d, 3.0, atol=1e-5)
    # all look toward the center
    for c in cams:
        fwd = -np.asarray(c.c2w)[2, :3]
        to_c = np.array([1, 0, -2]) - np.asarray(c.c2w)[3, :3]
        to_c /= np.linalg.norm(to_c)
        assert fwd @ to_c > 0.99


def test_spline_path_interpolates_endpoints():
    wps = [(0, 0, 0), (2, 1, 0), (4, 0, 2)]
    tgs = [(1, 0, -1)] * 3
    cams = spline_path(wps, tgs, n_frames=16)
    assert len(cams) == 16
    e0 = np.asarray(cams[0].c2w)[3, :3]
    e1 = np.asarray(cams[-1].c2w)[3, :3]
    np.testing.assert_allclose(e0, wps[0], atol=1e-4)
    np.testing.assert_allclose(e1, wps[-1], atol=1e-4)
    # path is smooth: consecutive steps have bounded length
    eyes = np.stack([np.asarray(c.c2w)[3, :3] for c in cams])
    steps = np.linalg.norm(np.diff(eyes, axis=0), axis=-1)
    assert steps.max() < 3.0 * steps.mean()
