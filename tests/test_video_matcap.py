"""Video textures (reference VideoObject.cs) and matcap shading
(RayTracingShader.compute:129-159)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.scene.atlas import AtlasBuilder
from truetrace_tpu.scene.video import (bind_video_frame, bind_video_time,
                                       register_video)


def _scene_with_video():
    from truetrace_tpu.scene.ir import Camera, EnvMap
    from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene

    builder = AtlasBuilder()
    # 3-frame video: pure red / green / blue
    frames = np.zeros((3, 8, 8, 3), np.float32)
    frames[0, ..., 0] = 1.0
    frames[1, ..., 1] = 1.0
    frames[2, ..., 2] = 1.0
    vid = register_video(builder, frames, fps=10.0)
    atlas, rects, _ = builder.build()

    quad = HostMesh(
        positions=np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                           np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        mat_id=np.zeros(2, np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    mats = [HostMaterial(base_color=(1, 1, 1), emission=(4, 4, 4),
                         tex_emission=vid.tex_id)]
    scene = compile_scene([quad], mats, env=EnvMap.constant((0, 0, 0)),
                          atlas=atlas, atlas_rects=rects)
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=45)
    return scene, cam, vid


def test_video_frame_binding():
    scene, cam, vid = _scene_with_video()
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    cfg = RenderConfig(width=16, height=16, bounces=1, bsdf="lambert")
    means = []
    for k in range(3):
        sc = bind_video_frame(scene, vid, k)
        img = np.asarray(render(sc, cam, cfg, spp=4))
        means.append(img.reshape(-1, 3).mean(0))
    means = np.stack(means)
    # frame k must be dominated by channel k
    for k in range(3):
        assert means[k, k] > 2.0 * (means[k].sum() - means[k, k]) + 1e-6, \
            means


def test_video_time_binding_wraps():
    scene, cam, vid = _scene_with_video()
    s1 = bind_video_time(scene, vid, 0.25)    # frame 2 at 10 fps
    s2 = bind_video_frame(scene, vid, 5)      # wraps to frame 2
    np.testing.assert_array_equal(np.asarray(s1.atlas), np.asarray(s2.atlas))


def test_matcap_modulates_primary():
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.ir import Camera, EnvMap
    from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene

    builder = AtlasBuilder()
    mc = np.zeros((16, 16, 3), np.float32)
    mc[..., 0] = 1.0            # red matcap everywhere
    mc_id = builder.add(mc)
    atlas, rects, _ = builder.build()

    quad = HostMesh(
        positions=np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                           np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        mat_id=np.zeros(2, np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    base = [HostMaterial(base_color=(1, 1, 1))]
    with_mc = [HostMaterial(base_color=(1, 1, 1), tex_matcap=mc_id)]
    env = EnvMap.constant((1.0, 1.0, 1.0))
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=45)
    cfg = RenderConfig(width=16, height=16, bounces=2, bsdf="lambert")

    img0 = np.asarray(render(compile_scene(
        [quad], base, env=env, atlas=atlas, atlas_rects=rects), cam, cfg,
        spp=4))
    img1 = np.asarray(render(compile_scene(
        [quad], with_mc, env=env, atlas=atlas, atlas_rects=rects), cam, cfg,
        spp=4))
    # matcap kills G/B on the quad, keeps R
    c0 = img0.reshape(-1, 3).mean(0)
    c1 = img1.reshape(-1, 3).mean(0)
    assert abs(c1[0] - c0[0]) < 0.05
    assert c1[1] < 0.5 * c0[1] and c1[2] < 0.5 * c0[2]
