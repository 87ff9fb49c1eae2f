"""Texture pipeline: tangents, normal mapping, mip chain + ray-cone LOD
(reference: normal mapping RayTracingShader.compute:129-159, atlas
AssetManager.cs:396-533)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.scene.atlas import AtlasBuilder, sample_atlas
from truetrace_tpu.scene.ir import Camera, EnvMap
from truetrace_tpu.scene.mesh import (HostMaterial, HostMesh, compile_scene,
                                      flatten_meshes)


def _quad(z=0.0):
    return HostMesh(
        positions=np.array([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                           np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        mat_id=np.zeros(2, np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))


def test_tangents_follow_u():
    tris = flatten_meshes([_quad()])
    tan = tris["tan"]
    # +u runs along +x for this quad
    np.testing.assert_allclose(tan, np.tile([1.0, 0.0, 0.0], (2, 1)),
                               atol=1e-5)


def test_mip_chain_averages():
    builder = AtlasBuilder()
    # 2-px blocks: contrasty at L0 bilinear, flat 0.5 from L2 up
    checker = (np.indices((32, 32)) // 2).sum(0) % 2
    tid = builder.add(checker.astype(np.float32))
    atlas, rects, level_y = builder.build()
    assert level_y.shape[0] >= 3
    uv = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (64, 2)),
                     jnp.float32)
    ids = jnp.full((64,), tid, jnp.int32)
    lv0 = np.asarray(sample_atlas(jnp.asarray(atlas), jnp.asarray(rects),
                                  ids, uv, lod=jnp.zeros(64),
                                  level_y=jnp.asarray(level_y)))[:, 0]
    lv3 = np.asarray(sample_atlas(jnp.asarray(atlas), jnp.asarray(rects),
                                  ids, uv, lod=jnp.full(64, 3.0),
                                  level_y=jnp.asarray(level_y)))[:, 0]
    # level 3 of a 2-px checker is flat 0.5; level 0 is bimodal
    assert lv0.std() > 0.15
    assert np.abs(lv3 - 0.5).max() < 0.05


def test_normal_map_perturbs_gbuffer():
    from truetrace_tpu.integrate.pathtrace import (RenderConfig,
                                                   render_sample_with_stats)
    builder = AtlasBuilder()
    # constant normal map tilting +45 deg around the bitangent:
    # tangent-space n = (sin45, 0, cos45) -> rgb = n*0.5+0.5
    nmap = np.zeros((16, 16, 3), np.float32)
    nmap[..., 0] = 0.5 + 0.5 * np.sin(np.pi / 4)
    nmap[..., 1] = 0.5
    nmap[..., 2] = 0.5 + 0.5 * np.cos(np.pi / 4)
    nm_id = builder.add(nmap)
    atlas, rects, level_y = builder.build()
    mats = [HostMaterial(base_color=(1, 1, 1), tex_normal=nm_id)]
    scene = compile_scene([_quad()], mats, env=EnvMap.constant((1, 1, 1)),
                          atlas=atlas, atlas_rects=rects,
                          atlas_level_y=level_y)
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=40)
    cfg = RenderConfig(width=8, height=8, bounces=1, bsdf="lambert")
    pixel = jnp.arange(64, dtype=jnp.uint32)
    _, st = render_sample_with_stats(scene, cam, cfg, pixel, 0)
    n = np.asarray(st["normal"]).reshape(8, 8, 3)
    center = n[4, 4]
    # perturbed towards +x by ~45 deg (tangent = +x, quad normal = +z)
    assert center[0] > 0.5 and center[2] > 0.5, center
    np.testing.assert_allclose(np.linalg.norm(center), 1.0, atol=1e-3)


def test_lod_increases_with_distance():
    """Far quad must land on a higher mip than a near one: render a
    checker-textured quad near and far; far result is closer to the
    mip average (less contrast)."""
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    builder = AtlasBuilder()
    # 8-px blocks: resolvable at the near distance, mip-flattened far
    checker = ((np.indices((64, 64)) // 8).sum(0) % 2).astype(np.float32)
    tid = builder.add(checker)
    atlas, rects, level_y = builder.build()
    mats = [HostMaterial(base_color=(1, 1, 1), tex_albedo=tid)]
    cfg = RenderConfig(width=16, height=16, bounces=2, bsdf="lambert")
    env = EnvMap.constant((1, 1, 1))

    def quad_pixels(dist, lo, hi):
        scene = compile_scene([_quad()], mats, env=env, atlas=atlas,
                              atlas_rects=rects, atlas_level_y=level_y)
        cam = Camera.look_at(eye=(0, 0, dist), target=(0, 0, 0),
                             fov_y_deg=40)
        img = np.asarray(render(scene, cam, cfg, spp=2))
        return img[lo:hi, lo:hi, 0]

    near = quad_pixels(1.2, 2, 14)    # quad fills the frame
    far = quad_pixels(8.0, 7, 9)      # quad covers ~4x4 px center
    # near view resolves checker blocks; far view lands on a high mip
    # whose average is flat 0.5 (modulated by lighting, so compare std)
    assert near.std() > 2.0 * far.std() + 1e-4, (near.std(), far.std())


def test_hue_rotate_permutes_channels():
    """120-degree hue rotation maps R->G->B->R (core/math.hue_rotate,
    reference Unity_Hue_Degrees, RayTracingShader.compute:640)."""
    from truetrace_tpu.core.math import hue_rotate
    rgb = jnp.asarray([[0.8, 0.1, 0.3]], jnp.float32)
    out0 = np.asarray(hue_rotate(rgb, jnp.zeros(1)))
    np.testing.assert_allclose(out0, np.asarray(rgb), atol=1e-5)
    out120 = np.asarray(hue_rotate(rgb, jnp.full((1,), 120.0)))
    np.testing.assert_allclose(out120[0], [0.3, 0.8, 0.1], atol=1e-4)
    out360 = np.asarray(hue_rotate(rgb, jnp.full((1,), 360.0)))
    np.testing.assert_allclose(out360, np.asarray(rgb), atol=1e-4)


def test_adjust_color_neutral_and_knobs():
    from truetrace_tpu.core.math import adjust_color
    rgb = jnp.asarray([[0.6, 0.2, 0.4]], jnp.float32)
    one = jnp.ones((1,), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    black = jnp.zeros((1, 3), jnp.float32)
    # neutral parameters = identity (in-gamut input)
    out = np.asarray(adjust_color(rgb, zero, one, one, one, black, zero))
    np.testing.assert_allclose(out, np.asarray(rgb), atol=1e-5)
    # saturation 0 -> gray at the luminance
    gray = np.asarray(adjust_color(rgb, zero, one, zero, one, black, zero))
    assert np.ptp(gray[0]) < 1e-5
    # blend_factor 1 -> flat blend color
    red = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    out = np.asarray(adjust_color(rgb, zero, one, one, one, red, one))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-5)


def test_texture_adjustments_in_render():
    """saturation=0 on a textured material turns a colored checker
    grayscale in the rendered albedo (reference kernel_shade adjustment
    chain, RayTracingShader.compute:630-649)."""
    from truetrace_tpu.integrate.pathtrace import (RenderConfig,
                                                   render_sample_with_stats)
    builder = AtlasBuilder()
    tex = np.zeros((16, 16, 3), np.float32)
    tex[..., 0] = 0.9
    tex[..., 1] = 0.2
    tex[..., 2] = 0.5
    tid = builder.add(tex)
    atlas, rects, level_y = builder.build()
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=40)
    cfg = RenderConfig(width=8, height=8, bounces=1, bsdf="lambert")
    pixel = jnp.arange(64, dtype=jnp.uint32)

    def albedo(mat):
        scene = compile_scene([_quad()], [mat],
                              env=EnvMap.constant((1, 1, 1)), atlas=atlas,
                              atlas_rects=rects, atlas_level_y=level_y)
        _, st = render_sample_with_stats(scene, cam, cfg, pixel, 0)
        return np.asarray(st["albedo"]).reshape(8, 8, 3)[4, 4]

    a_plain = albedo(HostMaterial(base_color=(1, 1, 1), tex_albedo=tid))
    np.testing.assert_allclose(a_plain, [0.9, 0.2, 0.5], atol=0.02)
    a_gray = albedo(HostMaterial(base_color=(1, 1, 1), tex_albedo=tid,
                                 saturation=0.0))
    assert np.ptp(a_gray) < 0.02, a_gray
    lum = 0.2126 * 0.9 + 0.7152 * 0.2 + 0.0722 * 0.5
    np.testing.assert_allclose(a_gray.mean(), lum, atol=0.05)


def test_roughness_metallic_remap():
    """A degenerate remap range (c,c) pins the shading parameter at c —
    the render must equal one whose material carries c directly
    (reference smoothness remap, RayTracingShader.compute:654-662)."""
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=40)
    cfg = RenderConfig(width=8, height=8, bounces=2, bsdf="disney")

    def img(mat):
        scene = compile_scene([_quad()], [mat],
                              env=EnvMap.constant((1, 1, 1)))
        return np.asarray(render(scene, cam, cfg, spp=4))

    base = dict(base_color=(0.8, 0.8, 0.8), metallic=1.0)
    a = img(HostMaterial(roughness=0.1, rough_remap=(0.7, 0.7), **base))
    b = img(HostMaterial(roughness=0.7, **base))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    c = img(HostMaterial(roughness=0.1, **base))
    assert np.abs(a - c).max() > 1e-3   # remap actually changed the lobe

    a = img(HostMaterial(roughness=0.4, metallic=0.0,
                         metal_remap=(1.0, 1.0), base_color=(0.8, 0.6, 0.4)))
    b = img(HostMaterial(roughness=0.4, metallic=1.0,
                         base_color=(0.8, 0.6, 0.4)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
