"""Per-material texture transform + slot parity (round-4 sweep).

Counterparts: UV scale/offset/rotation (reference AlbedoTextureScale /
SecondaryTextureScale / Rotation, CommonVars.cs:123-136, applied in
AlignUV CommonData.cginc:569-591), NormalStrength (CommonVars.cs:127,
RayTracingShader.compute:134), separate Metallic/Roughness/Alpha/
MatCapMask texture bindings (CommonVars.cs:96-103,
RayTracingShader.compute:654-657 + 152-157), authored TransmittanceColor
(CommonVars.cs:109, RayTracingShader.compute:640).
"""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.integrate.pathtrace import (RenderConfig, render,
                                               render_sample_with_stats)
from truetrace_tpu.scene.atlas import AtlasBuilder, transform_uv
from truetrace_tpu.scene.ir import Camera, EnvMap
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene


def _quad(z=0.0):
    return HostMesh(
        positions=np.array([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                           np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        mat_id=np.zeros(2, np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))


def _quadrant_tex():
    """32x32 texture split into 4 solid color quadrants.

    v<.5,u<.5 = red; v<.5,u>=.5 = green; v>=.5,u<.5 = blue;
    v>=.5,u>=.5 = white. (Texture row 0 = v 0.)"""
    t = np.zeros((32, 32, 3), np.float32)
    t[:16, :16] = (1, 0, 0)
    t[:16, 16:] = (0, 1, 0)
    t[16:, :16] = (0, 0, 1)
    t[16:, 16:] = (1, 1, 1)
    return t


def test_transform_uv_identity_scale_rot():
    uv = jnp.asarray([[0.25, 0.75], [0.1, 0.2]], jnp.float32)
    ident = jnp.broadcast_to(jnp.asarray([1.0, 1, 0, 0]), (2, 4))
    zero = jnp.zeros(2)
    np.testing.assert_allclose(np.asarray(transform_uv(uv, ident, zero)),
                               np.asarray(uv), atol=1e-6)
    # scale 2 + offset .5 (pre-wrap values; sample_atlas wraps)
    so = jnp.broadcast_to(jnp.asarray([2.0, 2.0, 0.5, 0.0]), (2, 4))
    out = np.asarray(transform_uv(uv, so, zero))
    np.testing.assert_allclose(out, [[1.0, 1.5], [0.7, 0.4]], atol=1e-6)
    # 90-degree rotation about (.5,.5): (u,v) -> (.5-(v-.5), .5+(u-.5))
    rot = jnp.full((2,), np.pi / 2, jnp.float32)
    out = np.asarray(transform_uv(uv, ident, rot))
    expect = np.asarray([[0.25, 0.25], [0.8, 0.1]])
    np.testing.assert_allclose(out, expect % 1.0, atol=1e-5)


def _albedo_at(mat, atlas, rects, level_y, res=8):
    scene = compile_scene([_quad()], [mat], env=EnvMap.constant((1, 1, 1)),
                          atlas=atlas, atlas_rects=rects,
                          atlas_level_y=level_y)
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=40)
    cfg = RenderConfig(width=res, height=res, bounces=1, bsdf="lambert")
    pixel = jnp.arange(res * res, dtype=jnp.uint32)
    _, st = render_sample_with_stats(scene, cam, cfg, pixel, 0)
    return np.asarray(st["albedo"]).reshape(res, res, 3)


def test_uv_scale_tiles_texture():
    """uv_scale=(2,2): the full quadrant pattern repeats 2x2 across the
    quad — each rendered quadrant again shows all 4 colors."""
    builder = AtlasBuilder()
    tid = builder.add(_quadrant_tex())
    atlas, rects, level_y = builder.build()
    base = _albedo_at(HostMaterial(base_color=(1, 1, 1), tex_albedo=tid),
                      atlas, rects, level_y, res=16)
    tiled = _albedo_at(HostMaterial(base_color=(1, 1, 1), tex_albedo=tid,
                                    uv_scale=(2.0, 2.0, 0.0, 0.0)),
                       atlas, rects, level_y, res=16)
    # untiled: lower-left image region (v small, u small) = red only.
    # (Camera y is flipped vs uv v: image row 15 is v~0.) Sample the
    # quad's interior at 4 pixel centers per image quadrant.
    # With 2x tiling every 8x8 image quadrant contains all 4 colors.
    def colors(img, r0, r1, c0, c1):
        px = img[r0:r1, c0:c1].reshape(-1, 3)
        return {tuple(np.round(p).astype(int)) for p in px if p.max() > .1}

    # base: one color per quadrant (ignore seam pixels)
    assert colors(base, 12, 14, 2, 4) <= {(1, 0, 0)}, base[12:14, 2:4]
    assert colors(base, 12, 14, 12, 14) <= {(0, 1, 0)}
    # tiled: the upper-left 8x8 block now itself contains red+green+blue
    got = colors(tiled, 9, 15, 1, 7)
    assert {(1, 0, 0), (0, 1, 0), (0, 0, 1)} <= got, got


def test_uv_rotation_90deg_permutes_quadrants():
    builder = AtlasBuilder()
    tid = builder.add(_quadrant_tex())
    atlas, rects, level_y = builder.build()
    rot = _albedo_at(HostMaterial(base_color=(1, 1, 1), tex_albedo=tid,
                                  uv_rot=float(np.pi / 2)),
                     atlas, rects, level_y, res=16)
    # uv (u,v) -> (.5-(v-.5), .5+(u-.5)); image lower-left (u,v ~ .25)
    # now samples uv (0.75, 0.25) wait: u'=1-v=0.75? u' = .5-(v-.5)=.75,
    # v' = .5+(u-.5)=.25 -> quadrant v<.5,u>=.5 = green
    px = rot[12:14, 2:4].reshape(-1, 3).mean(0)
    np.testing.assert_allclose(px, [0, 1, 0], atol=0.05)


def test_uv_offset_shifts():
    builder = AtlasBuilder()
    tid = builder.add(_quadrant_tex())
    atlas, rects, level_y = builder.build()
    off = _albedo_at(HostMaterial(base_color=(1, 1, 1), tex_albedo=tid,
                                  uv_scale=(1.0, 1.0, 0.5, 0.0)),
                     atlas, rects, level_y, res=16)
    # lower-left (u~.25 -> u'~.75, v~.25) = green now
    px = off[12:14, 2:4].reshape(-1, 3).mean(0)
    np.testing.assert_allclose(px, [0, 1, 0], atol=0.05)


def _tilt_nmap():
    nmap = np.zeros((16, 16, 3), np.float32)
    nmap[..., 0] = 0.5 + 0.5 * np.sin(np.pi / 4)
    nmap[..., 1] = 0.5
    nmap[..., 2] = 0.5 + 0.5 * np.cos(np.pi / 4)
    return nmap


def _gbuf_normal(mat, atlas, rects, level_y):
    scene = compile_scene([_quad()], [mat], env=EnvMap.constant((1, 1, 1)),
                          atlas=atlas, atlas_rects=rects,
                          atlas_level_y=level_y)
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=40)
    cfg = RenderConfig(width=8, height=8, bounces=1, bsdf="lambert")
    pixel = jnp.arange(64, dtype=jnp.uint32)
    _, st = render_sample_with_stats(scene, cam, cfg, pixel, 0)
    return np.asarray(st["normal"]).reshape(8, 8, 3)[4, 4]


def test_normal_strength_scales_deflection():
    builder = AtlasBuilder()
    nm_id = builder.add(_tilt_nmap())
    atlas, rects, level_y = builder.build()
    mk = lambda s: HostMaterial(base_color=(1, 1, 1), tex_normal=nm_id,
                                normal_strength=s)
    n0 = _gbuf_normal(mk(0.0), atlas, rects, level_y)
    n1 = _gbuf_normal(mk(1.0), atlas, rects, level_y)
    nh = _gbuf_normal(mk(0.5), atlas, rects, level_y)
    # strength 0 = flat quad normal (+z)
    np.testing.assert_allclose(n0, [0, 0, 1], atol=1e-3)
    # strength 1 = the 45-degree tilt
    np.testing.assert_allclose(n1[0], np.sin(np.pi / 4), atol=0.02)
    # half strength tilts by asin(sin45/2) ~ 20.7 degrees
    assert 0.05 < nh[0] < n1[0] - 0.05
    np.testing.assert_allclose(nh[0], 0.5 * np.sin(np.pi / 4), atol=0.02)


def test_separate_metal_rough_alpha_textures():
    builder = AtlasBuilder()
    half = np.zeros((16, 16, 3), np.float32)
    half[...] = 0.25                       # single-channel value .25
    tid = builder.add(half)
    atlas, rects, level_y = builder.build()
    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=40)
    cfg = RenderConfig(width=8, height=8, bounces=2, bsdf="disney")
    env = EnvMap.constant((1, 1, 1))

    def img(mat):
        scene = compile_scene([_quad()], [mat], env=env, atlas=atlas,
                              atlas_rects=rects, atlas_level_y=level_y)
        return np.asarray(render(scene, cam, cfg, spp=4))

    base = dict(base_color=(0.8, 0.6, 0.4))
    # tex_roughness replaces roughness (0.25 from the texture)
    a = img(HostMaterial(roughness=0.9, tex_roughness=tid, **base))
    b = img(HostMaterial(roughness=0.25, **base))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # inverted = smoothness texture: 1 - 0.25
    a = img(HostMaterial(roughness=0.9, tex_roughness=tid,
                         rough_tex_invert=1.0, **base))
    b = img(HostMaterial(roughness=0.75, **base))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # tex_metallic replaces metallic
    a = img(HostMaterial(metallic=1.0, roughness=0.4, tex_metallic=tid,
                         **base))
    b = img(HostMaterial(metallic=0.25, roughness=0.4, **base))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_alpha_texture_drives_cutout():
    """tex_alpha value multiplies cutout alpha: 0.25 alpha quad in front
    of an emissive wall passes ~75% of wall radiance straight through."""
    builder = AtlasBuilder()
    q = np.full((16, 16, 3), 0.25, np.float32)
    tid = builder.add(q)
    atlas, rects, level_y = builder.build()
    wall = HostMaterial(base_color=(0, 0, 0), emission=(2.0, 2.0, 2.0))
    wall_mesh = HostMesh(
        positions=np.array([[-4, -4, -2], [4, -4, -2], [4, 4, -2],
                            [-4, 4, -2]], np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        mat_id=np.ones(2, np.int32))
    cutout = HostMaterial(base_color=(0.0, 0.0, 0.0), tex_alpha=tid)
    scene = compile_scene([_quad(), wall_mesh], [cutout, wall],
                          atlas=atlas, atlas_rects=rects,
                          atlas_level_y=level_y)
    cam = Camera.look_at(eye=(0, 0, 2.0), target=(0, 0, 0), fov_y_deg=10)
    cfg = RenderConfig(width=8, height=8, bounces=3, bsdf="lambert",
                       use_nee=False)
    img = np.asarray(render(scene, cam, cfg, spp=256))
    # E[through] = (1 - alpha) * 2.0 = 1.5
    np.testing.assert_allclose(img.mean(), 1.5, rtol=0.12)


def test_matcap_mask_lerps():
    builder = AtlasBuilder()
    mc = np.zeros((8, 8, 3), np.float32)
    mc[...] = (0.0, 1.0, 0.0)              # flat green matcap
    mc_id = builder.add(mc)
    mask0 = builder.add(np.zeros((8, 8, 3), np.float32))
    mask1 = builder.add(np.ones((8, 8, 3), np.float32))
    atlas, rects, level_y = builder.build()
    red = dict(base_color=(1.0, 0.0, 0.0))

    def alb(**kw):
        return _albedo_at(HostMaterial(**red, **kw), atlas, rects,
                          level_y)[4, 4]

    # mask 1 -> full matcap color; mask 0 -> untouched base
    np.testing.assert_allclose(
        alb(tex_matcap=mc_id, tex_matcap_mask=mask1), [0, 1, 0], atol=0.02)
    np.testing.assert_allclose(
        alb(tex_matcap=mc_id, tex_matcap_mask=mask0), [1, 0, 0], atol=0.02)
    # no mask: legacy multiply blend (red * green = black)
    np.testing.assert_allclose(
        alb(tex_matcap=mc_id), [0, 0, 0], atol=0.02)


def test_transmit_color_overrides_surface_tint():
    """Authored TransmittanceColor decouples interior absorption from the
    surface tint: a white-surfaced slab with red transmit_color absorbs
    like a red-surfaced slab (reference CalculateExtinction keyed on
    TransmittanceColor, RayTracingShader.compute:640)."""
    from tests.test_glass import box_mesh, quad_mesh
    E = 4.0
    wall = HostMaterial(base_color=(0, 0, 0), emission=(E, E, E))
    slab = box_mesh((-6, -6, -1.5), (6, 6, -1.0), 0)
    back = quad_mesh((0, 0, -4.0), 20.0, 2, 1)
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=8, bsdf="disney",
                       use_nee=False, rr_start=8)

    def img(glass):
        scene = compile_scene([slab, back], [glass, wall])
        return np.asarray(render(scene, cam, cfg, spp=64)).mean(axis=(0, 1))

    color = (0.9, 0.5, 0.25)
    kw = dict(roughness=0.02, spec_trans=1.0, ior=1.5, specular=0.0)
    tinted = img(HostMaterial(base_color=color, **kw))
    authored = img(HostMaterial(base_color=(1, 1, 1),
                                transmit_color=color, **kw))
    # same interior absorption; the surfaces differ by exactly the one
    # base-color transmission factor: tinted = color * authored
    np.testing.assert_allclose(authored * np.asarray(color), tinted,
                               rtol=0.07, atol=0.02)
    assert authored[0] > authored[2] * 1.2   # red passes, blue absorbed
    # authored white transmittance = clear even with a colored surface:
    # equals the white-glass render
    clear_w = img(HostMaterial(base_color=(1, 1, 1), **kw))
    clear_a = img(HostMaterial(base_color=(1, 1, 1),
                               transmit_color=(1, 1, 1), **kw))
    np.testing.assert_allclose(clear_a, clear_w, rtol=1e-4, atol=1e-5)
