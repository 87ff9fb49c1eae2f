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
