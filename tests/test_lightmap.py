"""Lightmap baking: rasterization coverage + physically sane irradiance."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.integrate.lightmap import bake_lightmap, rasterize_texels
from truetrace_tpu.integrate.pathtrace import RenderConfig
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


def test_rasterize_floor_quad():
    # one quad with full [0,1]^2 lightmap UVs
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tx = rasterize_texels(pos, idx, uv, size=16)
    # nearly all texels covered; world y == 0 everywhere
    assert tx.pos.shape[0] >= 16 * 16 * 0.9
    assert np.allclose(np.asarray(tx.pos)[:, 1], 0.0, atol=1e-5)
    assert np.allclose(np.abs(np.asarray(tx.normal)[:, 1]), 1.0, atol=1e-4)


def test_bake_cornell_floor():
    """Bake the Cornell floor: texels under the light are brighter than
    corner texels, and values are finite/positive."""
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    s = 0.5527
    pos = np.array([[0.05, 0.0, 0.05], [s - 0.05, 0.0, 0.05],
                    [s - 0.05, 0.0, s - 0.05], [0.05, 0.0, s - 0.05]],
                   np.float32)
    idx = np.array([[0, 3, 2], [0, 2, 1]], np.int32)  # +y normal
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tx = rasterize_texels(pos, idx, uv, size=12)
    cfg = RenderConfig(width=1, height=1, bounces=2)
    lmap = bake_lightmap(scene, tx, cfg, spp=24)
    assert np.isfinite(lmap).all() and lmap.min() >= 0
    center = lmap[5:7, 5:7].mean()
    corner = lmap[0:2, 0:2].mean()
    assert center > 0.05
    assert center > corner
