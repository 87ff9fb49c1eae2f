"""Terrain heightfield tracing (reference kernel_heightmap /
kernel_shadow_heightmap, IntersectionKernels.compute:513-710)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.kernels.heightmap import (
    heightmap_any, heightmap_closest, sample_layers)
from truetrace_tpu.scene.terrain import Terrain, demo_hills, make_terrain


def _flat_terrain(h=1.0, n=33):
    hm = np.full((n, n), h, np.float32)
    return make_terrain(hm, origin=(0.0, 0.0, 0.0), size_xz=(10.0, 10.0),
                        mat_ids=[0])


def test_flat_plane_hit():
    ter = _flat_terrain(h=1.0)
    R = 64
    x = np.linspace(1.0, 9.0, R).astype(np.float32)
    ro = jnp.asarray(np.stack([x, np.full(R, 5.0), np.full(R, 5.0)], -1))
    rd = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (R, 3))
    hit = heightmap_closest(ter, ro, rd, jnp.float32(100.0))
    assert bool(jnp.all(hit.valid))
    np.testing.assert_allclose(np.asarray(hit.t), 4.0, atol=2e-2)
    # normals point straight up on a flat plane
    np.testing.assert_allclose(np.asarray(hit.normal),
                               np.tile([0.0, 1.0, 0.0], (R, 1)), atol=1e-4)


def test_miss_above_and_outside():
    ter = _flat_terrain(h=1.0)
    ro = jnp.asarray([[5.0, 5.0, 5.0], [50.0, 5.0, 50.0]], jnp.float32)
    rd = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    hit = heightmap_closest(ter, ro, rd, jnp.float32(100.0))
    assert not bool(hit.valid[0])   # looking up: no terrain
    assert not bool(hit.valid[1])   # outside the grid footprint


def test_hills_match_dense_marching():
    """Raymarched t must match a dense numpy root find on f(t)."""
    hm = demo_hills(65)
    ter = make_terrain(hm, origin=(0, 0, 0), size_xz=(10.0, 10.0),
                       mat_ids=[0], height_scale=2.0)
    rng = np.random.default_rng(1)
    R = 128
    ro_np = np.stack([rng.uniform(1, 9, R), np.full(R, 5.0),
                      rng.uniform(1, 9, R)], -1).astype(np.float32)
    d = np.stack([rng.normal(size=R) * 0.3, -np.ones(R),
                  rng.normal(size=R) * 0.3], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro_np), jnp.asarray(d.astype(np.float32))
    hit = heightmap_closest(ter, ro, rd, jnp.float32(100.0))

    # dense reference: sample f(t) at 20k points, first sign change
    import jax
    ts = np.linspace(1e-4, 12.0, 20000, dtype=np.float32)
    from truetrace_tpu.kernels.heightmap import _sample_height
    f = jax.vmap(lambda t: ro[:, 1] + rd[:, 1] * t - _sample_height(
        ter, ro[:, 0] + rd[:, 0] * t, ro[:, 2] + rd[:, 2] * t))(
        jnp.asarray(ts))                                   # [S,R]
    f = np.asarray(f)
    sign_change = (np.sign(f[1:]) != np.sign(f[:-1]))
    first = np.argmax(sign_change, axis=0)
    has = sign_change.any(axis=0)
    t_ref = ts[first]
    ok = np.asarray(hit.valid)
    assert (ok == has).mean() > 0.97
    both = ok & has
    assert np.abs(np.asarray(hit.t)[both] - t_ref[both]).max() < 0.05


def test_any_hit_consistent():
    hm = demo_hills(65)
    ter = make_terrain(hm, origin=(0, 0, 0), size_xz=(10.0, 10.0),
                       mat_ids=[0], height_scale=2.0)
    rng = np.random.default_rng(2)
    R = 64
    ro = jnp.asarray(np.stack([rng.uniform(1, 9, R), np.full(R, 4.0),
                               rng.uniform(1, 9, R)], -1), jnp.float32)
    d = np.stack([rng.normal(size=R), -np.abs(rng.normal(size=R)) - 0.2,
                  rng.normal(size=R)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d, jnp.float32)
    h = heightmap_closest(ter, ro, rd, jnp.float32(100.0))
    a = heightmap_any(ter, ro, rd, jnp.float32(100.0))
    assert np.array_equal(np.asarray(a), np.asarray(h.valid))


def test_layer_blend_weights():
    hm = np.zeros((17, 17), np.float32)
    am = np.zeros((8, 8, 4), np.float32)
    am[:, :4, 0] = 1.0     # left half layer 0
    am[:, 4:, 1] = 1.0     # right half layer 1
    ter = make_terrain(hm, origin=(0, 0, 0), size_xz=(1.0, 1.0),
                       mat_ids=[3, 7], alphamap=am)
    uv = jnp.asarray([[0.1, 0.5], [0.9, 0.5]], jnp.float32)
    w = np.asarray(sample_layers(ter, uv))
    assert w[0, 0] > 0.99 and w[1, 1] > 0.99
    # unused layers masked off by mat_ids == -1
    assert w[:, 2:].max() == 0.0


def test_render_with_terrain():
    """End-to-end: terrain shows up in a rendered image and shadows meshes."""
    import jax
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.ir import Camera, EnvMap
    from truetrace_tpu.scene.mesh import (HostMaterial, HostMesh,
                                          compile_scene)

    hm = np.zeros((33, 33), np.float32)
    ter = make_terrain(hm, origin=(-5, 0, -5), size_xz=(10.0, 10.0),
                       mat_ids=[1])
    # one floating quad above the terrain
    quad = HostMesh(
        positions=np.array([[-1, 2, -1], [1, 2, -1], [1, 2, 1], [-1, 2, 1]],
                           np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        mat_id=np.zeros(2, np.int32))
    mats = [HostMaterial(base_color=(0.8, 0.2, 0.2)),
            HostMaterial(base_color=(0.2, 0.8, 0.2))]
    env = EnvMap.constant((1.0, 1.0, 1.0))
    scene = compile_scene([quad], mats, env=env, terrain=ter)
    cam = Camera.look_at(eye=(0, 6, 8), target=(0, 0, 0), fov_y_deg=50)
    cfg = RenderConfig(width=32, height=32, bounces=2, bsdf="lambert")
    img = np.asarray(render(scene, cam, cfg, spp=8))
    assert np.isfinite(img).all()
    # terrain (green-ish) must dominate some pixels
    green = (img[..., 1] > img[..., 0] * 1.5) & (img[..., 1] > 0.05)
    assert green.mean() > 0.2
    # the quad shadows the terrain directly beneath it: centre of the image
    # (below the quad) must be darker than the terrain far corner
    assert img[16, 16, 1] < img[2, 2, 1] * 3.0  # sanity (not fully dark: env)


def test_scatter_on_terrain():
    """Terrain detail scattering (reference DetailedObjectInstance,
    TerrainObject.cs:14): instances sit ON the heightfield, avoid steep
    slopes, and render through the instancing stack."""
    import numpy as np

    from truetrace_tpu.scene.terrain import scatter_on_terrain

    hm = demo_hills(65, seed=2)
    origin = (-8.0, 0.0, -8.0)
    size = (16.0, 16.0)
    hs = 2.0
    inst = scatter_on_terrain(hm, origin, size, height_scale=hs, n=24,
                              seed=3, max_slope=0.8)
    assert len(inst) == 24
    hmw = np.asarray(hm, np.float64) * hs
    for sid, m in inst:
        assert sid == 0
        x, y, z = m[3, :3]
        assert -8.0 <= x <= 8.0 and -8.0 <= z <= 8.0
        # y matches the bilinear terrain height at (x, z)
        u = (x - origin[0]) / size[0]
        v = (z - origin[2]) / size[1]
        fx, fz = u * (hm.shape[1] - 1), v * (hm.shape[0] - 1)
        x0, z0 = min(int(fx), hm.shape[1] - 2), min(int(fz), hm.shape[0] - 2)
        tx, tz = fx - x0, fz - z0
        h = ((1 - tx) * (1 - tz) * hmw[z0, x0] + tx * (1 - tz) * hmw[z0, x0 + 1]
             + (1 - tx) * tz * hmw[z0 + 1, x0] + tx * tz * hmw[z0 + 1, x0 + 1])
        assert abs(y - h) < 1e-6, (y, h)

    # end-to-end: scattered boxes over the terrain render via the TLAS
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.instances import compile_scene_instanced
    from truetrace_tpu.scene.ir import Camera, EnvMap
    from truetrace_tpu.scene.mesh import HostMaterial, HostMesh

    c = np.array([[x, y, z] for x in (-.2, .2) for y in (0, .8)
                  for z in (-.2, .2)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    tree = HostMesh(c, f, np.zeros(12, np.int32))
    mats = [HostMaterial(base_color=(0.2, 0.5, 0.2))]
    scene, _ = compile_scene_instanced([tree], mats, inst[:8],
                                       env=EnvMap.constant((1, 1, 1)))
    cam = Camera.look_at(eye=(0, 8, 14), target=(0, 1, 0), fov_y_deg=50)
    img = np.asarray(render(scene, cam,
                            RenderConfig(width=16, height=16, bounces=2,
                                         bsdf="lambert", traversal="tlas"),
                            spp=4))
    assert np.isfinite(img).all() and img.mean() > 0.0
