"""Triangle pre-splitting (build/presplit.py): geometry-exact bisection
of oversized triangles before the BVH build."""
import numpy as np
import pytest

from truetrace_tpu.build.presplit import presplit_triangles
from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import (HostMaterial, HostMesh,
                                      compile_scene, flatten_meshes)


def _scene_meshes():
    # one huge floor quad + a grid of small boxes above it
    floor = np.array([[-20, 0, -20], [20, 0, -20], [20, 0, 20],
                      [-20, 0, 20]], np.float32)
    fi = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    meshes = [HostMesh(floor, fi, np.zeros(2, np.int32))]
    rng = np.random.default_rng(0)
    for _ in range(40):
        c = rng.uniform(-3, 3, 3).astype(np.float32)
        c[1] = 0.3
        s = 0.2
        v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32) * s + c
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
                     np.int32)
        meshes.append(HostMesh(v, f, np.zeros(12, np.int32)))
    mats = [HostMaterial(base_color=(0.7, 0.6, 0.5), roughness=0.8,
                         emission=(0.5, 0.5, 0.5))]
    return meshes, mats


def test_split_bounds_aabb_size():
    meshes, _ = _scene_meshes()
    tris = flatten_meshes(meshes)
    out = presplit_triangles(tris, max_ratio=8.0)
    assert out["p0"].shape[0] > tris["p0"].shape[0]   # the floor split

    def half_area(t):
        v0 = t["p0"]
        v1 = v0 + t["e1"]
        v2 = v0 + t["e2"]
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)
        d = hi - lo
        return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

    assert half_area(out).max() < half_area(tris).max() / 4
    # total true triangle area is conserved (bisection is exact)
    def tri_area(t):
        return 0.5 * np.linalg.norm(np.cross(t["e1"], t["e2"]), axis=-1)
    np.testing.assert_allclose(tri_area(out).sum(), tri_area(tris).sum(),
                               rtol=1e-4)


def test_render_identical_after_presplit():
    meshes, mats = _scene_meshes()
    cam = Camera.look_at((6, 5, 6), (0, 0.3, 0), fov_y_deg=40)
    cfg = RenderConfig(width=32, height=32, bounces=2, bsdf="lambert",
                       use_nee=False)
    a = np.asarray(render(compile_scene(meshes, mats), cam, cfg, spp=12))
    b = np.asarray(render(compile_scene(meshes, mats, presplit=8.0), cam,
                          cfg, spp=12))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)
