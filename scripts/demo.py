"""Showcase renders: writes PNGs into examples/ (run on CPU or TPU).

Usage: PYTHONPATH=. python scripts/demo.py [--quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DEMO_PLATFORM", "cpu") == "cpu":
    # the container's sitecustomize pins the TPU platform; override here
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from PIL import Image

from truetrace_tpu.integrate.pathtrace import RenderConfig, render


def render_chunked(scene, cam, cfg, spp, chunk=24):
    """Average spp over multiple device calls: one giant XLA program can
    kill the axon tunnel (CLAUDE.md), so keep each call modest."""
    import numpy as _np
    acc = None
    done = 0
    while done < spp:
        n = min(chunk, spp - done)
        img = _np.asarray(render(scene, cam, cfg, spp=n, base_sample=done))
        acc = img * n if acc is None else acc + img * n
        done += n
    return acc / spp
from truetrace_tpu.post.pipeline import PostConfig, postprocess, firefly_clamp
from truetrace_tpu.scene import atrium, cornell
from truetrace_tpu.scene.mesh import compile_scene

QUICK = "--quick" in sys.argv
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
os.makedirs(OUT, exist_ok=True)


def save(name, img_linear, exposure=1.0, tonemap="aces"):
    out, _ = postprocess(firefly_clamp(img_linear),
                         PostConfig(tonemap=tonemap, exposure=exposure))
    arr = (np.asarray(out) * 255).astype(np.uint8)
    Image.fromarray(arr).save(os.path.join(OUT, name))
    print(f"wrote examples/{name}", flush=True)


def main():
    res = 160 if QUICK else 320
    spp = 16 if QUICK else 192

    # 1. Cornell box — MXU brute-force traversal + Disney BSDF
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=res, height=res, bounces=5, bsdf="disney",
                       traversal="brute")
    t0 = time.time()
    img = render_chunked(scene, cam, cfg, spp)
    print(f"cornell: {time.time()-t0:.1f}s", flush=True)
    save("cornell.png", img, exposure=1.2)

    # 2. Cornell with glass + metal spheres (material showcase)
    from truetrace_tpu.scene.mesh import HostMaterial, HostMesh
    from truetrace_tpu.scene.primitives import uv_sphere, transform
    meshes2, mats2, cam2 = cornell.make()
    sv, si, _ = uv_sphere(24, 36, radius=0.09)
    base = meshes2[0]
    off = base.positions.shape[0]
    glass_id = len(mats2)
    mats2 = mats2 + [
        # colored glass: Beer-Lambert interior absorption tints the
        # transmission with thickness (round-3 glass transport)
        HostMaterial(base_color=(0.55, 0.82, 0.95), roughness=0.02,
                     spec_trans=1.0, ior=1.5, scatter_dist=0.15),
        HostMaterial(base_color=(0.95, 0.78, 0.4), metallic=1.0,
                     roughness=0.15)]
    pos = np.concatenate([base.positions,
                          transform(sv, translate=(0.46, 0.09, 0.10)),
                          transform(sv, translate=(0.38, 0.09, 0.14))])
    idx = np.concatenate([base.indices, si + off, si + off + sv.shape[0]])
    mid = np.concatenate([base.mat_id,
                          np.full(len(si), glass_id, np.int32),
                          np.full(len(si), glass_id + 1, np.int32)])
    scene2 = compile_scene([HostMesh(pos, idx, mid)], mats2)
    cfg2 = RenderConfig(width=res, height=res, bounces=8, bsdf="disney",
                        traversal="brute")
    t0 = time.time()
    img = render_chunked(scene2, cam2, cfg2, spp)
    print(f"materials: {time.time()-t0:.1f}s", flush=True)
    save("materials.png", img, exposure=1.2)

    # 3. Atrium under the physical atmosphere + SVGF denoise
    from truetrace_tpu.scene.atmosphere import bake_sky_env
    from truetrace_tpu.post.svgf import SVGFState, svgf_denoise
    from truetrace_tpu.integrate.pathtrace import render_sample_with_stats
    meshes3, mats3, cam3, _ = atrium.make(detail=0.4 if QUICK else 0.8)
    env = bake_sky_env(sun_dir=(0.5, 0.35, 0.2), sun_irradiance=30.0)
    scene3 = compile_scene(meshes3, mats3, env=env, with_cwbvh=True,
                           with_light_bvh=True)
    W3, H3 = (res * 2, res) if not QUICK else (res, res // 2 * 2)
    cfg3 = RenderConfig(width=W3, height=H3, bounces=3, bsdf="disney",
                        traversal="wavefront", light_sampling="tree")
    pix = jnp.arange(W3 * H3, dtype=jnp.uint32)
    f = jax.jit(lambda s: render_sample_with_stats(scene3, cam3, cfg3,
                                                   pix, s))
    state = SVGFState.create(H3, W3)
    t0 = time.time()
    for s in range(4 if QUICK else 24):
        rad, st = f(jnp.uint32(s))
        den, state = svgf_denoise(
            rad.reshape(H3, W3, 3), st["albedo"].reshape(H3, W3, 3),
            st["normal"].reshape(H3, W3, 3), st["depth"].reshape(H3, W3),
            state)
    jax.block_until_ready(den)
    print(f"atrium: {time.time()-t0:.1f}s", flush=True)
    save("atrium_svgf.png", den, exposure=1.6)

    # 4. Terrain heightfield + normal-mapped sphere + matcap sphere under
    # the physical sky (showcases scene/terrain.py, kernels/heightmap.py,
    # normal mapping and matcap)
    from truetrace_tpu.scene.atlas import AtlasBuilder
    from truetrace_tpu.scene.ir import Camera
    from truetrace_tpu.scene.terrain import demo_hills, make_terrain

    builder = AtlasBuilder()
    # procedural bump normal map (hemispherical dimples)
    n = 64
    yy, xx = np.mgrid[0:n, 0:n] / n * 8 * np.pi
    hgt = 0.35 * np.sin(xx) * np.sin(yy)
    gx = np.gradient(hgt, axis=1)
    gy = np.gradient(hgt, axis=0)
    nz = 1.0 / np.sqrt(1 + gx ** 2 + gy ** 2)
    nmap = np.stack([-gx * nz, -gy * nz, nz], -1) * 0.5 + 0.5
    nm_id = builder.add(nmap.astype(np.float32))
    # simple studio matcap: vertical gradient + rim
    vv, uu = np.mgrid[0:n, 0:n] / (n - 1) * 2 - 1
    r2 = uu ** 2 + vv ** 2
    mc = (np.clip(0.8 - 0.6 * vv, 0, 1)[..., None]
          * np.array([1.0, 0.85, 0.6]) + np.clip(r2 - 0.5, 0, 1)[..., None]
          * np.array([0.1, 0.2, 0.5]))
    mc_id = builder.add(mc.astype(np.float32))
    atlas, rects, level_y = builder.build()

    hm = demo_hills(97, seed=4)
    ter_mats = [
        HostMaterial(base_color=(0.35, 0.45, 0.2), roughness=0.9),   # grass
        HostMaterial(base_color=(0.45, 0.38, 0.3), roughness=0.95),  # dirt
        HostMaterial(base_color=(0.8, 0.3, 0.2), roughness=0.35,
                     tex_normal=nm_id),                              # sphere
        HostMaterial(base_color=(1.0, 1.0, 1.0), metallic=1.0,
                     roughness=0.2, tex_matcap=mc_id),               # matcap
    ]
    am = np.zeros((16, 16, 4), np.float32)
    slope = np.maximum(np.abs(np.gradient(hm, axis=0)),
                       np.abs(np.gradient(hm, axis=1)))
    sl16 = slope[::6, ::6][:16, :16]
    am[..., 1] = np.clip(sl16 * 40, 0, 1)
    am[..., 0] = 1.0 - am[..., 1]
    ter = make_terrain(hm, origin=(-8, 0, -8), size_xz=(16, 16),
                       mat_ids=[0, 1], alphamap=am, height_scale=2.2)

    sv4, si4, _ = uv_sphere(20, 30, radius=0.9)
    n4 = sv4 / np.linalg.norm(sv4, axis=-1, keepdims=True)
    uv4 = np.stack([np.arctan2(n4[:, 2], n4[:, 0]) / (2 * np.pi) + 0.5,
                    n4[:, 1] * 0.5 + 0.5], -1).astype(np.float32)
    sphere1 = HostMesh(transform(sv4, translate=(-1.6, 2.6, 0.5)), si4,
                       np.full(len(si4), 2, np.int32), normals=None,
                       uvs=uv4)
    sphere2 = HostMesh(transform(sv4, translate=(1.6, 2.8, -0.5)), si4,
                       np.full(len(si4), 3, np.int32), normals=None,
                       uvs=uv4)
    env4 = bake_sky_env(sun_dir=(0.4, 0.5, 0.3), sun_irradiance=25.0)
    scene4 = compile_scene([sphere1, sphere2], ter_mats, env=env4,
                           atlas=atlas, atlas_rects=rects,
                           atlas_level_y=level_y, terrain=ter)
    cam4 = Camera.look_at(eye=(0.0, 4.5, 9.5), target=(0, 1.8, 0),
                          fov_y_deg=45)
    cfg4 = RenderConfig(width=res, height=res, bounces=3, bsdf="disney")
    t0 = time.time()
    # heightmap marching makes each sample expensive: small chunks keep
    # every device call short (long calls kill the axon tunnel, CLAUDE.md)
    img = render_chunked(scene4, cam4, cfg4, max(spp // 2, 8), chunk=6)
    print(f"terrain: {time.time()-t0:.1f}s", flush=True)
    save("terrain_matcap.png", img, exposure=1.4)

    # 5. Twilight: sun below the horizon — the sky is lit ONLY by the
    # multi-scatter LUT (Psi_ms afterglow) with the procedural star field
    # above; emissive spheres carry the foreground (showcases the
    # Hillaire/Bruneton pipeline + night-sky helpers)
    env5 = bake_sky_env(sun_dir=(0.0, -0.05, 1.0), sun_irradiance=40.0,
                        sun_disk_intensity=0.0, stars=60.0,
                        h=128, w=256)
    sv5, si5, _ = uv_sphere(16, 24, radius=0.5)
    mats5 = [
        HostMaterial(base_color=(0.25, 0.25, 0.28), roughness=0.8),
        HostMaterial(base_color=(1, 1, 1), emission=(8.0, 5.0, 2.0)),
        HostMaterial(base_color=(0.9, 0.9, 0.95), metallic=1.0,
                     roughness=0.15),
    ]
    fl = np.array([[-7, 0, -7], [7, 0, -7], [7, 0, 7], [-7, 0, 7]],
                  np.float32)
    fi = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    meshes5 = [
        HostMesh(fl, fi, np.zeros(len(fi), np.int32)),
        HostMesh(transform(sv5, translate=(-1.2, 0.5, 0.0)), si5,
                 np.full(len(si5), 1, np.int32)),
        HostMesh(transform(sv5, translate=(1.2, 0.5, -0.6)), si5,
                 np.full(len(si5), 2, np.int32)),
    ]
    scene5 = compile_scene(meshes5, mats5, env=env5, with_cwbvh=True)
    cam5 = Camera.look_at(eye=(0, 1.2, 5.5), target=(0, 0.6, 0),
                          fov_y_deg=55)
    cfg5 = RenderConfig(width=res, height=res // 2 * 2, bounces=3,
                        bsdf="disney", traversal="wavefront")
    t0 = time.time()
    img = render_chunked(scene5, cam5, cfg5, spp, chunk=12)
    print(f"twilight: {time.time()-t0:.1f}s", flush=True)
    save("twilight_stars.png", img, exposure=6.0)

    # 6. Round-4 showcase: nested dielectrics (glass sphere inside a
    # water block — per-lane medium stack) against a tiled + rotated
    # brick-checker wall (per-material UV transforms) under blue-noise
    # sampling
    builder6 = AtlasBuilder()
    t6 = np.zeros((32, 32, 3), np.float32)
    t6[...] = (0.65, 0.3, 0.22)                      # brick
    t6[::8] = (0.85, 0.82, 0.78)                     # mortar rows
    t6[:, ::8] = (0.85, 0.82, 0.78)
    brick_id = builder6.add(t6)
    atlas6, rects6, level_y6 = builder6.build()
    mats6 = [
        HostMaterial(base_color=(0.7, 0.7, 0.7), roughness=0.9),  # floor
        HostMaterial(base_color=(1, 1, 1), roughness=0.8,
                     tex_albedo=brick_id,
                     uv_scale=(4.0, 4.0, 0.0, 0.0),
                     uv_rot=float(np.pi / 6)),       # tiled+rotated wall
        HostMaterial(base_color=(0.8, 0.92, 1.0), roughness=0.02,
                     spec_trans=1.0, ior=1.33,
                     transmit_color=(0.75, 0.92, 1.0)),  # water block
        HostMaterial(base_color=(1.0, 0.85, 0.8), roughness=0.02,
                     spec_trans=1.0, ior=1.5,
                     transmit_color=(1.0, 0.55, 0.45)),  # rose glass
        HostMaterial(emission=(22.0, 21.0, 19.0)),
    ]
    fl6 = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]],
                   np.float32)
    fi6 = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    wall = np.array([[-4, 0, -2.5], [4, 0, -2.5], [4, 4, -2.5],
                     [-4, 4, -2.5]], np.float32)
    wuv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    wi6 = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    lq6 = np.array([[-1, 3.9, 0.2], [1, 3.9, 0.2], [1, 3.9, 2.0],
                    [-1, 3.9, 2.0]], np.float32)
    li6 = np.array([[0, 1, 2], [0, 2, 3]], np.int32)   # emits downward

    def box6(lo, hi, m):
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        x0, y0, z0 = lo
        x1, y1, z1 = hi
        v = np.array([[x0, y0, z0], [x1, y0, z0], [x1, y1, z0],
                      [x0, y1, z0], [x0, y0, z1], [x1, y0, z1],
                      [x1, y1, z1], [x0, y1, z1]], np.float32)
        f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                      [0, 1, 5], [0, 5, 4], [3, 6, 2], [3, 7, 6],
                      [0, 4, 7], [0, 7, 3], [1, 2, 6], [1, 6, 5]],
                     np.int32)
        return HostMesh(v, f, np.full(len(f), m, np.int32))

    water = box6((-1.0, 0.001, 0.0), (1.0, 1.6, 1.6), 2)
    sv6, si6, _ = uv_sphere(20, 30, radius=0.45)
    glass_sph = HostMesh(transform(sv6, translate=(0.0, 0.8, 0.8)), si6,
                         np.full(len(si6), 3, np.int32))
    meshes6 = [
        HostMesh(fl6, fi6, np.zeros(2, np.int32)),
        HostMesh(wall, wi6, np.ones(2, np.int32), uvs=wuv),
        water, glass_sph,
        HostMesh(lq6, li6, np.full(2, 4, np.int32)),
    ]
    scene6 = compile_scene(meshes6, mats6, atlas=atlas6,
                           atlas_rects=rects6, atlas_level_y=level_y6,
                           with_cwbvh=True)
    cam6 = Camera.look_at(eye=(0.2, 1.6, 5.2), target=(0, 1.0, 0.3),
                          fov_y_deg=42)
    cfg6 = RenderConfig(width=res, height=res, bounces=10, bsdf="disney",
                        traversal="wavefront", sampler="bluenoise",
                        rr_start=6)
    t0 = time.time()
    img = render_chunked(scene6, cam6, cfg6, spp, chunk=12)
    print(f"nested_glass: {time.time()-t0:.1f}s", flush=True)
    save("nested_glass.png", img, exposure=1.5)


if __name__ == "__main__":
    main()
