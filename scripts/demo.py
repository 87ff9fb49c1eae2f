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
    img = render(scene, cam, cfg, spp=spp)
    jax.block_until_ready(img)
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
        HostMaterial(base_color=(1.0, 1.0, 1.0), roughness=0.02,
                     spec_trans=1.0, ior=1.5),
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
    img = render(scene2, cam2, cfg2, spp=spp)
    jax.block_until_ready(img)
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
    for s in range(4 if QUICK else 10):
        rad, st = f(jnp.uint32(s))
        den, state = svgf_denoise(
            rad.reshape(H3, W3, 3), st["albedo"].reshape(H3, W3, 3),
            st["normal"].reshape(H3, W3, 3), st["depth"].reshape(H3, W3),
            state)
    jax.block_until_ready(den)
    print(f"atrium: {time.time()-t0:.1f}s", flush=True)
    save("atrium_svgf.png", den, exposure=1.6)


if __name__ == "__main__":
    main()
