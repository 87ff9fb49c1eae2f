"""Measure radiance-cache hit-rate: static vs orbiting camera, with and
without the camera-motion reprojection merge (VERDICT r2 item 4)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DEMO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from truetrace_tpu.integrate.pathtrace import RenderConfig
from truetrace_tpu.integrate.radiance_cache import (
    RadianceCache, cache_resolve, render_sample_cached)
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.camera_rig import orbit_path
from truetrace_tpu.scene.mesh import compile_scene


def run(scene, cams, n_frames, reproject):
    cfg = RenderConfig(width=32, height=32, bounces=3, bsdf="disney",
                       cache_capture=True, cache_query_bounce=1)
    pix = jnp.arange(32 * 32, dtype=jnp.uint32)
    cache = RadianceCache.create(1 << 14)
    rates = []
    for f in range(n_frames):
        cam = cams[f % len(cams)]
        _, st, cache = render_sample_cached(scene, cam, cfg, cache, pix,
                                            jnp.uint32(f))
        prev = cams[(f - 1) % len(cams)]
        if reproject and f > 0:
            cache = cache_resolve(cache, cam_pos=cam.c2w[3, :3],
                                  prev_cam_pos=prev.c2w[3, :3])
        else:
            cache = cache_resolve(cache)
        rates.append(float(st["cache_hit_rate"]))
    return rates


def main():
    import truetrace_tpu.integrate.radiance_cache as rc
    rc.BASE_CELL = 0.2     # coarse cells warm within a few 32x32 frames
    meshes, mats, cam0 = cornell.make()
    scene = compile_scene(meshes, mats)
    n = 48
    # the cornell box is 0.55 m at the origin corner; orbit at r=4.2 so
    # per-point camera distances straddle the d=4 level boundary (churn)
    c = 0.2764
    cams = orbit_path((c, c, c), radius=4.2, height=1.0, n_frames=96,
                      fov_y_deg=9.0)

    static = run(scene, [cams[0]], n, reproject=False)
    orbit_plain = run(scene, cams, n, reproject=False)
    orbit_rep = run(scene, cams, n, reproject=True)
    tail = slice(n // 2, None)
    print("static  tail hit-rate:", round(np.mean(static[tail]), 4))
    print("orbit   tail hit-rate:", round(np.mean(orbit_plain[tail]), 4))
    print("orbit+R tail hit-rate:", round(np.mean(orbit_rep[tail]), 4))
    print("static curve:", [round(r, 3) for r in static])
    print("plain curve: ", [round(r, 3) for r in orbit_plain])
    print("reproj curve:", [round(r, 3) for r in orbit_rep])


if __name__ == "__main__":
    main()
