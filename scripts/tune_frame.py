"""Frame-time knob sweep on the real chip: chunk size + NEE shadow-ray
roulette (both unbiased levers) on the honest 512^2 x 4-bounce
Disney+treeNEE atrium frame."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n1=1, n2=3):
    def sync(r):
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n1):
        r = fn(*args)
    sync(r)
    t1 = time.perf_counter()
    for _ in range(n2):
        r = fn(*args)
    sync(r)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1), r


def main():
    from truetrace_tpu.integrate.pathtrace import (
        RenderConfig, render_sample_with_stats)
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene

    W = H = 512
    R = W * H
    meshes, mats, cam, env = atrium.make(detail=1.5)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                         with_light_bvh=True)
    pixel = jnp.arange(R, dtype=jnp.uint32)
    print(f"scene {scene.n_tris()} tris {jax.devices()[0]}", flush=True)

    out = {}
    for name, kw in (("base", {}),
                     ("rr02", dict(nee_rr=0.02)),
                     ("rr10", dict(nee_rr=0.10))):
        cfg = RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                           traversal="wavefront", light_sampling="tree",
                           **kw)
        f = jax.jit(lambda s, c=cfg: render_sample_with_stats(
            scene, cam, c, pixel, s))
        t, (rad, st) = timed(f, jnp.uint32(3))
        n_rays = float(st["n_trace"]) + float(st["n_shadow"])
        out[name] = dict(ms=round(t * 1e3, 1),
                         shadow_mrays=round(float(st["n_shadow"]) / 1e6, 3),
                         mean=round(float(np.asarray(rad).mean()), 5))
        print(name, out[name], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
