"""Fused-NEE (mixed dispatch) vs per-bounce shadow flush on the REAL frame.

Measures the full 512^2 x 4-bounce disney+treeNEE frame both ways with
marginal-slope timing (CLAUDE.md: single-shot numbers lie on axon).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n1: int = 1, n2: int = 3):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--detail", type=float, default=1.5)
    args = ap.parse_args()

    from truetrace_tpu.integrate.pathtrace import (
        RenderConfig, render_sample_with_stats)
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene

    W = H = args.res
    R = W * H
    meshes, mats, cam, env = atrium.make(detail=args.detail)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    print(f"scene: {scene.n_tris()} tris, {W}x{H}, {args.bounces} bounces, "
          f"{jax.devices()[0]}", flush=True)
    pixel = jnp.arange(R, dtype=jnp.uint32)

    out = {}
    for name, fuse in (("fused", True), ("unfused", False)):
        cfg = RenderConfig(width=W, height=H, bounces=args.bounces,
                           bsdf="disney", traversal="wavefront",
                           light_sampling="tree", fuse_nee=fuse)
        f = jax.jit(lambda s, c=cfg: render_sample_with_stats(
            scene, cam, c, pixel, s))
        t, (rad, st) = timed(f, jnp.uint32(3))
        n_rays = float(st["n_trace"]) + float(st["n_shadow"])
        out[name + "_ms"] = round(t * 1e3, 1)
        out[name + "_mrays"] = round(n_rays / t / 1e6, 3)
        out[name + "_mean"] = round(float(np.asarray(rad).mean()), 5)
        print(f"{name}: {t*1e3:.1f} ms  {out[name + '_mrays']} Mrays/s "
              f"mean={out[name + '_mean']}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
