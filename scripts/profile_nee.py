"""NEE cost ablation: where do the ~0.7 s of per-frame NEE go?

Measures the 512^2 x 4-bounce disney frame with NEE components disabled
one at a time (light-tree vs CDF selection, shadow trace, emissive-MIS pdf
walk, env strategy). Differences between variants attribute the cost.

Usage: PYTHONPATH=. python scripts/profile_nee.py [--res 512] [--bounces 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DEMO_PLATFORM", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n1: int = 3, n2: int = 9):
    """Marginal-slope timing (see scripts/profile_frame.py)."""
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
    variants = [
        ("full_tree", dict(light_sampling="tree")),          # approx MIS
        ("exact_mis", dict(light_sampling="tree", nee_mis="exact")),
        ("tree_rr", dict(light_sampling="tree", nee_rr=0.02)),
        ("cdf_select", dict(light_sampling="cdf")),
        ("no_shadow", dict(light_sampling="tree", debug_nee="noshadow")),
        ("no_mis_walk", dict(light_sampling="tree", debug_nee="nomis")),
        ("nee_off", dict(use_nee=False)),
    ]
    for name, kw in variants:
        cfg = RenderConfig(width=W, height=H, bounces=args.bounces,
                           bsdf="disney", traversal="wavefront", **kw)
        f = jax.jit(lambda s, scn=scene, c=cfg: render_sample_with_stats(
            scn, cam, c, pixel, s)[0])
        try:
            t, _ = timed(f, jnp.uint32(3))
            out[name] = t * 1e3
            print(f"{name:16s} {t * 1e3:9.1f} ms", flush=True)
        except Exception as e:  # variant knob may not exist yet
            print(f"{name:16s} failed: {e}", flush=True)

    if "full_tree" in out and "nee_off" in out:
        out["nee_total"] = out["full_tree"] - out["nee_off"]
        if "no_shadow" in out:
            out["nee_shadow"] = out["full_tree"] - out["no_shadow"]
        if "no_mis_walk" in out:
            out["nee_mis_walk"] = out["full_tree"] - out["no_mis_walk"]
        if "cdf_select" in out:
            out["tree_vs_cdf"] = out["full_tree"] - out["cdf_select"]
    print(json.dumps({k: round(v, 1) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
