"""Composed production-frame profiler: times `Renderer.step` (the full
frame the reference runs every frame — trace + cache + ReSTIR DI/GI +
denoiser + firefly + post, RayTracingMaster.cs:954-1131) for feature
combinations, marginal-slope timed.

Usage: PYTHONPATH=. python scripts/profile_composed.py [--res 512]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--detail", type=float, default=1.5)
    args = ap.parse_args()

    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam, env = atrium.make(detail=args.detail)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    print(f"scene: {scene.n_tris()} tris, {args.res}^2, "
          f"{args.bounces} bounces, {jax.devices()[0]}", flush=True)

    variants = [
        ("plain", {}),
        ("svgf", dict(denoiser="svgf")),
        ("cache_svgf", dict(denoiser="svgf", use_radiance_cache=True,
                            cache_query_bounce=2)),
        ("full_composed", dict(denoiser="svgf", use_radiance_cache=True,
                               cache_query_bounce=2, use_restir=True,
                               use_restir_di=True)),
    ]
    out = {}
    for name, kw in variants:
        cfg = RendererConfig(width=args.res, height=args.res,
                             bounces=args.bounces,
                             light_sampling="tree", **kw)
        r = Renderer(scene, cam, cfg)
        state0 = r.init_state()

        jstep = r.jit_step()

        def frame(st):
            disp, rad, st2 = jstep(st, scene, cam)
            return disp, st2

        # warm: 2 frames (temporal states settle + program upload),
        # then a 3/9-iteration marginal slope (the 2-frame delta this
        # used before read ~6% hot vs the slope — BASELINE round-5
        # final HEAD note)
        disp, st = frame(state0)
        disp, st = frame(st)
        np.asarray(disp)
        from truetrace_tpu.utils.profiling import marginal_slope
        ms = marginal_slope(lambda: frame(st)[0]) * 1e3
        out[name] = round(ms, 1)
        print(f"{name:16s} {ms:9.1f} ms/frame", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
