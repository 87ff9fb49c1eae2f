"""Per-pass frame profiler — the counterpart of the reference's
CommandBuffer BeginSample/EndSample markers around every dispatch
(RayTracingMaster.cs:914-1182, viewable in RenderDoc).

Times each stage of a frame with hard host syncs, steady-state (the axon
backend's first post-compile execution carries a large one-time upload
cost, so every stage runs twice and the second time is reported). Prints
a table + one JSON line.

Usage:
    PYTHONPATH=. python scripts/profile_frame.py [--res 512] [--bounces 4]
    DEMO_PLATFORM=cpu ... to force CPU.
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
    """Marginal-slope timing: run n1 then n2 iterations with hard syncs and
    report (t(n2)-t(n1))/(n2-n1) — cancels the axon per-call dispatch
    overhead (~30-60 ms) and the first-run program upload that inflate
    single-shot numbers (CLAUDE.md 'micro-benchmarks lie on axon')."""
    def sync(r):
        np.asarray(jax.tree_util.tree_leaves(r)[0])

    r = fn(*args)
    sync(r)                      # compile + upload
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

    from truetrace_tpu.core import rng
    from truetrace_tpu.integrate.pathtrace import (
        RenderConfig, render_sample_with_stats)
    from truetrace_tpu.kernels.cwbvh_wavefront import (
        any_hit_wavefront, closest_hit_wavefront)
    from truetrace_tpu.post.pipeline import PostConfig, postprocess
    from truetrace_tpu.post.svgf import SVGFState, svgf_denoise
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.ir import camera_rays
    from truetrace_tpu.scene.mesh import compile_scene

    W = H = args.res
    R = W * H
    meshes, mats, cam, env = atrium.make(detail=args.detail)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    print(f"scene: {scene.n_tris()} tris, {W}x{H}, "
          f"{args.bounces} bounces, {jax.devices()[0]}", flush=True)

    pixel = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pixel, jnp.uint32(0), jnp.uint32(0))
    ro, rd = camera_rays(cam, W, H, pixel.astype(jnp.int32), jit2)

    out = {}

    # 1. primary trace
    f = jax.jit(lambda n, l, o, d: closest_hit_wavefront(
        n, l, o, d, jnp.float32(1e30)))
    t, hit = timed(f, scene.cw_nodes, scene.cw_leaf_rows, ro, rd)
    out["trace_primary_ms"] = t * 1e3
    out["trace_primary_mrays"] = R / t / 1e6

    # 2. shadow (any-hit) trace
    fa = jax.jit(lambda n, l, o, d: any_hit_wavefront(
        n, l, o, d, jnp.full((R,), 10.0)))
    t, _ = timed(fa, scene.cw_nodes, scene.cw_leaf_rows, ro, rd)
    out["trace_shadow_ms"] = t * 1e3

    # 2b. lambert no-NEE: bounce loop dominated by the 4 traces (shading
    # nearly free) — separates trace cost from Disney shading cost
    cfg_lam = RenderConfig(width=W, height=H, bounces=args.bounces,
                           bsdf="lambert", traversal="wavefront",
                           use_nee=False)
    f_lam = jax.jit(lambda s: render_sample_with_stats(
        scene, cam, cfg_lam, pixel, s)[0])
    t, _ = timed(f_lam, jnp.uint32(3))
    out["pathtrace_lambert_noNEE_ms"] = t * 1e3

    # 3. full path trace, NEE off / on (difference = NEE cost incl. shadow)
    cfg_off = RenderConfig(width=W, height=H, bounces=args.bounces,
                           bsdf="disney", traversal="wavefront",
                           use_nee=False)
    f_off = jax.jit(lambda s: render_sample_with_stats(
        scene, cam, cfg_off, pixel, s)[0])
    t, _ = timed(f_off, jnp.uint32(3))
    out["pathtrace_noNEE_ms"] = t * 1e3
    out["disney_shading_ms"] = (out["pathtrace_noNEE_ms"]
                                - out["pathtrace_lambert_noNEE_ms"])

    cfg_on = RenderConfig(width=W, height=H, bounces=args.bounces,
                          bsdf="disney", traversal="wavefront",
                          light_sampling="tree")
    f_on = jax.jit(lambda s: render_sample_with_stats(
        scene, cam, cfg_on, pixel, s))
    t, (rad, st) = timed(f_on, jnp.uint32(3))
    out["pathtrace_full_ms"] = t * 1e3
    out["nee_ms"] = out["pathtrace_full_ms"] - out["pathtrace_noNEE_ms"]
    n_rays = float(st["n_trace"]) + float(st["n_shadow"])
    out["frame_mrays"] = n_rays / t / 1e6

    # 4. SVGF denoise
    img = rad.reshape(H, W, 3)
    alb = st["albedo"].reshape(H, W, 3)
    nrm = st["normal"].reshape(H, W, 3)
    dep = st["depth"].reshape(H, W)
    sst = SVGFState.create(H, W)
    fd = jax.jit(lambda i, a, n, d: svgf_denoise(i, a, n, d, sst)[0])
    t, _ = timed(fd, img, alb, nrm, dep)
    out["svgf_ms"] = t * 1e3

    # 5. post chain (tonemap + bloom + CAS)
    pcfg = PostConfig(tonemap="aces", bloom_strength=0.08, sharpen=0.3)
    fp = jax.jit(lambda i: postprocess(i, pcfg)[0])
    t, _ = timed(fp, img)
    out["post_ms"] = t * 1e3

    print(f"\n{'pass':24s} {'ms':>10s}")
    for k in ("trace_primary_ms", "trace_shadow_ms", "pathtrace_noNEE_ms",
              "nee_ms", "pathtrace_full_ms", "svgf_ms", "post_ms"):
        print(f"{k:24s} {out[k]:10.1f}", flush=True)
    print(f"{'frame Mrays/s':24s} {out['frame_mrays']:10.2f}")
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
