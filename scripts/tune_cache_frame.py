"""Radiance-cache headline config (round-5 VERDICT item 1a): frame time
AND matched-wall-clock quality over cache_query_bounce in {1,2,3} vs the
unbiased frame, on the 512^2 x 4-bounce Disney+treeNEE atrium.

Protocol: each variant is the jitted composed `Renderer.step`. Timing =
marginal slope after a warm-up. Quality = run each variant for the SAME
wall-clock budget (frames = budget/ms, cache warm-up included — that is
the honest interactive trade), then PSNR of the progressive accumulation
vs a 256-spp unbiased reference.

Usage: PYTHONPATH=/root/repo python scripts/tune_cache_frame.py
Env: TT_CACHE_BUDGET_S (8), TT_CACHE_OUT (/tmp/cache_frame.json).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(np.maximum(np.max(np.asarray(b)) ** 2, 1e-12)
                           / max(mse, 1e-12))


def main():
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.utils.profiling import marginal_slope

    budget_s = float(os.environ.get("TT_CACHE_BUDGET_S", "8"))
    out_path = os.environ.get("TT_CACHE_OUT", "/tmp/cache_frame.json")
    W = H = 512
    meshes, mats, cam, env = atrium.make(detail=1.5)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    print(f"scene {scene.n_tris()} tris {jax.devices()[0]}", flush=True)

    # unbiased reference: 256-spp mean (chunked 32-spp calls — long
    # single XLA programs can wedge the axon tunnel, CLAUDE.md)
    rcfg_ref = RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                            traversal="wavefront", light_sampling="tree")
    t0 = time.perf_counter()
    acc = np.zeros((H, W, 3), np.float64)
    for s0 in range(0, 256, 32):
        acc += np.asarray(render(scene, cam, rcfg_ref, spp=32,
                                 base_sample=s0), np.float64)
    ref = (acc / 8.0).astype(np.float32)
    print(f"reference 256 spp: {time.perf_counter() - t0:.0f}s",
          flush=True)

    variants = [("unbiased", {})] + [
        (f"cache_b{b}", dict(use_radiance_cache=True,
                             cache_query_bounce=b)) for b in (1, 2, 3)]
    out = {}
    for name, kw in variants:
        cfg = RendererConfig(width=W, height=H, bounces=4,
                             light_sampling="tree", denoiser="none", **kw)
        r = Renderer(scene, cam, cfg)

        jstep = r.jit_step()

        def frame(st):
            _, rad, st2 = jstep(st, scene, cam)
            return rad, st2

        st = r.init_state()
        rad, st = frame(st)           # compile + upload
        np.asarray(rad)
        ms = marginal_slope(lambda s: frame(s)[0], st, n1=2, n2=6) * 1e3
        n_frames = max(2, int(budget_s * 1e3 / ms))
        st = r.init_state()           # fresh accumulation for quality
        for _ in range(n_frames):
            rad, st = frame(st)
        img = np.asarray(rad)
        out[name] = dict(ms=round(float(ms), 1), frames=int(n_frames),
                         psnr=round(float(psnr(img, ref)), 2))
        print(name, out[name], flush=True)
    print(json.dumps(out), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
