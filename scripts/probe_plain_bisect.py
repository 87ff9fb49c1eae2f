"""Bisect the composed-plain anomaly (follow-up to
probe_composed_plain: plain step ~730 ms vs bare integrator ~515 and
+SVGF ~504; post-chain ablation did NOT move it). Rebuild the plain
path incrementally as standalone jitted programs.

Usage: PYTHONPATH=/root/repo python scripts/probe_plain_bisect.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from truetrace_tpu.integrate.pathtrace import (
        RenderConfig, render_sample_with_stats)
    from truetrace_tpu.post.pipeline import Accumulator, PostConfig, \
        postprocess
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.utils.profiling import interleaved_ab

    W = H = 512
    meshes, mats, cam, env = atrium.make(detail=1.5)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    print(f"device {jax.devices()[0]}", flush=True)
    pixel = jnp.arange(W * H, dtype=jnp.uint32)
    cfg = RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                       traversal="wavefront", light_sampling="tree")

    def p_rad(sc, s):
        rad, st = render_sample_with_stats(sc, cam, cfg, pixel, s)
        return rad.reshape(H, W, 3)

    def p_stats(sc, s):
        rad, st = render_sample_with_stats(sc, cam, cfg, pixel, s)
        return (rad.reshape(H, W, 3), st["albedo"], st["normal"],
                st["depth"], st["emitted0"], st["inst"])

    acc0 = Accumulator.create(H, W)

    def p_accum(sc, s):
        rad, st = render_sample_with_stats(sc, cam, cfg, pixel, s)
        return acc0.add(rad.reshape(H, W, 3))

    pcfg = PostConfig()

    def p_post(sc, s):
        rad, st = render_sample_with_stats(sc, cam, cfg, pixel, s)
        a = acc0.add(rad.reshape(H, W, 3))
        disp, hist = postprocess(a.image, pcfg, None, motion=None)
        return disp, a

    rc = RendererConfig(width=W, height=H, bounces=4,
                        light_sampling="tree")
    r = Renderer(scene, cam, rc)

    def p_step(st):
        return r.step(st)[1:]

    rb = Renderer(scene, cam, RendererConfig(
        width=W, height=H, bounces=4, light_sampling="tree",
        step_barrier=True))

    def p_step_barrier(st):
        return rb.step(st)[1:]

    variants = [
        ("rad", jax.jit(p_rad), (scene, jnp.uint32(3))),
        ("rad_stats", jax.jit(p_stats), (scene, jnp.uint32(3))),
        ("rad_accum", jax.jit(p_accum), (scene, jnp.uint32(3))),
        ("rad_accum_post", jax.jit(p_post), (scene, jnp.uint32(3))),
        ("full_step", jax.jit(p_step), (r.init_state(),)),
        ("full_step_barrier", jax.jit(p_step_barrier),
         (rb.init_state(),)),
    ]
    res = interleaved_ab(variants, rounds=3, n1=2, n2=6)
    out = {k: round(v["median_s"] * 1e3, 1) for k, v in res.items()
           if isinstance(k, str)}
    print(json.dumps(out, indent=1), flush=True)
    with open("/tmp/plain_bisect.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
