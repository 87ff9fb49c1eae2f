"""Chase the composed-plain anomaly: Renderer.step with denoiser="none"
measured ~733 ms while +SVGF measured ~503 and the bare integrator ~519
(round-5 probes) — ~210 ms appears ONLY in the plain composed program.
Ablate the post chain and the accumulation to locate it.

Usage: PYTHONPATH=/root/repo python scripts/probe_composed_plain.py
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
    from truetrace_tpu.post.pipeline import PostConfig
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
    cfg_bare = RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                            traversal="wavefront", light_sampling="tree")
    bare = jax.jit(lambda sc, s: render_sample_with_stats(
        sc, cam, cfg_bare, pixel, s)[0])

    variants = [("bare", bare, (scene, jnp.uint32(3)))]
    posts = {
        "plain_nopost": PostConfig(tonemap="none", firefly=0.0),
        "plain_nofirefly": PostConfig(firefly=0.0),
        "plain_default": PostConfig(),
        "svgf_default": PostConfig(),
    }
    for name, post in posts.items():
        kw = dict(denoiser="svgf") if name.startswith("svgf") else {}
        rc = RendererConfig(width=W, height=H, bounces=4,
                            light_sampling="tree", post=post, **kw)
        r = Renderer(scene, cam, rc)

        def mk(rr):
            @jax.jit
            def frame(st):
                return rr.step(st)[1:]
            return frame
        variants.append((name, mk(r), (r.init_state(),)))

    res = interleaved_ab(variants, rounds=3, n1=2, n2=6)
    out = {k: round(v["median_s"] * 1e3, 1) for k, v in res.items()
           if isinstance(k, str)}
    print(json.dumps(out, indent=1), flush=True)
    with open("/tmp/probe_plain.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
