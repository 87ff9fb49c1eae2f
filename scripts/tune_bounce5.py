"""Round-5 closing frame evidence: bounce sweep at the new k6 default
(marginal-bounce cost vs the <=130 ms target of VERDICT item 3) plus the
composed Renderer.step (plain and +SVGF) — all interleaved/paired in one
session (utils/profiling.py interleaved_ab).

Usage: PYTHONPATH=/root/repo python scripts/tune_bounce5.py
Env: TT_AB_ROUNDS (3), TT_AB_OUT (/tmp/bounce5.json).
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
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.utils.profiling import interleaved_ab

    rounds = int(os.environ.get("TT_AB_ROUNDS", "3"))
    out_path = os.environ.get("TT_AB_OUT", "/tmp/bounce5.json")
    W = H = 512
    R = W * H
    pixel = jnp.arange(R, dtype=jnp.uint32)
    meshes, mats, cam, env = atrium.make(detail=1.5)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)   # auto k6
    print(f"scene {scene.n_tris()} tris rows={scene.cw_leaf_rows.shape} "
          f"{jax.devices()[0]}", flush=True)

    def make(bounces, nee):
        cfg = RenderConfig(width=W, height=H, bounces=bounces,
                           bsdf="disney", traversal="wavefront",
                           light_sampling="tree", use_nee=nee)
        return jax.jit(lambda sc, s: render_sample_with_stats(
            sc, cam, cfg, pixel, s)[0])

    variants = []
    for b in (1, 2, 3, 4):
        variants.append((f"full_b{b}", make(b, True),
                         (scene, jnp.uint32(3))))
        variants.append((f"nonee_b{b}", make(b, False),
                         (scene, jnp.uint32(3))))

    # composed production steps (state passed through but timing uses a
    # fixed state — cost is occupancy-independent)
    for name, kw in (("composed_plain", {}),
                     ("composed_svgf", dict(denoiser="svgf"))):
        rc = RendererConfig(width=W, height=H, bounces=4,
                            light_sampling="tree", **kw)
        r = Renderer(scene, cam, rc)

        def mk(rr):
            @jax.jit
            def frame(st):
                return rr.step(st)[1]
            return frame
        variants.append((name, mk(r), (r.init_state(),)))

    res = interleaved_ab(variants, rounds=rounds, n1=2, n2=6)
    printable = {}
    for key, v in res.items():
        if isinstance(key, str):
            printable[key] = {"median_ms": round(v["median_s"] * 1e3, 1),
                              "slopes_ms": [round(x * 1e3, 1)
                                            for x in v["slopes"]]}
    # marginal-bounce summary from medians
    fb = {b: printable[f"full_b{b}"]["median_ms"] for b in (1, 2, 3, 4)}
    nb = {b: printable[f"nonee_b{b}"]["median_ms"] for b in (1, 2, 3, 4)}
    printable["marginal_bounce_full_ms"] = round((fb[4] - fb[1]) / 3, 1)
    printable["marginal_bounce_nonee_ms"] = round((nb[4] - nb[1]) / 3, 1)
    print(json.dumps(printable, indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(printable, f)


if __name__ == "__main__":
    main()
