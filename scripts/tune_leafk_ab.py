"""leaf_k frame A/B — round-5 VERDICT item 2, first consumer of the
same-session interleaved harness (utils/profiling.py interleaved_ab).

The round-4 contradiction: the mixed-ray microbench says k12 +15%, but a
(sequential, unpaired) frame A/B put the noNEE slice at 390 ms (k12) vs
296 (k6) vs 341 (k3) while the FULL frame ordered the other way
(728/743/756) — all inside the ±8% session noise. This script compiles
all variants up front and alternates them within one process, reporting
paired-difference CIs, on the honest 512^2 x 4-bounce Disney+treeNEE
atrium frame. The frame (not the bench) picks the auto leaf_k rule.

Usage: PYTHONPATH=/root/repo python scripts/tune_leafk_ab.py
Env: TT_AB_ROUNDS (default 4), TT_AB_RES (512), TT_AB_OUT (json path).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from truetrace_tpu.integrate.pathtrace import (
        RenderConfig, render_sample_with_stats)
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.utils.profiling import interleaved_ab

    rounds = int(os.environ.get("TT_AB_ROUNDS", "4"))
    W = H = int(os.environ.get("TT_AB_RES", "512"))
    out_path = os.environ.get("TT_AB_OUT", "/tmp/leafk_ab.json")
    R = W * H
    pixel = jnp.arange(R, dtype=jnp.uint32)

    meshes, mats, cam, env = atrium.make(detail=1.5)
    scenes = {}
    for k in (3, 6, 12):
        t0 = time.perf_counter()
        scenes[k] = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                                  with_light_bvh=True, leaf_k=k)
        print(f"built k={k}: {scenes[k].n_tris()} tris, "
              f"{scenes[k].cw_nodes.shape[0]} nodes "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"device {jax.devices()[0]}", flush=True)

    def make(cfg):
        return jax.jit(lambda sc, s: render_sample_with_stats(
            sc, cam, cfg, pixel, s)[0])

    full = {k: RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                            traversal="wavefront", light_sampling="tree")
            for k in (3, 6, 12)}
    nonee = {k: RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                             traversal="wavefront", use_nee=False)
             for k in (6, 12)}

    variants = []
    for k in (3, 6, 12):
        variants.append((f"full_k{k}", make(full[k]),
                         (scenes[k], jnp.uint32(3))))
    for k in (6, 12):
        variants.append((f"nonee_k{k}", make(nonee[k]),
                         (scenes[k], jnp.uint32(3))))

    res = interleaved_ab(variants, rounds=rounds)
    printable = {}
    for key, v in res.items():
        name = key if isinstance(key, str) else "-vs-".join(key[1:])
        if isinstance(key, str):
            printable[name] = {"median_ms": round(v["median_s"] * 1e3, 1),
                               "slopes_ms": [round(s * 1e3, 1)
                                             for s in v["slopes"]]}
        else:
            printable[name] = {"diff_ms": round(v["mean_s"] * 1e3, 1),
                               "ci95_ms": round(v["ci95_s"] * 1e3, 1),
                               "significant": v["significant"]}
    print(json.dumps(printable, indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(printable, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
