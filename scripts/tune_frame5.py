"""Round-5 frame levers, paired: base k6 frame vs nee_sort (shadow rays
sorted by light distance so short rays retire whole cascade chunks
early — VERDICT r4 item 1's t_max-shrink lever).

Usage: PYTHONPATH=/root/repo python scripts/tune_frame5.py
Env: TT_AB_ROUNDS (4), TT_AB_OUT (/tmp/frame5_ab.json).
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
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.utils.profiling import interleaved_ab

    rounds = int(os.environ.get("TT_AB_ROUNDS", "4"))
    out_path = os.environ.get("TT_AB_OUT", "/tmp/frame5_ab.json")
    W = H = 512
    R = W * H
    pixel = jnp.arange(R, dtype=jnp.uint32)
    meshes, mats, cam, env = atrium.make(detail=1.5)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)   # auto k6
    print(f"scene {scene.n_tris()} tris k-auto "
          f"rows={scene.cw_leaf_rows.shape} {jax.devices()[0]}",
          flush=True)

    def make(**kw):
        cfg = RenderConfig(width=W, height=H, bounces=4, bsdf="disney",
                           traversal="wavefront", light_sampling="tree",
                           **kw)
        return jax.jit(lambda sc, s: render_sample_with_stats(
            sc, cam, cfg, pixel, s)[0])

    variants = [
        ("base", make(), (scene, jnp.uint32(3))),
        ("nee_sort", make(nee_sort=True), (scene, jnp.uint32(3))),
    ]
    res = interleaved_ab(variants, rounds=rounds)
    printable = {}
    for key, v in res.items():
        name = key if isinstance(key, str) else "-vs-".join(key[1:])
        if isinstance(key, str):
            printable[name] = {"median_ms": round(v["median_s"] * 1e3, 1),
                               "slopes_ms": [round(x * 1e3, 1)
                                             for x in v["slopes"]]}
        else:
            printable[name] = {"diff_ms": round(v["mean_s"] * 1e3, 1),
                               "ci95_ms": round(v["ci95_s"] * 1e3, 1),
                               "significant": v["significant"]}
    print(json.dumps(printable, indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(printable, f)


if __name__ == "__main__":
    main()
