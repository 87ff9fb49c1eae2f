"""Light-selection cost vs cut size (round-4 NEE attack).

The dense cut's categorical select costs ~0.27 ms per cut row per
262k-lane bounce (round-4 probe) while a residual descent level costs
one dependent pair-row gather + importance pair. Sweep max_cut
{leaves, 16, 8, 4} + pure descent on the atrium light set and report
x4-bounce ms for the FULL selection (dense pick + residual descent)."""
from __future__ import annotations

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
    from truetrace_tpu.build.lightbvh import (build_cut, build_light_bvh,
                                              build_pairs)
    from truetrace_tpu.core import rng
    from truetrace_tpu.kernels.lighttree import (sample_light_tree,
                                                 sample_light_tree_cut)
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene, flatten_meshes

    R = 1 << 18
    meshes, mats, cam, env = atrium.make(detail=1.5)
    tris = flatten_meshes(meshes)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    lb = None
    from truetrace_tpu.build import lightbvh as lbm
    ids = np.asarray(scene.light_tris.tri_index)
    # rebuild the host LightBVH to re-derive cuts at several sizes
    # (tri arrays in compile order)
    tri_cw = {"p0": np.asarray(scene.tri_p0),
              "e1": np.asarray(scene.tri_e1),
              "e2": np.asarray(scene.tri_e2)}
    lb = build_light_bvh(tri_cw, ids, np.asarray(scene.light_tris.power))
    pairs, _ = build_pairs(lb.nodes, lb.info)
    pairs = jnp.asarray(pairs)
    prim = jnp.asarray(lb.prim)
    print(f"lights={ids.size} pairs={pairs.shape}", flush=True)

    pix = jnp.arange(R, dtype=jnp.uint32)
    p = jax.random.uniform(jax.random.PRNGKey(0), (R, 3)) * 10.0
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (R, 1))
    us = [rng.uniform1(pix, jnp.uint32(i), jnp.uint32(3))
          for i in range(4)]

    out = {}
    for mc in (128, 16, 8, 4):
        cut = build_cut(lb, max_cut=mc)
        cb = jnp.asarray(cut.bounds)
        cl = jnp.asarray(cut.link)

        f = jax.jit(lambda: [sample_light_tree_cut(pairs, prim, cb, cl,
                                                   p, n, us[i])
                             for i in range(4)])
        t, r = timed(f)
        out[f"cut{cut.bounds.shape[0]}_x4_ms"] = round(t * 1e3, 1)
        print(f"max_cut={mc} -> M={cut.bounds.shape[0]}: "
              f"{t * 1e3:.1f} ms", flush=True)

    f = jax.jit(lambda: [sample_light_tree(pairs, prim, p, n, us[i])
                         for i in range(4)])
    t, _ = timed(f)
    out["descent_x4_ms"] = round(t * 1e3, 1)
    print(f"pure descent: {t * 1e3:.1f} ms", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
