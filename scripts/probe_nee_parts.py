"""Attribute the ~180 ms/frame of NEE sample+eval cost to components.

Times each piece standalone on a 262k-lane batch x4 (one per bounce of
the 512^2 frame): cut select, residual descent (full sample_light_tree_cut
minus dense select), triangle sample math, disney eval, lambert eval.
Marginal-slope timing (scripts/profile_frame.py rules)."""
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
    from truetrace_tpu.core import rng
    from truetrace_tpu.integrate.pathtrace import (gather_material,
                                                   sample_light_tris)
    from truetrace_tpu.kernels.disney import disney_eval
    from truetrace_tpu.kernels.lighttree import (_cut_select,
                                                 sample_light_tree_cut)
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.mesh import compile_scene

    R = 1 << 18
    meshes, mats, cam, env = atrium.make(detail=1.5)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                          with_light_bvh=True)
    print(f"tris={scene.n_tris()} lights={scene.light_tris.tri_index.shape[0]}"
          f" cut={scene.lcut_bounds.shape if scene.lcut_bounds is not None else None}"
          f" pairs={scene.lbvh_pairs.shape}", flush=True)

    pix = jnp.arange(R, dtype=jnp.uint32)
    p = jax.random.uniform(jax.random.PRNGKey(0), (R, 3)) * 10.0
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (R, 1))
    u = rng.uniform1(pix, jnp.uint32(0), jnp.uint32(3))
    u2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(4))
    wo = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (R, 1))
    mid = (pix % jnp.uint32(scene.materials.n_materials())).astype(jnp.int32)
    mat = gather_material(scene.materials, mid)

    out = {}

    # 4 DISTINCT rounds (fresh randoms per round — identical args would
    # CSE into one call under jit and report fantasy numbers)
    us = [rng.uniform1(pix, jnp.uint32(i), jnp.uint32(3))
          for i in range(4)]
    u2s = [rng.uniform2(pix, jnp.uint32(i), jnp.uint32(4))
           for i in range(4)]

    def four(f):
        return jax.jit(lambda: [f(us[i], u2s[i]) for i in range(4)])

    t, _ = timed(four(lambda ui, u2i: _cut_select(
        scene.lcut_bounds, p, n, ui)))
    out["cut_select_x4_ms"] = t * 1e3

    t, _ = timed(four(lambda ui, u2i: sample_light_tree_cut(
        scene.lbvh_pairs, scene.lbvh_prim, scene.lcut_bounds,
        scene.lcut_link, p, n, ui)))
    out["tree_cut_full_x4_ms"] = t * 1e3

    t, _ = timed(four(lambda ui, u2i: sample_light_tris(
        scene, p, ui, u2i, sn=n, use_tree=True, approx_mis=True)))
    out["sample_light_tris_x4_ms"] = t * 1e3

    def eval_dirs(ui, u2i):
        wi = jnp.stack([u2i[:, 0], ui, u2i[:, 1]], -1)
        wi = wi / jnp.maximum(
            jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-6)
        return disney_eval(mat, n, wo, wi)

    t, _ = timed(four(eval_dirs))
    out["disney_eval_x4_ms"] = t * 1e3

    from truetrace_tpu.integrate.pathtrace import lambert_eval

    def eval_lam(ui, u2i):
        wi = jnp.stack([u2i[:, 0], ui, u2i[:, 1]], -1)
        wi = wi / jnp.maximum(
            jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-6)
        return lambert_eval(mat, n, wo, wi)

    t, _ = timed(four(eval_lam))
    out["lambert_eval_x4_ms"] = t * 1e3

    t, _ = timed(four(lambda ui, u2i: sample_light_tris(
        scene, p, ui, u2i, sn=n, use_tree=False)))
    out["sample_cdf_x4_ms"] = t * 1e3

    print(json.dumps({k: round(v, 1) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
