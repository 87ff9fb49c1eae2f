"""Intermediate fat-leaf sweep: k to {6, 8, 10} on the bench mix (round 5).

The measured optima bracket k6 (cache-resident) and k12 (HBM) — this
probes whether the cache-resident bench scenes peak BETWEEN them
(k8/k10: fewer leaf iterations than k6, less any-hit Moller than k12).
Same-session interleaved A/B; one jitted dispatch per table width
(shape-keyed jit cache keeps all variants compiled at once).

Usage: PYTHONPATH=/root/repo python scripts/tune_fat8.py
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

import truetrace_tpu.kernels.cwbvh_wavefront as cw
from truetrace_tpu.utils.profiling import interleaved_ab

R = int(os.environ.get("BENCH_RAYS", str(1 << 17)))
KS = [int(x) for x in os.environ.get("TT_KS", "6,8,10").split(",")]


def bench_fn(stack: int):
    closest_j = jax.jit(
        lambda nodes, rows, ro, rd: cw._dispatch(
            nodes, rows, ro, rd, jnp.float32(1e30), False, stack, True))
    any_j = jax.jit(
        lambda nodes, rows, ro, rd, tm: cw._dispatch(
            nodes, rows, ro, rd, tm, True, stack, True))

    def f(nodes, rows, ro_p, rd_p, ro_b, rd_b, tm_b):
        h1 = closest_j(nodes, rows, ro_p, rd_p)
        h2 = closest_j(nodes, rows, ro_b, rd_b)
        h3 = any_j(nodes, rows, ro_b, rd_b, tm_b)
        return h1.t, h2.t, h3

    return f


def run_scene(name, make_scene, cam_of):
    from truetrace_tpu.scene.mesh import compile_scene
    from tests.test_fat_leaves import _rays  # noqa: F401 (unused)

    variants = []
    args_by_k = {}
    stack_max = 0
    for k in KS:
        meshes, mats, cam, env, extra = make_scene()
        sc = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                           leaf_k=k, **extra)
        stack_max = max(stack_max, sc.cw_stack)
        args_by_k[k] = (sc, cam)
        print(f"[{name}] k{k}: tris={sc.n_tris()} "
              f"table_rows={sc.cw_leaf_rows.shape}", flush=True)

    from truetrace_tpu.core import rng
    from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
    from truetrace_tpu.scene.ir import camera_rays

    for k in KS:
        sc, cam = args_by_k[k]
        pix = jnp.arange(R, dtype=jnp.uint32)
        jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
        ro_p, rd_p = camera_rays(cam, 1 << 10, R >> 10,
                                 pix.astype(jnp.int32), jit2)
        h = cw.closest_hit_wavefront(sc.cw_nodes, sc.cw_leaf_rows,
                                     ro_p, rd_p, jnp.float32(1e30),
                                     max_stack=sc.cw_stack)
        p_hit = ro_p + rd_p * h.t[:, None]
        u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
        gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
        rd_b = to_world(gn, sample_cosine_hemisphere(u2))
        ro_b = p_hit + gn * 1e-3
        tm_b = jnp.full((R,), 25.0, jnp.float32)
        args = (sc.cw_nodes, sc.cw_leaf_rows, ro_p, rd_p, ro_b, rd_b,
                tm_b)
        fn = bench_fn(sc.cw_stack)   # exact per-k stack depth
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])
        print(f"[{name}] k{k} compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        variants.append((f"k{k}", fn, args))

    res = interleaved_ab(variants, rounds=4)
    out = {}
    for k in KS:
        key = f"k{k}"
        out[key] = {"ms": res[key]["median_s"] * 1e3,
                    "mrays": 3 * R / res[key]["median_s"] / 1e6}
    for key, v in res.items():
        if isinstance(key, tuple):
            out["-".join(key[1:])] = {
                "mean_ms": v["mean_s"] * 1e3, "ci95_ms": v["ci95_s"] * 1e3,
                "significant": v["significant"]}
    print(name, json.dumps(out), flush=True)
    return out


def main():
    results = {}

    def atrium_make():
        from truetrace_tpu.scene import atrium
        meshes, mats, cam, env = atrium.make(detail=1.5)
        return meshes, mats, cam, env, {}

    results["atrium"] = run_scene("atrium", atrium_make, None)

    def sponza_make():
        from truetrace_tpu.scene import sponza_like
        meshes, mats, atlas, rects, level_y, cam, env = \
            sponza_like.make(5.0)
        return meshes, mats, cam, env, dict(
            atlas=atlas, atlas_rects=rects, atlas_level_y=level_y)

    results["sponza_like"] = run_scene("sponza_like", sponza_make, None)
    print("FINAL", json.dumps(results), flush=True)
    with open("/tmp/fat8.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
