"""Decode-v2 slab-test restructure A/B (round 5, bench VPU lever).

Same-session interleaved A/B (utils/profiling.py interleaved_ab) of the
_DECODE_V2 slab decode (hoisted near/far word select + 1-op bf16 unpacks
+ deferred occ/imask masking) vs the v1 formulation, on the bench ray
mix (primary closest + bounce closest + shadow any-hit, 128k rays).
Also asserts the two variants' Hit outputs are BITWISE equal on-chip
before timing.

The flag is read at trace time, so each variant gets its own jit
closure and a wrapper that (re)sets the module global before every call
— only the first call per closure traces, so both variants coexist
compiled in one process.

Usage: PYTHONPATH=/root/repo python scripts/tune_decode5.py
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


def make_rays(scene, cam):
    from truetrace_tpu.core import rng
    from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
    from truetrace_tpu.scene.ir import camera_rays

    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro_p, rd_p = camera_rays(cam, 1 << 10, R >> 10,
                             pix.astype(jnp.int32), jit2)
    h = cw.closest_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                 ro_p, rd_p, jnp.float32(1e30),
                                 max_stack=scene.cw_stack)
    p_hit = ro_p + rd_p * h.t[:, None]
    u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
    gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
    rd_b = to_world(gn, sample_cosine_hemisphere(u2))
    ro_b = p_hit + gn * 1e-3
    tm_b = jnp.full((R,), 25.0, jnp.float32)
    return (jax.device_put(x) for x in (ro_p, rd_p, ro_b, rd_b, tm_b))


def make_variant(flag: int, stack: int):
    closest_j = jax.jit(
        lambda nodes, rows, ro, rd: cw._dispatch(
            nodes, rows, ro, rd, jnp.float32(1e30), False, stack, True))
    any_j = jax.jit(
        lambda nodes, rows, ro, rd, tm: cw._dispatch(
            nodes, rows, ro, rd, tm, True, stack, True))

    def f(nodes, rows, ro_p, rd_p, ro_b, rd_b, tm_b):
        cw._DECODE_V2 = flag
        h1 = closest_j(nodes, rows, ro_p, rd_p)
        h2 = closest_j(nodes, rows, ro_b, rd_b)
        h3 = any_j(nodes, rows, ro_b, rd_b, tm_b)
        return h1.t, h1.tri, h2.t, h2.tri, h2.u, h2.v, h3.tri

    return f


def run_scene(name, scene, cam):
    ro_p, rd_p, ro_b, rd_b, tm_b = make_rays(scene, cam)
    args = (scene.cw_nodes, scene.cw_leaf_rows,
            ro_p, rd_p, ro_b, rd_b, tm_b)
    flags = [int(x) for x in
             os.environ.get("TT_AB_VARIANTS", "0,3,4").split(",")]
    variants = []
    ref = None
    for fl in flags:
        fn = make_variant(fl, scene.cw_stack)
        t0 = time.perf_counter()
        r = jax.tree_util.tree_map(np.asarray, fn(*args))
        print(f"[{name}] v{fl} compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        if ref is None:
            ref = r
        else:
            for i, (a, b) in enumerate(zip(ref, r)):
                assert np.array_equal(a, b), \
                    f"{name}: v{fl} output {i} differs!"
        variants.append((f"v{fl}", fn, args))
    print(f"[{name}] BITWISE EQUAL across all outputs/variants",
          flush=True)

    res = interleaved_ab(variants, rounds=4)
    per_iter_rays = 3 * R
    out = {}
    for fl in flags:
        k = f"v{fl}"
        out[k] = {"ms": res[k]["median_s"] * 1e3,
                  "mrays": per_iter_rays / res[k]["median_s"] / 1e6}
    for key, v in res.items():
        if isinstance(key, tuple):
            out["-".join(key[1:])] = {
                "mean_ms": v["mean_s"] * 1e3,
                "ci95_ms": v["ci95_s"] * 1e3,
                "significant": v["significant"]}
    print(name, json.dumps(out), flush=True)
    return out


def main():
    from truetrace_tpu.scene.mesh import compile_scene

    results = {}
    from truetrace_tpu.scene import atrium
    meshes, mats, cam, env = atrium.make(detail=1.5)
    sc = compile_scene(meshes, mats, env=env, with_cwbvh=True)
    results["atrium"] = run_scene("atrium", sc, cam)
    del sc

    from truetrace_tpu.scene import sponza_like
    meshes, mats, atlas, rects, level_y, cam, env = sponza_like.make(5.0)
    sc = compile_scene(meshes, mats, env=env, atlas=atlas,
                       atlas_rects=rects, atlas_level_y=level_y,
                       with_cwbvh=True)
    results["sponza_like"] = run_scene("sponza_like", sc, cam)

    print("FINAL", json.dumps(results), flush=True)
    with open("/tmp/decode5.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
