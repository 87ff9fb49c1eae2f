"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric (BASELINE.json north star): CWBVH traversal throughput in Mrays/s on
a Sponza-class scene. Headline scene: the sponza_like asset (~270k tris, a
two-story arcaded atrium with curtains/banners/pots, scene/sponza_like.py)
generated to disk as OBJ+MTL+textures and ingested through the REAL asset
pipeline (obj_loader.load_obj_scene -> atlas -> compile_scene) — the
reference repo ships only Sponza's .mtl/textures, not the mesh, and this
environment has no network egress, so the classic scene itself cannot be
downloaded. The ray mix mirrors a 4-bounce path trace: 1/3 coherent
primary rays, 1/3 incoherent bounce rays (cosine-hemisphere from primary
hits), 1/3 any-hit shadow rays.

Every run ALSO measures the round-1 procedural atrium (293k tris) as a
pinned cross-round continuity metric (VERDICT r2 weak #3: the bench scene
drifted between rounds; `vs_baseline` is only meaningful same-scene).
`vs_baseline` is the atrium ratio against BASELINE_MRAYS — the first
number recorded on this hardware (TPU v5e, round 1; BASELINE.md). The
reference renderer publishes no Mrays/s figures (SURVEY.md section 6), so
the baseline is our own first measurement and must only go up.

Knobs: BENCH_RAYS (batch), BENCH_ITERS, BENCH_DETAIL (sponza detail;
5 ~ 270k tris, 0 = skip sponza), BENCH_SCENE=atrium (atrium only).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# first measured value on TPU v5e (round 1, scatter-free wavefront CWBVH,
# 293k-tri atrium, mixed primary/bounce/shadow rays)
BASELINE_MRAYS = 0.344


def measure(scene, cam, R, iters):
    from truetrace_tpu.core import rng
    from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
    from truetrace_tpu.kernels.cwbvh_wavefront import (
        any_hit_wavefront, closest_hit_wavefront)
    from truetrace_tpu.scene.ir import camera_rays

    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro_p, rd_p = camera_rays(cam, 1 << 10, R >> 10,
                             pix.astype(jnp.int32), jit2)

    # scene arrays are jit ARGUMENTS (closing over them would bake
    # hundreds of MB of constants into the HLO, which the remote-compile
    # path rejects for San-Miguel-scale scenes)
    closest_j = jax.jit(lambda nodes, rows, ro, rd: closest_hit_wavefront(
        nodes, rows, ro, rd, jnp.float32(1e30),
        max_stack=scene.cw_stack), static_argnums=())
    anyhit_j = jax.jit(lambda nodes, rows, ro, rd, tm: any_hit_wavefront(
        nodes, rows, ro, rd, tm, max_stack=scene.cw_stack))
    closest = lambda ro, rd: closest_j(scene.cw_nodes, scene.cw_leaf_rows,
                                       ro, rd)
    anyhit = lambda ro, rd, tm: anyhit_j(scene.cw_nodes,
                                         scene.cw_leaf_rows, ro, rd, tm)

    # bounce-like incoherent rays: cosine directions from primary hits
    h = closest(ro_p, rd_p)
    p_hit = ro_p + rd_p * h.t[:, None]
    u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
    gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
    rd_b = to_world(gn, sample_cosine_hemisphere(u2))
    ro_b = p_hit + gn * 1e-3
    tm_b = jnp.full((R,), 25.0, jnp.float32)

    jax.block_until_ready(closest(ro_b, rd_b).t)        # compile + upload
    jax.block_until_ready(anyhit(ro_b, rd_b, tm_b))

    total_rays = 0
    t0 = time.perf_counter()
    for _ in range(iters):
        r1 = closest(ro_p, rd_p)
        r2 = closest(ro_b, rd_b)
        r3 = anyhit(ro_b, rd_b, tm_b)
        total_rays += 3 * R
    jax.block_until_ready((r1.t, r2.t, r3))
    dt = time.perf_counter() - t0
    return total_rays / dt / 1e6, dt, total_rays


def main():
    from truetrace_tpu.scene.mesh import compile_scene

    scene_kind = os.environ.get("BENCH_SCENE", "both")
    # 128k-ray batches: the cascade chunks them into two 64k stages whose
    # tails pipeline — measured 5.06 vs 4.78 Mrays/s at 64k (round 4)
    R = int(os.environ.get("BENCH_RAYS", str(1 << 17)))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    detail_s = float(os.environ.get("BENCH_DETAIL", "5"))
    # leaf_k=0 -> auto (fat leaf rows, compile_scene): measured faster at
    # BOTH bench scales (BASELINE.md round-3 fat-leaf tables), so auto is
    # the default; BENCH_LEAF_K=3 reproduces the round-1/2 row layout
    leaf_k = int(os.environ.get("BENCH_LEAF_K", "0")) or None

    # pinned continuity scene: the round-1 atrium at detail 1.5 (293k)
    atrium_mrays = None
    if scene_kind in ("both", "atrium"):
        from truetrace_tpu.scene import atrium
        meshes, mats, cam, env = atrium.make(
            detail=float(os.environ.get("BENCH_ATRIUM_DETAIL", "1.5")))
        sc = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                           leaf_k=leaf_k)
        atrium_mrays, _, _ = measure(sc, cam, R, iters)
        atrium_tris = sc.n_tris()
        del sc

    headline = atrium_mrays
    n_tris = atrium_tris if atrium_mrays is not None else 0
    dt = wall = 0.0
    if scene_kind in ("both", "sponza_like") and detail_s > 0:
        from truetrace_tpu.scene import sponza_like
        meshes, mats, atlas, rects, level_y, cam, env = \
            sponza_like.make(detail_s)
        sc = compile_scene(meshes, mats, env=env, atlas=atlas,
                           atlas_rects=rects, atlas_level_y=level_y,
                           with_cwbvh=True, leaf_k=leaf_k)
        headline, wall, total = measure(sc, cam, R, iters)
        n_tris = sc.n_tris()

    out = {
        "metric": "cwbvh_traversal_sponza_class",
        "value": round(headline, 3),
        "unit": "Mrays/s",
        # cross-round continuity ratio: SAME-SCENE (atrium) vs the round-1
        # first measurement
        "vs_baseline": round((atrium_mrays or headline) / BASELINE_MRAYS, 3),
        "detail": {
            "scene_tris": int(n_tris),
            "rays_per_batch": R,
            "mix": "1/3 primary closest, 1/3 bounce closest, 1/3 shadow any-hit",
            "device": str(jax.devices()[0]),
        },
    }
    if atrium_mrays is not None:
        out["detail"]["atrium_mrays"] = round(atrium_mrays, 3)
        out["detail"]["atrium_tris"] = int(atrium_tris)

    # BENCH_BIG=1: the 5.2M-tri HBM-resident regime (incoherent bounce
    # rays — the fat-leaf headline scene; slower: ~1 min + build, cached
    # by TRUETRACE_BUILD_CACHE)
    big_mrays = None
    if os.environ.get("BENCH_BIG") == "1":
        from truetrace_tpu.scene import atrium as _at
        meshes, mats, cam, env = _at.make(detail=5.0)
        sc = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                           leaf_k=leaf_k)
        big_mrays, _, _ = measure(sc, cam, R, max(iters // 2, 2))
        out["detail"]["big_mrays"] = round(big_mrays, 3)
        out["detail"]["big_tris"] = int(sc.n_tris())
        del sc

    # perf CI: append every run to bench_history.jsonl keyed by commit
    # (scripts/bench_gate.py fails when the headline regresses >10% vs
    # the last recorded run — VERDICT r3 item 7). Opt out: BENCH_NO_LOG=1.
    if not os.environ.get("BENCH_NO_LOG"):
        try:
            import subprocess
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__))
            ).stdout.strip() or "unknown"
        except Exception:
            commit = "unknown"
        rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "commit": commit, "scene": scene_kind,
               "rays": R, "headline_mrays": out["value"],
               "atrium_mrays": (round(atrium_mrays, 3)
                                if atrium_mrays is not None else None),
               "big_mrays": (round(big_mrays, 3)
                             if big_mrays is not None else None),
               "scene_tris": int(n_tris),
               "device": str(jax.devices()[0])}
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_history.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps(rec) + "\n")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
