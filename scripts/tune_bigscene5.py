"""Round-5 big-scene (HBM-table) experiments — VERDICT item 3 groundwork.

Part 1 — hot-row LOCALITY probe: on a ~330 MB table, dependent gathers
whose indices concentrate on a ~19 MB hot subset, with the subset laid
out (a) contiguous at the front vs (b) scattered uniformly across the
table. If contiguity is what keeps the subset cache-resident (granule-
based caching), a hot/cold row split pays; if both run at the same
ns/row, the cache is row-granular and row PLACEMENT is a dead end (the
round-4 sorting result already killed access-ORDER levers).

Part 2 — 5.2M-tri leaf_k A/B on BOTH ray classes: the round-5 293k
frame A/B flipped auto to k6 because shadow any-hit hates fat rows;
the big-scene sweep (round 3) only measured closest-hit (k12 +13%).
Paired closest AND any-hit at 5.2M decides the big-scene auto rule.

Usage: PYTHONPATH=/root/repo python scripts/tune_bigscene5.py
Env: TT_BS_OUT (/tmp/bigscene5.json), TT_BS_DETAIL (5).
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


def locality_probe():
    """ns/row for dependent gathers into a 330 MB table, hot subset
    contiguous vs scattered vs full-range control."""
    from truetrace_tpu.utils.profiling import marginal_slope
    ROWS, W = 1_400_000, 60            # ~336 MB u32
    HOT = 80_000                       # ~19 MB
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (ROWS, W), 0, 1 << 30,
                               dtype=jnp.int32).astype(jnp.uint32)
    R = 1 << 16
    ITERS = 64

    def chain(tab, ids_map, start):
        """Dependent-gather chain: next index derived from the gathered
        row, mapped into the target id set via ids_map (a [M] row-id
        table, itself an independent cheap gather)."""
        def body(i, carry):
            idx, acc = carry
            row = tab[idx]                        # dependent [R,W] gather
            acc = acc + row[:, 7]
            nxt = (idx * jnp.uint32(1664525) + row[:, 3]
                   + jnp.uint32(1013904223))
            idx = ids_map[(nxt % jnp.uint32(ids_map.shape[0]))
                          .astype(jnp.int32)]
            return idx, acc
        idx0 = ids_map[(start % jnp.uint32(ids_map.shape[0]))
                       .astype(jnp.int32)]
        _, acc = jax.lax.fori_loop(0, ITERS, body,
                                   (idx0, jnp.zeros((R,), jnp.uint32)))
        return acc

    start = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, 1 << 30,
                               dtype=jnp.int32).astype(jnp.uint32)
    sets = {
        "hot_contiguous": jnp.arange(HOT, dtype=jnp.int32),
        "hot_scattered": jnp.asarray(np.random.RandomState(7).choice(
            ROWS, HOT, replace=False).astype(np.int32)),
        "full_range": jnp.arange(ROWS, dtype=jnp.int32),
    }
    out = {}
    f = jax.jit(chain)
    for name, ids in sets.items():
        t = marginal_slope(f, table, ids, start, n1=2, n2=6)
        ns = t / (R * ITERS) * 1e9
        out[name] = round(ns, 2)
        print(f"locality {name}: {ns:.2f} ns/row", flush=True)
    return out


def bigscene_ab(detail: float):
    from truetrace_tpu.core import rng
    from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
    from truetrace_tpu.kernels.cwbvh_wavefront import (any_hit_wavefront,
                                                       closest_hit_wavefront)
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.ir import camera_rays
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.utils.profiling import interleaved_ab

    meshes, mats, cam, env = atrium.make(detail=detail)
    scenes = {}
    for k in (6, 12):
        t0 = time.perf_counter()
        scenes[k] = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                                  leaf_k=k)
        print(f"built k={k}: {scenes[k].n_tris()} tris "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    R = 1 << 17
    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    variants = []
    for k in (6, 12):
        sc = scenes[k]
        ro_p, rd_p = camera_rays(cam, 1 << 10, R >> 10,
                                 pix.astype(jnp.int32), jit2)
        f0 = jax.jit(lambda n, l, o, d, s=sc: closest_hit_wavefront(
            n, l, o, d, jnp.float32(1e30), max_stack=s.cw_stack))
        h = f0(sc.cw_nodes, sc.cw_leaf_rows, ro_p, rd_p)
        p_hit = ro_p + rd_p * h.t[:, None]
        u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
        gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
        rd_b = to_world(gn, sample_cosine_hemisphere(u2))
        ro_b = p_hit + gn * 1e-3
        variants.append((
            f"closest_k{k}",
            jax.jit(lambda n, l, o, d, s=sc: closest_hit_wavefront(
                n, l, o, d, jnp.float32(1e30),
                max_stack=s.cw_stack).t),
            (sc.cw_nodes, sc.cw_leaf_rows, ro_b, rd_b)))
        variants.append((
            f"anyhit_k{k}",
            jax.jit(lambda n, l, o, d, s=sc: any_hit_wavefront(
                n, l, o, d, jnp.full((R,), 8.0),
                max_stack=s.cw_stack)),
            (sc.cw_nodes, sc.cw_leaf_rows, ro_b, rd_b)))
    res = interleaved_ab(variants, rounds=3, n1=2, n2=6)
    out = {}
    for key, v in res.items():
        if isinstance(key, str):
            out[key] = {"ms": round(v["median_s"] * 1e3, 1),
                        "mrays": round(R / v["median_s"] / 1e6, 3)}
    return out


def main():
    out_path = os.environ.get("TT_BS_OUT", "/tmp/bigscene5.json")
    detail = float(os.environ.get("TT_BS_DETAIL", "5"))
    print(f"device {jax.devices()[0]}", flush=True)
    out = {"locality": locality_probe(),
           "bigscene": bigscene_ab(detail)}
    print(json.dumps(out, indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
