"""Round-3 perf probes: what actually bounds the traversal step.

1. dependent row-gather cost vs ROW WIDTH (is compression a lever?)
2. iteration statistics of the real traversal (visits/ray, leaf vs node
   mix, straggler tail) on the bench workload
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n1=1, n2=3):
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


def gather_width_sweep():
    """Dependent [R,W] row gather in a fori chain, W in {4,8,16,30,60}."""
    R = 1 << 16
    iters = 64
    out = {}
    for rows_mb in (20, 160):
        n_rows = rows_mb * (1 << 20) // (30 * 4)
        for W in (4, 8, 16, 30, 60):
            tab = jnp.arange(n_rows * W, dtype=jnp.uint32).reshape(n_rows, W)

            def run(tab, idx0, n_rows=n_rows):
                def body(i, c):
                    idx, acc = c
                    row = tab[idx]                       # dependent gather
                    acc = acc + row[:, 0]
                    # LCG jump from gathered data -> dependent chain
                    idx = ((idx * 1664525 + 1013904223 + row[:, -1])
                           % n_rows).astype(jnp.int32)
                    return idx, acc
                return jax.lax.fori_loop(0, iters, body,
                                         (idx0, jnp.zeros((R,), jnp.uint32)))

            f = jax.jit(run)
            idx0 = jnp.arange(R, dtype=jnp.int32) * 7919 % n_rows
            t, _ = timed(f, tab, idx0)
            ns = t / iters / R * 1e9
            out[f"gather_{rows_mb}MB_w{W}"] = round(ns, 2)
            print(f"table {rows_mb}MB width {W}: {ns:.2f} ns/row", flush=True)
    return out


def iteration_stats(detail=1.5):
    """Run the real single-stage traversal step-by-step and histogram
    per-lane activity: total visits, leaf vs node iterations."""
    from truetrace_tpu.core import rng
    from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
    from truetrace_tpu.kernels import cwbvh_wavefront as wf
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.ir import camera_rays
    from truetrace_tpu.scene.mesh import compile_scene

    R = 1 << 15
    meshes, mats, cam, env = atrium.make(detail=detail)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True)
    print(f"scene {scene.n_tris()} tris stack={scene.cw_stack}", flush=True)
    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro_p, rd_p = camera_rays(cam, 1 << 9, max(R >> 9, 1),
                             pix.astype(jnp.int32), jit2)
    h = wf.closest_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                 ro_p, rd_p, jnp.float32(1e30))
    p_hit = ro_p + rd_p * h.t[:, None]
    u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
    gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
    rd_b = to_world(gn, sample_cosine_hemisphere(u2))
    ro_b = p_hit + gn * 1e-3

    unified = wf._pack_table(scene.cw_nodes, scene.cw_leaf_rows)
    L, C = scene.cw_leaf_rows.shape[0], scene.cw_nodes.shape[0]

    @jax.jit
    def census(ro, rd, tm):
        st = wf._init_state(unified, ro, rd, tm, 0, scene.cw_stack)

        def body(c):
            st, it, act_sum, leaf_sum = c
            act = wf._active(st)
            leaf = act & ((st["hits"] & wf.LEAF_MASK) != 0)
            st = wf._step(unified, L, C, False, st)
            return (st, it + 1,
                    act_sum + jnp.sum(act.astype(jnp.int32)),
                    leaf_sum + jnp.sum(leaf.astype(jnp.int32)))

        def cond(c):
            st, it, _, _ = c
            return jnp.any(wf._active(st)) & (it < 4096)

        st, iters, act_sum, leaf_sum = jax.lax.while_loop(
            cond, body, (st, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        return iters, act_sum, leaf_sum

    out = {}
    for name, (ro, rd, tm) in (
            ("primary", (ro_p, rd_p, jnp.full((R,), 1e30))),
            ("bounce", (ro_b, rd_b, jnp.full((R,), 1e30))),
            ("shadow25", (ro_b, rd_b, jnp.full((R,), 25.0)))):
        iters, act, leaf = census(ro, rd, tm)
        out[name] = dict(
            lockstep_iters=int(iters),
            visits_per_ray=round(float(act) / R, 2),
            leaf_frac=round(float(leaf) / max(float(act), 1), 3))
        print(f"{name}: lockstep iters={int(iters)} visits/ray="
              f"{out[name]['visits_per_ray']} leaf_frac="
              f"{out[name]['leaf_frac']}", flush=True)
    return out


if __name__ == "__main__":
    res = {}
    res.update(gather_width_sweep())
    res["iter_stats"] = iteration_stats(
        float(os.environ.get("BENCH_DETAIL", "1.5")))
    print(json.dumps(res), flush=True)
