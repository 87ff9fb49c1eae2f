"""Traversal kernel tuning sweep on the real chip.

Measures the bench.py mixed-ray workload across kernel variants reachable
through static knobs (stack depth, chunk size, cascade on/off) to pick
the round-2 defaults. Each new while-loop shape costs a slow remote
compile — run in the background.

Usage: PYTHONPATH=. python scripts/tune_traversal.py
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


def main():
    detail = float(os.environ.get("BENCH_DETAIL", "1.5"))
    R = int(os.environ.get("BENCH_RAYS", str(1 << 16)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))

    from truetrace_tpu.core import rng
    from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
    from truetrace_tpu.kernels import cwbvh_wavefront as wf
    from truetrace_tpu.scene import atrium
    from truetrace_tpu.scene.ir import camera_rays
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam, env = atrium.make(detail=detail)
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True)
    print(f"scene {scene.n_tris()} tris R={R} {jax.devices()[0]}",
          flush=True)

    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro_p, rd_p = camera_rays(cam, 1 << 10, max(R >> 10, 1),
                             pix.astype(jnp.int32), jit2)
    h = wf.closest_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                 ro_p, rd_p, jnp.float32(1e30))
    p_hit = ro_p + rd_p * h.t[:, None]
    u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
    gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
    rd_b = to_world(gn, sample_cosine_hemisphere(u2))
    ro_b = p_hit + gn * 1e-3
    tm_b = jnp.full((R,), 25.0, jnp.float32)

    def measure(closest, anyhit):
        # mixed workload like bench.py: closest primary + closest bounce
        # + any-hit bounce
        def once():
            a = closest(scene.cw_nodes, scene.cw_leaf_rows, ro_p, rd_p,
                        jnp.float32(1e30))
            b = closest(scene.cw_nodes, scene.cw_leaf_rows, ro_b, rd_b,
                        jnp.float32(1e30))
            c = anyhit(scene.cw_nodes, scene.cw_leaf_rows, ro_b, rd_b,
                       tm_b)
            return a.t, b.t, c
        r = once()
        [np.asarray(x) for x in r]
        t0 = time.perf_counter()
        for _ in range(iters):
            r = once()
        [np.asarray(x) for x in r]
        dt = (time.perf_counter() - t0) / iters
        return 3 * R / dt / 1e6

    out = {}
    for stack in (16, 12, 10):
        cj = jax.jit(lambda n, l, o, d, t, s=stack:
                     wf.closest_hit_wavefront(n, l, o, d, t, max_stack=s))
        aj = jax.jit(lambda n, l, o, d, t, s=stack:
                     wf.any_hit_wavefront(n, l, o, d, t, max_stack=s))
        try:
            m = measure(cj, aj)
            out[f"stack{stack}"] = round(m, 3)
            print(f"stack={stack}: {m:.3f} Mrays/s", flush=True)
        except Exception as e:
            print(f"stack={stack} failed: {e}", flush=True)

    # correctness guard for the smaller stacks vs stack16
    h16 = wf.closest_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                   ro_b, rd_b, jnp.float32(1e30),
                                   max_stack=16)
    for stack in (12, 10):
        hs = wf.closest_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                      ro_b, rd_b, jnp.float32(1e30),
                                      max_stack=stack)
        same = bool(jnp.all((hs.tri == h16.tri)
                            & (jnp.abs(hs.t - h16.t) < 1e-3)))
        out[f"stack{stack}_exact"] = same
        print(f"stack={stack} exact={same}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
