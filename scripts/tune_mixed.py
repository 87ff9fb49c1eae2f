"""Mixed-dispatch vs separate-dispatch measurement (bench workload)."""
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

    # one 3R mixed batch, INTERLEAVED so every 64k chunk gets a 1/3 mix
    ro_all = jnp.stack([ro_p, ro_b, ro_b], 1).reshape(3 * R, 3)
    rd_all = jnp.stack([rd_p, rd_b, rd_b], 1).reshape(3 * R, 3)
    tm_all = jnp.stack([jnp.full((R,), 1e30), jnp.full((R,), 1e30),
                        jnp.full((R,), 25.0)], 1).reshape(3 * R)
    any_all = jnp.stack([jnp.zeros(R, bool), jnp.zeros(R, bool),
                         jnp.ones(R, bool)], 1).reshape(3 * R)

    mj = jax.jit(lambda n, l, o, d, t, a: wf.mixed_hit_wavefront(
        n, l, o, d, t, a))
    cj = jax.jit(lambda n, l, o, d, t: wf.closest_hit_wavefront(
        n, l, o, d, t))
    aj = jax.jit(lambda n, l, o, d, t: wf.any_hit_wavefront(n, l, o, d, t))

    def sep():
        a = cj(scene.cw_nodes, scene.cw_leaf_rows, ro_p, rd_p,
               jnp.float32(1e30))
        b = cj(scene.cw_nodes, scene.cw_leaf_rows, ro_b, rd_b,
               jnp.float32(1e30))
        c = aj(scene.cw_nodes, scene.cw_leaf_rows, ro_b, rd_b,
               jnp.full((R,), 25.0))
        return a.t, b.t, c

    def mix():
        return mj(scene.cw_nodes, scene.cw_leaf_rows, ro_all, rd_all,
                  tm_all, any_all).t

    out = {}
    for name, fn in (("separate", sep), ("mixed", mix)):
        r = fn()
        [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]
        dt = (time.perf_counter() - t0) / iters
        m = 3 * R / dt / 1e6
        out[name] = round(m, 3)
        print(f"{name}: {m:.3f} Mrays/s", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
