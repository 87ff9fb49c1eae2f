"""Train the learned denoiser (post/neural.py — the OIDN slot) on this
renderer's own output: random Cornell-variant scenes rendered at low spp
(noisy input) and high spp (target), batched as random crops.

Usage:
    python scripts/train_denoiser.py [--steps 300] [--out examples/denoiser.msgpack]

Runs on whatever backend JAX picks (TPU via axon, or CPU with --cpu).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp-noisy", type=int, default=2)
    ap.add_argument("--spp-target", type=int, default=256)
    ap.add_argument("--out", default="examples/denoiser.msgpack")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from truetrace_tpu.integrate.pathtrace import (RenderConfig,
                                                   render_sample_with_stats)
    from truetrace_tpu.post.neural import init_params, make_train_step
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    rng = np.random.default_rng(0)
    H = W = args.res
    cfg = RenderConfig(width=W, height=H, bounces=3, bsdf="disney")

    print(f"rendering {args.scenes} training pairs "
          f"({args.spp_noisy} vs {args.spp_target} spp)...", flush=True)
    pairs = []
    for si in range(args.scenes):
        meshes, mats, cam = cornell.make()
        # material jitter for variety
        for m in mats:
            m.base_color = tuple(np.clip(
                np.asarray(m.base_color) * rng.uniform(0.5, 1.4, 3), 0, 1))
            m.roughness = float(np.clip(m.roughness
                                        * rng.uniform(0.5, 1.5), 0.03, 1))
        scene = compile_scene(meshes, mats)
        pixel = jnp.arange(H * W, dtype=jnp.uint32)

        def render_avg(spp, base):
            acc = jnp.zeros((H * W, 3))
            st = None
            for s in range(spp):
                rad, st = render_sample_with_stats(scene, cam, cfg, pixel,
                                                   base + s)
                acc = acc + rad
            return acc / spp, st

        noisy, st = render_avg(args.spp_noisy, 0)
        target, _ = render_avg(args.spp_target, 1000)
        pairs.append(dict(
            noisy=np.asarray(noisy).reshape(H, W, 3),
            target=np.asarray(target).reshape(H, W, 3),
            albedo=np.asarray(st["albedo"]).reshape(H, W, 3),
            normal=np.asarray(st["normal"]).reshape(H, W, 3)))
        print(f"  scene {si}: mean {float(np.mean(pairs[-1]['target'])):.4f}",
              flush=True)

    params = init_params(jax.random.PRNGKey(0), H, W)
    tx, step = make_train_step(1e-3)
    import optax  # noqa: F401  (tx created inside make_train_step)
    opt_state = tx.init(params)

    t0 = time.time()
    for it in range(args.steps):
        k = rng.integers(len(pairs))
        b = {kk: jnp.asarray(v)[None] for kk, v in pairs[k].items()}
        params, opt_state, loss = step(params, opt_state, b)
        if it % 25 == 0 or it == args.steps - 1:
            print(f"step {it:5d} loss {float(loss):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
