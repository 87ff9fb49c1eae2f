"""Multi-device scaling harness (BASELINE: >=85% rays/s efficiency 1->N).

Runs the tile-sharded renderer over meshes of increasing size and reports
throughput + parallel efficiency. On a real pod slice this measures ICI
scaling; under `--xla_force_host_platform_device_count` it validates the
sharding program and measures the (host-bound) virtual scaling.

Also provides the determinism check from SURVEY.md section 4.4: the
N-device image must be bitwise-identical to the 1-device image — true by
construction here because the counter-based RNG derives every sample from
(pixel, sample) ids, which sharding does not change.
"""
from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.dist.sharding import make_mesh, render_tiled
from truetrace_tpu.integrate.pathtrace import RenderConfig


def measure_scaling(scene, cam, cfg: RenderConfig, spp: int = 2,
                    device_counts: List[int] = None,
                    iters: int = 3) -> Dict:
    """Returns {n_devices: {mrays_per_s, efficiency, image_checksum}}."""
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = {}
    base = None
    ref_img = None

    # true per-frame ray count (trace + shadow, all bounces) from the
    # integrator's own counters — not just primary rays
    from truetrace_tpu.integrate.pathtrace import render_sample_with_stats
    pixel = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    _, st = jax.jit(lambda s: render_sample_with_stats(
        scene, cam, cfg, pixel, s))(jnp.uint32(0))
    rays_per_spp = float(st["n_trace"]) + float(st["n_shadow"])

    for n in device_counts:
        if cfg.height % n != 0:
            continue
        mesh = make_mesh(n)
        # compile
        img = render_tiled(scene, cam, cfg, mesh, spp=spp)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        for _ in range(iters):
            img = render_tiled(scene, cam, cfg, mesh, spp=spp)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / iters
        rays = rays_per_spp * spp
        rps = rays / dt
        if base is None:
            base = rps
            ref_img = np.asarray(img)
        eff = rps / (base * n / device_counts[0])
        results[n] = {
            "rays_per_s": rps,
            "efficiency": eff,
            "identical_to_1dev": bool(np.array_equal(np.asarray(img),
                                                     ref_img)),
            "wall_s": dt,
        }
    return results
