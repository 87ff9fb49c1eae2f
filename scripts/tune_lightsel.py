"""Light-selection microbenchmark: CDF searchsorted vs full tree descent
vs cut-based dense selection, isolated from the frame.

Methodology per BASELINE.md: axon microbenchmarks must hard-sync via
np.asarray and measure the MARGINAL slope between two trip counts (the
first post-compile run carries a one-time upload cost and
block_until_ready does not reliably sync small programs).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_lightsel.py
"""
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


def slope_ms(fn, n_lo=4, n_hi=12):
    """ms per call via marginal slope between n_lo and n_hi chained calls."""
    def run(n):
        r = None
        for i in range(n):
            r = fn(jnp.uint32(i))
        np.asarray(jax.tree_util.tree_leaves(r)[0])

    run(2)  # compile + upload
    t0 = time.perf_counter()
    run(n_lo)
    t1 = time.perf_counter()
    run(n_hi)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo) * 1e3


def main():
    from truetrace_tpu.build.lightbvh import (build_cut, build_light_bvh,
                                              build_pairs)
    from truetrace_tpu.core import rng
    from truetrace_tpu.kernels.lighttree import (sample_light_tree,
                                                 sample_light_tree_cut)

    R = 65536
    out = {}
    for L in (40, 4096):
        r = np.random.default_rng(0)
        tris = dict(
            p0=(r.uniform(-1, 1, (L, 3)) * 20).astype(np.float32),
            e1=(r.normal(size=(L, 3)) * 0.3).astype(np.float32),
            e2=(r.normal(size=(L, 3)) * 0.3).astype(np.float32))
        power = r.uniform(0.5, 20.0, L).astype(np.float32)
        lb = build_light_bvh(tris, np.arange(L), power)
        pairs_np, _ = build_pairs(lb.nodes, lb.info)
        cut = build_cut(lb)
        pairs = jnp.asarray(pairs_np)
        prim = jnp.asarray(lb.prim)
        cb = jnp.asarray(cut.bounds)
        cl = jnp.asarray(cut.link)
        cdf = jnp.asarray(np.cumsum(power) / power.sum())

        p = jnp.asarray(r.uniform(-10, 10, (R, 3)).astype(np.float32))
        n_ = r.normal(size=(R, 3)).astype(np.float32)
        n_ /= np.linalg.norm(n_, axis=-1, keepdims=True)
        n = jnp.asarray(n_)
        pix = jnp.arange(R, dtype=jnp.uint32)

        def mk_u(s):
            return rng.uniform1(pix, s, jnp.uint32(7))

        f_cdf = jax.jit(lambda s: jnp.searchsorted(cdf, mk_u(s)))
        f_tree = jax.jit(
            lambda s: sample_light_tree(pairs, prim, p, n, mk_u(s))[0])
        f_cut = jax.jit(
            lambda s: sample_light_tree_cut(pairs, prim, cb, cl, p, n,
                                            mk_u(s))[0])
        out[f"cdf_L{L}_ms"] = slope_ms(f_cdf)
        out[f"tree_L{L}_ms"] = slope_ms(f_tree)
        out[f"cut_L{L}_ms"] = slope_ms(f_cut)
        out[f"cut_M_L{L}"] = int(cut.bounds.shape[0])
        print({k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in out.items()}, flush=True)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
