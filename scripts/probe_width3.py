"""Width sweep round 3: map the W>=60 flat gather mode out to W=128.

probe_width2 found a mode switch at W>=60 (34 ns/row, SAME as W=30 —
cheaper than W=44..56). If that mode stays flat to W~120, leaf rows can
carry 2x-4x the triangles at zero extra gather cost, halving/quartering
leaf iterations in the HBM-bound big-scene regime (ROADMAP round-3
item 2). Full-row consumption (XLA shrinks gathers to used columns)."""
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


def main():
    R = 1 << 16
    iters = 64
    out = {}
    for W in (30, 60, 64, 72, 80, 96, 112, 120, 128):
        # keep the table HBM-resident (~170 MB) at every width so the
        # cache regime is constant across the sweep
        n_rows = max((170 << 20) // (W * 4), 1 << 18)
        tab = (jnp.arange(n_rows, dtype=jnp.uint32)[:, None]
               * jnp.ones((W,), jnp.uint32))

        def run(tab, idx0, W=W, n_rows=n_rows):
            def body(i, c):
                idx, acc = c
                row = tab[idx]
                fold = row[:, 0]
                for k in range(1, W):        # consume EVERY column
                    fold = fold ^ row[:, k]
                acc = acc + fold
                idx = ((idx * 1664525 + 1013904223 + fold)
                       % n_rows).astype(jnp.int32)
                return idx, acc
            return jax.lax.fori_loop(0, iters, body,
                                     (idx0, jnp.zeros((R,), jnp.uint32)))

        f = jax.jit(run)
        idx0 = jnp.arange(R, dtype=jnp.int32) * 7919 % n_rows
        best = 1e30
        for _ in range(2):
            t, _ = timed(f, tab, idx0)
            best = min(best, t)
        ns = best / iters / R * 1e9
        out[f"w{W}"] = round(ns, 2)
        print(f"W={W} ({n_rows * W * 4 / (1 << 20):.0f} MB, "
              f"{n_rows} rows): {ns:.2f} ns/row", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
