"""Follow-up width sweep: consume EVERY column (fold into the accumulator)
so XLA cannot shrink the gather to the used columns; map the w~60 cliff."""
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
    n_rows = 1_400_000
    out = {}
    for W in (30, 44, 51, 56, 60, 64):
        tab = (jnp.arange(n_rows, dtype=jnp.uint32)[:, None]
               * jnp.ones((W,), jnp.uint32))

        def run(tab, idx0, W=W):
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
        print(f"W={W} ({n_rows * W * 4 / (1 << 20):.0f} MB): "
              f"{ns:.2f} ns/row (full-row consume)", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
