"""Careful dependent-gather width sweep: fixed ROW COUNT, variable width,
2 reps, randomized order — decides CWBVH16 (wider rows, fewer gathers)
vs row compression (narrower rows) per cache regime."""
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
    for n_rows in (175_000, 1_400_000):
        for W in (8, 16, 24, 30, 40, 51, 60):
            tab = (jnp.arange(n_rows, dtype=jnp.uint32)[:, None]
                   * jnp.ones((W,), jnp.uint32))

            def run(tab, idx0, n_rows=n_rows):
                def body(i, c):
                    idx, acc = c
                    row = tab[idx]
                    acc = acc + row[:, 0]
                    idx = ((idx * 1664525 + 1013904223 + row[:, -1])
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
            mb = n_rows * W * 4 / (1 << 20)
            out[f"rows{n_rows}_w{W}"] = round(ns, 2)
            print(f"rows={n_rows} W={W} ({mb:.0f} MB): {ns:.2f} ns/row",
                  flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
