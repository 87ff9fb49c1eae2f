"""Split-row gather probe: one [N,30] dependent gather vs 2x[N,15] /
3x[N,10] / 4x[N,8] SAME-INDEX gathers from separate tables. The per-row
HBM gather cost is ~linear in row width (probe_width2/3: ~5 + 1.05*W ns),
so if XLA overlaps same-index streams the wide-row fetch collapses
toward the narrow-width line — the big-scene traversal lever."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

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
    for parts, w in ((1, 30), (2, 15), (3, 10), (4, 8), (6, 5)):
        tabs = tuple(
            (jnp.arange(n_rows, dtype=jnp.uint32)[:, None] * (p + 1)
             * jnp.ones((w,), jnp.uint32)) for p in range(parts))

        def run(idx0, *tabs):
            def body(i, c):
                idx, acc = c
                fold = jnp.zeros((R,), jnp.uint32)
                for tab in tabs:                 # same index, K streams
                    row = tab[idx]
                    for k in range(row.shape[1]):
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
            t, _ = timed(f, idx0, *tabs)
            best = min(best, t)
        ns = best / iters / R * 1e9
        out[f"{parts}x{w}"] = round(ns, 2)
        print(f"{parts} x [N,{w}] same-index gathers: {ns:.2f} ns/row",
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
