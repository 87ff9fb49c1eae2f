"""Fat-leaf-row sweep on the big-table regime (ROADMAP round-3 item 2).

Measures incoherent-bounce closest-hit throughput at TT_DETAIL (default 5
= 5.2M-tri atrium, ~290 MB unified table at K=3) for leaf_k in {3, 6}
[, 12 with TT_FAT_K12=1]. K=6 doubles the tris tested per leaf iteration
at (measured) unchanged per-row gather cost in the W>=60 flat mode —
see BASELINE.md round-3 width map. Each variant runs in a fresh
subprocess (chip serialization + clean module state); marginal-slope
timing per CLAUDE.md.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_fat.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

SNIPPET = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.scene import atrium
from truetrace_tpu.scene.mesh import compile_scene
from truetrace_tpu.scene.ir import camera_rays
from truetrace_tpu.core import rng
from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world
from truetrace_tpu.kernels.cwbvh_wavefront import closest_hit_wavefront

detail = float(os.environ.get("TT_DETAIL", "5"))
leaf_k = int(os.environ.get("TT_LEAF_K", "3"))
t_build0 = time.perf_counter()
meshes, mats, cam, env = atrium.make(detail=detail)
scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                      leaf_k=leaf_k)
tab_mb = (scene.cw_nodes.shape[0] * scene.cw_leaf_rows.shape[1]
          + scene.cw_leaf_rows.shape[0] * scene.cw_leaf_rows.shape[1]
          ) * 4 / (1 << 20)
print(f"built {scene.n_tris()} tris k={leaf_k} "
      f"nodes={scene.cw_nodes.shape[0]} rows={scene.cw_leaf_rows.shape} "
      f"table~{tab_mb:.0f}MB stack={scene.cw_stack} "
      f"({time.perf_counter()-t_build0:.0f}s build)", flush=True)

R = 1 << 17          # 128k batch / 64k chunks pipelines chunk tails
pix = jnp.arange(R, dtype=jnp.uint32)
jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
ro_p, rd_p = camera_rays(cam, 1 << 10, R >> 10, pix.astype(jnp.int32), jit2)
f = jax.jit(lambda n, l, o, d: closest_hit_wavefront(
    n, l, o, d, jnp.float32(1e30), max_stack=scene.cw_stack))
h = f(scene.cw_nodes, scene.cw_leaf_rows, ro_p, rd_p)
p_hit = ro_p + rd_p * h.t[:, None]
u2 = rng.uniform2(pix, jnp.uint32(1), jnp.uint32(3))
gn = jnp.stack([jnp.zeros(R), jnp.ones(R), jnp.zeros(R)], -1)
rd_b = to_world(gn, sample_cosine_hemisphere(u2))
ro_b = p_hit + gn * 1e-3

def run(n):
    r = None
    for _ in range(n):
        r = f(scene.cw_nodes, scene.cw_leaf_rows, ro_b, rd_b)
    np.asarray(r.t)

run(2)
t0 = time.perf_counter(); run(4); t1 = time.perf_counter()
run(12); t2 = time.perf_counter()
ms = ((t2 - t1) - (t1 - t0)) / 8 * 1e3
print("RESULT", ms, R / (ms * 1e-3) / 1e6, flush=True)
"""


def main():
    variants = [("k3", {"TT_LEAF_K": "3"}), ("k6", {"TT_LEAF_K": "6"})]
    if os.environ.get("TT_FAT_K12") == "1":
        variants.append(("k12", {"TT_LEAF_K": "12"}))
    out = {}
    for name, env in variants:
        e = dict(os.environ, **env)
        r = subprocess.run([sys.executable, "-c", SNIPPET], env=e,
                           capture_output=True, text=True, timeout=3600)
        for ln in r.stdout.splitlines():
            print(f"[{name}] {ln}", flush=True)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT")]
        if line:
            ms, mrays = line[-1].split()[1:3]
            out[name] = {"ms_per_batch": round(float(ms), 2),
                         "mrays": round(float(mrays), 3)}
        else:
            out[name] = {"error": r.stderr[-800:]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
