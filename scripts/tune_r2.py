"""Round-2 traversal tuning harness: measure closest-hit throughput for
kernel variants toggled by env flags (each variant runs in a fresh
subprocess so module-level flags re-read). Incoherent bounce rays,
marginal-slope timing (CLAUDE.md benchmarking rules).

Flags exercised across round 2 (findings recorded in BASELINE.md):
  TT_TRANSPOSE_ROW=0   restore per-column stride-30 slices (default 1:
                       one shared u32 transpose — measured +15-20%)
  TT_MAX_STACK=N       stack plane count for callers without a Scene
                       (Scene.cw_stack carries the exact tree depth)
  TT_CHUNK_RAYS=N      lax.map chunk size for batches above 64k
  TT_DETAIL=x          atrium scene density (1.5 = 293k tris, 5 = 5.2M)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_r2.py
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

detail = float(os.environ.get("TT_DETAIL", "1.5"))
meshes, mats, cam, env = atrium.make(detail=detail)
scene = compile_scene(meshes, mats, env=env, with_cwbvh=True)
R = 1 << 16
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
    variants = [
        ("base", {}),
        ("no_transpose", {"TT_TRANSPOSE_ROW": "0"}),
        ("base_again", {}),     # chip-noise control
    ]
    out = {}
    for name, env in variants:
        e = dict(os.environ, **env)
        r = subprocess.run([sys.executable, "-c", SNIPPET], env=e,
                           capture_output=True, text=True, timeout=3600)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT")]
        if line:
            ms, mrays = line[-1].split()[1:3]
            out[name] = {"ms_per_batch": round(float(ms), 2),
                         "mrays": round(float(mrays), 3)}
        else:
            out[name] = {"error": r.stderr[-500:]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
