"""M0 smoke test: render the Cornell box and dump a PNG + stats."""
import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene

meshes, mats, cam = cornell.make()
scene = compile_scene(meshes, mats)
print(f"tris={scene.n_tris()} bvh_nodes={scene.bvh2_box.shape[0]} "
      f"lights={scene.light_tris.tri_index.shape[0]}")

cfg = RenderConfig(width=128, height=128, bounces=4, bsdf="lambert")
t0 = time.time()
img = render(scene, cam, cfg, spp=4)
img.block_until_ready()
t1 = time.time()
img = render(scene, cam, cfg, spp=64, base_sample=4)
img.block_until_ready()
t2 = time.time()
print(f"compile+4spp: {t1-t0:.1f}s, 64spp: {t2-t1:.2f}s on {jax.devices()[0]}")

arr = np.asarray(img)
print("mean radiance:", arr.mean(axis=(0, 1)), "max:", arr.max())

# simple tonemap + PNG via PIL if available, else npy
out = np.clip(arr / (1.0 + arr), 0, 1) ** (1 / 2.2)
try:
    from PIL import Image
    Image.fromarray((out * 255).astype(np.uint8)).save("/tmp/cornell.png")
    print("wrote /tmp/cornell.png")
except ImportError:
    np.save("/tmp/cornell.npy", arr)
    print("wrote /tmp/cornell.npy")
