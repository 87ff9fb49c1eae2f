"""Drive the library surface end-to-end: compile a scene, render the
Cornell box through the public API, and print observable image stats."""
import sys

import jax

# env-var platform selection is unreliable under the axon sitecustomize —
# force CPU via config before first device use (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene

meshes, mats, cam = cornell.make()
scene = compile_scene(meshes, mats, with_cwbvh=True)
print(f"scene: tris={scene.n_tris()} bvh2_nodes={scene.bvh2_box.shape[0]} "
      f"cwbvh_nodes={scene.cw_nodes.shape[0]} "
      f"light_tris={int(scene.light_tris.tri_index.shape[0])}")

cfg = RenderConfig(width=48, height=48, bounces=3)
img = np.asarray(render(scene, cam, cfg, spp=24))
print(f"image {img.shape} finite={np.isfinite(img).all()} "
      f"mean={img.mean():.4f} max={img.max():.3f}")

# observable physics: left wall red, right wall green, light bright
mid = img[18:30]
left = mid[:, 2:10].mean(axis=(0, 1))
right = mid[:, 38:46].mean(axis=(0, 1))
top = img[:8].max()
print(f"left-wall rgb={np.round(left,3)} right-wall rgb={np.round(right,3)} "
      f"top-max={top:.2f}")
ok = left[0] > left[1] and right[1] > right[0] and top > 1.0 \
    and np.isfinite(img).all() and img.mean() > 0.01
print("E2E:", "OK" if ok else "BAD")
sys.exit(0 if ok else 1)
