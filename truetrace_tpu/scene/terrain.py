"""Terrain heightfields (reference: TerrainObject.cs + the terrain path of
AssetManager.CreateAtlas, AssetManager.cs:477-533).

A terrain is a regular-grid heightmap plus an up-to-4-layer splat
(alpha-)map choosing between layer materials — exactly the data the
reference extracts from a Unity terrain (heightmap texture + alphamap +
4 layer materials, TerrainObject.cs / kernel_shade terrain blending
RayTracingShader.compute:587-616).

TPU representation: the heightmap is stored as a flat [Hm*Wm] float32
array so a texel fetch is a 1-word row gather; the alphamap stays [A,A,4]
and is sampled bilinearly at shade time. All shapes static.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Terrain:
    """One heightfield instance (the reference supports a list of
    TerrainObjects; aggregate multiple by rendering each — or bake to
    meshes for many)."""
    height: jnp.ndarray     # [Hm*Wm] f32 world-space heights (y)
    hm_shape: tuple = struct.field(pytree_node=False)  # (Hm, Wm)
    origin: jnp.ndarray     # [3] world min corner (x, y_base, z)
    size: jnp.ndarray       # [2] world extent in x, z
    h_max: jnp.ndarray      # [] max height above origin.y (AABB top)
    alphamap: jnp.ndarray   # [A,A,4] layer weights (sum<=1 per texel)
    mat_ids: jnp.ndarray    # [4] int32 material table rows


def make_terrain(heightmap: np.ndarray, origin, size_xz,
                 mat_ids: Sequence[int], alphamap: np.ndarray | None = None,
                 height_scale: float = 1.0) -> Terrain:
    """Build a Terrain from a [Hm,Wm] heightmap (heights * height_scale are
    world y offsets above origin[1])."""
    hm = np.asarray(heightmap, np.float32) * float(height_scale)
    Hm, Wm = hm.shape
    if alphamap is None:
        alphamap = np.zeros((2, 2, 4), np.float32)
        alphamap[..., 0] = 1.0
    am = np.asarray(alphamap, np.float32)
    ids = np.full((4,), -1, np.int32)
    ids[:len(mat_ids)] = np.asarray(list(mat_ids), np.int32)
    org = np.asarray(origin, np.float32)
    world_h = hm + org[1]
    return Terrain(
        height=jnp.asarray(world_h.reshape(-1)),
        hm_shape=(Hm, Wm),
        origin=jnp.asarray(org),
        size=jnp.asarray(size_xz, jnp.float32),
        h_max=jnp.asarray(float(hm.max()) + 1e-3, jnp.float32),
        alphamap=jnp.asarray(am),
        mat_ids=jnp.asarray(ids),
    )


def demo_hills(n: int = 129, seed: int = 0) -> np.ndarray:
    """Procedural fractal hills for tests/demos."""
    rng = np.random.default_rng(seed)
    h = np.zeros((n, n), np.float32)
    freq, amp = 1.5, 1.0
    xs = np.linspace(0, 1, n)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    for _ in range(4):
        ph = rng.uniform(0, 2 * np.pi, 4)
        h += amp * (np.sin(2 * np.pi * freq * X + ph[0])
                    * np.sin(2 * np.pi * freq * Z + ph[1])
                    + 0.5 * np.cos(2 * np.pi * freq * (X + Z) + ph[2]))
        freq *= 2.1
        amp *= 0.45
    h -= h.min()
    return (h / max(h.max(), 1e-6)).astype(np.float32)


def scatter_on_terrain(heightmap: np.ndarray, origin, size_xz,
                       height_scale: float = 1.0, n: int = 64,
                       source_id: int = 0, seed: int = 0,
                       max_slope: float = 0.6,
                       scale_range=(0.8, 1.3)) -> list:
    """Scatter instance transforms over a heightfield — the counterpart of
    the reference's terrain detail prefabs / heightmap trees
    (Objects/TerrainObject.cs DetailedObjectInstance.ExportObjects:14,
    consumed by the instancing stack). Rejection-samples uniform xz
    positions, reads the bilinear terrain height, skips slopes steeper
    than `max_slope` (rise per unit run), and yields
    (source_id, l2w 4x4) pairs with random yaw + scale jitter — ready for
    scene/instances.compile_scene_instanced or AssetManager.add_instance.
    """
    from truetrace_tpu.scene.instances import make_transform
    hm = np.asarray(heightmap, np.float64) * float(height_scale)
    Hm, Wm = hm.shape
    org = np.asarray(origin, np.float64)
    sx, sz = float(size_xz[0]), float(size_xz[1])
    rng = np.random.default_rng(seed)
    out = []
    tries = 0
    while len(out) < n and tries < 20 * n:
        tries += 1
        u, v = rng.random(2)
        # bilinear height + central-difference slope at (u, v)
        fx = u * (Wm - 1)
        fz = v * (Hm - 1)
        x0 = min(int(fx), Wm - 2)
        z0 = min(int(fz), Hm - 2)
        tx = fx - x0
        tz = fz - z0
        h = ((1 - tx) * (1 - tz) * hm[z0, x0]
             + tx * (1 - tz) * hm[z0, x0 + 1]
             + (1 - tx) * tz * hm[z0 + 1, x0]
             + tx * tz * hm[z0 + 1, x0 + 1])
        dhdx = (hm[z0, x0 + 1] - hm[z0, x0]) / (sx / (Wm - 1))
        dhdz = (hm[z0 + 1, x0] - hm[z0, x0]) / (sz / (Hm - 1))
        if np.hypot(dhdx, dhdz) > max_slope:
            continue
        pos = (org[0] + u * sx, org[1] + h, org[2] + v * sz)
        s = rng.uniform(*scale_range)
        out.append((source_id,
                    make_transform(translate=pos,
                                   rot_y=rng.uniform(0, 2 * np.pi),
                                   scale=s)))
    return out
