"""Sharding the COMPOSED production frame (round-5 VERDICT item 6).

`Renderer.step` — trace + ReSTIR DI/GI + radiance cache + denoiser +
TAAU + post (reference RayTracingMaster.cs:954-1131) — carries
image-space temporal state (reservoirs, SVGF moments, TAAU history) and
a scene-space hash cache. Tile sharding is exactly where such state can
silently break: spatial filter taps and motion reprojection read across
tile boundaries.

The TPU-native answer is GSPMD rather than manual halo plumbing: place
the image-space state row-sharded over a 1-D device mesh
(`NamedSharding`), keep scene + cache replicated, and `jax.jit` the
UNCHANGED composed step — XLA partitions the embarrassingly-parallel
trace (the ~95% cost) across the tile axis and inserts the collectives
(halo exchanges / all-gathers) wherever a spatial tap or reprojection
gather crosses a tile edge. Semantics are those of the single-device
program by GSPMD construction, so there is NO seam policy to document:
`tests/test_dist_composed.py` asserts N-device == 1-device to float
tolerance (scatter-add reduction order inside the cache insert is the
only permitted difference).

This is the composed-frame counterpart of dist/sharding.py's
render_tiled (which shards the bare integrator with shard_map).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from truetrace_tpu.dist.sharding import TILE_AXIS


def _row_spec(leaf, h: int, w: int, n: int):
    """Shard leading axes that look image-sized (H rows or H*W flat
    pixels) across the tile axis; replicate everything else. Row counts
    must divide the axis size."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    d0 = leaf.shape[0]
    if d0 in (h, h * w) and (d0 // (w if d0 == h * w else 1)) % n == 0:
        return P(TILE_AXIS, *([None] * (leaf.ndim - 1)))
    return P()


def shard_frame_state(state, mesh: Mesh, h: int, w: int):
    """device_put a FrameState pytree with image-space leaves row-sharded
    over `mesh` and scalar/scene-space leaves (sample id, radiance cache,
    exposure) replicated."""
    n = mesh.shape[TILE_AXIS]

    def put(leaf):
        if leaf is None:
            return None
        spec = _row_spec(jnp.asarray(leaf), h, w, n)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, state)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated on the mesh (scene, camera)."""
    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def composed_step_sharded(renderer, mesh: Mesh):
    """Returns a jitted `frame(state) -> (display, radiance, new_state)`
    whose inputs/outputs carry the row-sharded placement. The renderer's
    scene is replicated onto the mesh once here."""
    renderer.scene = replicate(renderer.scene, mesh)

    @jax.jit
    def frame(st):
        return renderer.step(st)
    return frame
