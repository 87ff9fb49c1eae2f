"""CWBVH refit: bottom-up level sweeps for deformed/skinned geometry.

Counterpart of the reference's GPU refit chain (Utility/BVHRefitter.compute:
`RefitLayer`/`RefitBVHLayer` bottom-up AABB reduction over per-depth layer
worklists :165-252, `NodeUpdate` 8-bit requantization :255-313,
`NodeCompress` repack :319-375; worklists built by DocumentNodes,
ParentObject.cs:638). TPU form: one vectorized pass per depth level —
gather child boxes, union, requantize, repack the 20-word rows, scatter the
level's rows back. Topology (meta/base words 4..7) is untouched; only
origin/scale/quantized boxes change — exactly like the reference's refit.

The level worklists are static per scene (numpy), so `refit_cwbvh` traces
into a fixed sequence of vectorized updates under jit.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.cwbvh import CWBVH

U32 = jnp.uint32
INF = jnp.inf


def level_worklists(cw: CWBVH) -> Tuple[np.ndarray, ...]:
    """Node ids grouped by depth, deepest level first."""
    d = cw.node_depth
    return tuple(np.nonzero(d == lvl)[0].astype(np.int32)
                 for lvl in range(d.max(), 0, -1))


def _pack_bytes4(b0, b1, b2, b3):
    return (b0.astype(U32) | (b1.astype(U32) << 8)
            | (b2.astype(U32) << 16) | (b3.astype(U32) << 24))


def refit_cwbvh(nodes, tri_p0, tri_e1, tri_e2,
                slot_child, slot_tri_base, slot_tri_count,
                levels: Tuple[np.ndarray, ...]):
    """Recompute all node bounds for updated triangle arrays.

    nodes [C,20] u32; tri_* [T,3] (CWBVH order); slot_* from the builder;
    levels from `level_worklists`. Returns (new_nodes, root_aabb [2,3])."""
    C = nodes.shape[0]
    T = tri_p0.shape[0]
    node_lo = jnp.full((C, 3), INF)
    node_hi = jnp.full((C, 3), -INF)

    for ids_np in levels:
        if ids_np.size == 0:
            continue
        ids = jnp.asarray(ids_np)
        K = ids.shape[0]
        sc = slot_child[ids]            # [K,8]
        stb = slot_tri_base[ids]
        stc = slot_tri_count[ids]

        # leaf-slot boxes: union of up to 3 tris
        leaf_lo = jnp.full((K, 8, 3), INF)
        leaf_hi = jnp.full((K, 8, 3), -INF)
        for j in range(3):
            tid = jnp.clip(stb + j, 0, T - 1)
            p0 = tri_p0[tid]
            p1 = p0 + tri_e1[tid]
            p2 = p0 + tri_e2[tid]
            t_lo = jnp.minimum(jnp.minimum(p0, p1), p2)
            t_hi = jnp.maximum(jnp.maximum(p0, p1), p2)
            use = (j < stc)[..., None]
            leaf_lo = jnp.where(use, jnp.minimum(leaf_lo, t_lo), leaf_lo)
            leaf_hi = jnp.where(use, jnp.maximum(leaf_hi, t_hi), leaf_hi)

        # internal-slot boxes from already-refit children (deeper level)
        ch = jnp.maximum(sc, 0)
        int_lo = node_lo[ch]
        int_hi = node_hi[ch]
        is_int = (sc >= 0)[..., None]
        is_leaf = (stc > 0)[..., None]
        slot_lo = jnp.where(is_int, int_lo,
                            jnp.where(is_leaf, leaf_lo, INF))
        slot_hi = jnp.where(is_int, int_hi,
                            jnp.where(is_leaf, leaf_hi, -INF))

        n_lo = jnp.min(slot_lo, axis=1)
        n_hi = jnp.max(slot_hi, axis=1)
        node_lo = node_lo.at[ids].set(n_lo)
        node_hi = node_hi.at[ids].set(n_hi)

        # requantize (reference NodeUpdate:292-309: conservative 8-bit)
        ext = jnp.maximum(n_hi - n_lo, 0.0)
        e = jnp.ceil(jnp.log2(jnp.maximum(ext, 1e-30) / 255.0))
        e = jnp.where(255.0 * jnp.exp2(e) < ext, e + 1.0, e)
        e_b = jnp.clip(e + 127.0, 1.0, 254.0).astype(jnp.int32)
        scale = jnp.exp2(e_b.astype(jnp.float32) - 127.0)

        q_lo = jnp.floor((slot_lo - n_lo[:, None, :]) / scale[:, None, :])
        q_hi = jnp.ceil((slot_hi - n_lo[:, None, :]) / scale[:, None, :])
        valid = is_int | is_leaf
        q_lo = jnp.where(valid, jnp.clip(q_lo, 0, 255), 255.0)
        q_hi = jnp.where(valid, jnp.clip(q_hi, 0, 255), 0.0)
        q_lo = q_lo.astype(jnp.int32)
        q_hi = q_hi.astype(jnp.int32)

        # repack rows: words 0..3 (origin + e/imask) and 8..19 (q bytes);
        # words 4..7 (topology) are preserved
        rows = nodes[ids]
        w0_2 = jax.lax.bitcast_convert_type(n_lo.astype(jnp.float32), U32)
        imask = rows[:, 3] & U32(0xFF000000)
        w3 = (e_b[:, 0].astype(U32) | (e_b[:, 1].astype(U32) << 8)
              | (e_b[:, 2].astype(U32) << 16) | imask)
        new_rows = rows
        new_rows = new_rows.at[:, 0:3].set(w0_2)
        new_rows = new_rows.at[:, 3].set(w3)
        for axis in range(3):
            lo_a = q_lo[:, :, axis]
            hi_a = q_hi[:, :, axis]
            new_rows = new_rows.at[:, 8 + 2 * axis].set(
                _pack_bytes4(lo_a[:, 0], lo_a[:, 1], lo_a[:, 2], lo_a[:, 3]))
            new_rows = new_rows.at[:, 9 + 2 * axis].set(
                _pack_bytes4(lo_a[:, 4], lo_a[:, 5], lo_a[:, 6], lo_a[:, 7]))
            new_rows = new_rows.at[:, 14 + 2 * axis].set(
                _pack_bytes4(hi_a[:, 0], hi_a[:, 1], hi_a[:, 2], hi_a[:, 3]))
            new_rows = new_rows.at[:, 15 + 2 * axis].set(
                _pack_bytes4(hi_a[:, 4], hi_a[:, 5], hi_a[:, 6], hi_a[:, 7]))
        nodes = nodes.at[ids].set(new_rows)

    root_aabb = jnp.stack([node_lo[0], node_hi[0]])
    return nodes, root_aabb


def deform_tris(tri_p0, tri_e1, tri_e2, transform_fn):
    """Apply a vertex-space deformation to edge-form triangles.

    transform_fn: [N,3] -> [N,3] world-space vertex map (skinning, waves,
    rigid motion...). Returns new (p0, e1, e2)."""
    v0 = transform_fn(tri_p0)
    v1 = transform_fn(tri_p0 + tri_e1)
    v2 = transform_fn(tri_p0 + tri_e2)
    return v0, v1 - v0, v2 - v0
