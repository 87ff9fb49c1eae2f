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
                levels: Tuple[np.ndarray, ...], leaf_k: int = 3):
    """Recompute all node bounds for updated triangle arrays.

    nodes [C,20] u32; tri_* [T,3] (CWBVH order); slot_* from the builder;
    levels from `level_worklists`; leaf_k = max tris per leaf slot (the
    builder's p_max — pass the fat-leaf K for leaf_k>3 builds or the
    refit bounds silently miss tris 4..K). Returns (new_nodes,
    root_aabb [2,3])."""
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

        # leaf-slot boxes: union of up to leaf_k tris
        leaf_lo = jnp.full((K, 8, 3), INF)
        leaf_hi = jnp.full((K, 8, 3), -INF)
        for j in range(leaf_k):
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


# ---------------------------------------------------------------------------
# light-BVH refit (reference LightBVHRefitter.compute: RefitKernel /
# LightRefitKernel — bottom-up cone unions + bounds per depth layer,
# worklists from LightBVHBuilder's WorkingSet)
# ---------------------------------------------------------------------------

def light_level_worklists(info: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Node ids per depth (deepest first) for the light BVH layout of
    build/lightbvh.py (info: leaf -> (first, count>0); internal ->
    (left, -right))."""
    N = info.shape[0]
    depth = np.zeros(N, np.int32)
    stack = [(0, 1)]
    while stack:
        n, d = stack.pop()
        depth[n] = d
        if info[n, 1] < 0:          # internal
            stack.append((info[n, 0], d + 1))
            stack.append((-info[n, 1], d + 1))
    return tuple(np.nonzero(depth == lvl)[0].astype(np.int32)
                 for lvl in range(depth.max(), 0, -1))


def _cone_union_jax(a_axis, a_cos, b_axis, b_cos):
    """Vectorized PBRT-4 DirectionCone::Union ([K,3]/[K] inputs)."""
    a_cos = jnp.clip(a_cos, -1.0, 1.0)
    b_cos = jnp.clip(b_cos, -1.0, 1.0)
    t_a = jnp.arccos(a_cos)
    t_b = jnp.arccos(b_cos)
    d = jnp.arccos(jnp.clip(jnp.sum(a_axis * b_axis, -1), -1.0, 1.0))
    a_holds = jnp.minimum(d + t_b, jnp.pi) <= t_a + 1e-6
    b_holds = jnp.minimum(d + t_a, jnp.pi) <= t_b + 1e-6
    theta_o = 0.5 * (t_a + d + t_b)
    full = theta_o >= jnp.pi - 1e-6
    # rotate a toward b by (theta_o - t_a)
    c = jnp.cross(a_axis, b_axis)
    s = jnp.linalg.norm(c, axis=-1, keepdims=True)
    c_n = c / jnp.maximum(s, 1e-8)
    ang = (theta_o - t_a)[..., None]
    rot = (a_axis * jnp.cos(ang) + jnp.cross(c_n, a_axis) * jnp.sin(ang)
           + c_n * jnp.sum(c_n * a_axis, -1, keepdims=True)
           * (1 - jnp.cos(ang)))
    rot = jnp.where(s < 1e-8, a_axis, rot)
    axis = jnp.where(a_holds[..., None], a_axis,
                     jnp.where(b_holds[..., None], b_axis, rot))
    cos_o = jnp.where(a_holds, a_cos,
                      jnp.where(b_holds, b_cos,
                                jnp.where(full, -1.0, jnp.cos(theta_o))))
    return axis, cos_o


def refit_light_bvh(nodes, info: np.ndarray, prim: np.ndarray,
                    tri_p0, tri_e1, tri_e2, light_tri_ids, power,
                    levels: Tuple[np.ndarray, ...]):
    """Recompute light-BVH node bounds/cones/power for moved emissive
    triangles; topology (info/prim/trail) is untouched — exactly the
    reference's GPU light refit. Returns new nodes [N,12].

    nodes: current [N,12] (device); info/prim: host topology arrays;
    light_tri_ids: [L] global tri ids (device or host); power: [L]."""
    tid = jnp.asarray(light_tri_ids)[jnp.asarray(prim)]  # leaf slot -> tri
    p0 = tri_p0[tid]
    p1 = p0 + tri_e1[tid]
    p2 = p0 + tri_e2[tid]
    slot_lo = jnp.minimum(jnp.minimum(p0, p1), p2)
    slot_hi = jnp.maximum(jnp.maximum(p0, p1), p2)
    gn = jnp.cross(p1 - p0, p2 - p0)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                          1e-20)
    slot_pow = jnp.asarray(power)[jnp.asarray(prim)]

    info_j = jnp.asarray(info)
    N = nodes.shape[0]
    out = jnp.asarray(nodes)
    for ids_np in levels:
        if ids_np.size == 0:
            continue
        ids = jnp.asarray(ids_np)
        is_leaf = info_j[ids, 1] > 0
        first = info_j[ids, 0]
        # leaves hold exactly one light (build MAX_LEAF=1)
        l_lo = slot_lo[jnp.clip(first, 0, slot_lo.shape[0] - 1)]
        l_hi = slot_hi[jnp.clip(first, 0, slot_lo.shape[0] - 1)]
        l_ax = gn[jnp.clip(first, 0, slot_lo.shape[0] - 1)]
        l_ph = slot_pow[jnp.clip(first, 0, slot_lo.shape[0] - 1)]
        # internal: union of the two (already refit, deeper) children
        lc = jnp.clip(info_j[ids, 0], 0, N - 1)
        rc = jnp.clip(-info_j[ids, 1], 0, N - 1)
        i_lo = jnp.minimum(out[lc, 0:3], out[rc, 0:3])
        i_hi = jnp.maximum(out[lc, 3:6], out[rc, 3:6])
        i_ax, i_cos = _cone_union_jax(out[lc, 6:9], out[lc, 9],
                                      out[rc, 6:9], out[rc, 9])
        i_ph = out[lc, 11] + out[rc, 11]
        row = jnp.where(
            is_leaf[:, None],
            jnp.concatenate([l_lo, l_hi, l_ax,
                             jnp.stack([jnp.ones_like(l_ph),
                                        jnp.zeros_like(l_ph), l_ph], 1)],
                            axis=1),
            jnp.concatenate([i_lo, i_hi, i_ax,
                             jnp.stack([i_cos, jnp.zeros_like(i_ph),
                                        i_ph], 1)], axis=1))
        out = out.at[ids].set(row.astype(jnp.float32))
    return out
