"""CWBVH traversal in pure JAX — validates the builder and serves as the
portable fallback for the Pallas kernel (kernels/cwbvh_pallas.py).

Decodes the 20-word node layout documented in build/cwbvh.py (behavioral
counterpart of the reference's cwbvh_node_intersect,
CommonData.cginc:641-707, redesigned: instead of per-thread persistent
queues, the whole wavefront steps in lock-step; child ordering is by
slab-test distance instead of the octant/meta trick — same pruning power,
simpler with vector lanes).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.core.math import ray_tri
from truetrace_tpu.kernels.traverse_ref import Hit

MAX_STACK = 64
U32 = jnp.uint32


def _byte(w, k):
    return (w >> (8 * k)) & U32(0xFF)


def decode_node(nodes, idx):
    """Gather + decode node rows for a batch of indices.

    Returns dict with p [R,3], scale [R,3], imask [R], base_child [R],
    base_tri [R], meta [R,8], qlo/qhi [R,8,3] (float32)."""
    w = nodes[idx]                                   # [R,20] uint32
    p = jax.lax.bitcast_convert_type(w[..., 0:3], jnp.float32)
    e_b = jnp.stack([_byte(w[..., 3], 0), _byte(w[..., 3], 1),
                     _byte(w[..., 3], 2)], axis=-1)
    scale = jax.lax.bitcast_convert_type(
        (e_b << 23).astype(U32), jnp.float32)        # exact 2^(e-127)
    imask = _byte(w[..., 3], 3)
    base_child = w[..., 4].astype(jnp.int32)
    base_tri = w[..., 5].astype(jnp.int32)
    meta = jnp.stack(
        [_byte(w[..., 6], k) for k in range(4)]
        + [_byte(w[..., 7], k) for k in range(4)], axis=-1)  # [R,8]

    def bytes8(lo_word, hi_word):
        return jnp.stack([_byte(w[..., lo_word], k) for k in range(4)]
                         + [_byte(w[..., hi_word], k) for k in range(4)],
                         axis=-1)

    qlo = jnp.stack([bytes8(8, 9), bytes8(10, 11), bytes8(12, 13)],
                    axis=-1).astype(jnp.float32)     # [R,8,3]
    qhi = jnp.stack([bytes8(14, 15), bytes8(16, 17), bytes8(18, 19)],
                    axis=-1).astype(jnp.float32)
    return dict(p=p, scale=scale, imask=imask, base_child=base_child,
                base_tri=base_tri, meta=meta, qlo=qlo, qhi=qhi)


def intersect_children(nd, ro, rd, inv_rd, t_max):
    """Slab-test all 8 quantized children. Returns (hit [R,8], dist [R,8])."""
    lo = nd["p"][:, None, :] + nd["qlo"] * nd["scale"][:, None, :]
    hi = nd["p"][:, None, :] + nd["qhi"] * nd["scale"][:, None, :]
    t0 = (lo - ro[:, None, :]) * inv_rd[:, None, :]
    t1 = (hi - ro[:, None, :]) * inv_rd[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    # empty slots encode lo>hi -> always miss
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_max[:, None]) \
        & (nd["meta"] != 0)
    return hit, tn


def _traverse(nodes, p0, e1, e2, ro, rd, t_max, any_hit, max_stack):
    R = ro.shape[0]
    T = p0.shape[0]
    r_idx = jnp.arange(R)
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                             jnp.where(rd >= 0, 1e-12, -1e-12), rd)

    stack = jnp.zeros((R, max_stack), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)).astype(jnp.float32)
    tri_best = jnp.full((R,), -1, jnp.int32)
    u_best = jnp.zeros((R,), jnp.float32)
    v_best = jnp.zeros((R,), jnp.float32)

    def cond(st):
        return jnp.any(st[1] > 0)

    def body(st):
        stack, sp, t_best, tri_best, u_best, v_best = st
        active = sp > 0
        spm1 = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[r_idx, spm1], 0)
        sp = jnp.where(active, spm1, sp)

        nd = decode_node(nodes, node)
        hit8, dist8 = intersect_children(nd, ro, rd, inv_rd, t_best)
        hit8 = hit8 & active[:, None]

        is_int = ((nd["imask"][:, None]
                   >> jnp.arange(8, dtype=U32)[None, :]) & U32(1)) == 1
        # internal child node ids: base + popcount(imask below slot)
        below = nd["imask"][:, None] & ((U32(1) << jnp.arange(8, dtype=U32)[None, :]) - U32(1))
        rank = jax.lax.population_count(below).astype(jnp.int32)
        child_id = nd["base_child"][:, None] + rank

        # ---- leaf slots: masked triangle tests (3 per slot max).
        # CLASSIC meta decode only: on a fat-leaf build (p_max>3) the
        # marker byte 0b1000_0000|s would decode as count=1/offset=s and
        # silently mis-intersect — fat builds must use the K-aware *_rows
        # variants (guarded at the jit boundary in closest/any_hit_cwbvh).
        count8 = jax.lax.population_count(nd["meta"] >> 5).astype(jnp.int32)
        off8 = (nd["meta"] & U32(0x1F)).astype(jnp.int32)
        leaf_hit = hit8 & ~is_int
        for s in range(8):
            for j in range(3):
                tid = jnp.clip(nd["base_tri"] + off8[:, s] + j, 0, T - 1)
                valid = leaf_hit[:, s] & (j < count8[:, s])
                h, th, hu, hv = ray_tri(ro, rd, p0[tid], e1[tid], e2[tid],
                                        t_best)
                take = valid & h
                t_best = jnp.where(take, th, t_best)
                tri_best = jnp.where(take, tid, tri_best)
                u_best = jnp.where(take, hu, u_best)
                v_best = jnp.where(take, hv, v_best)
        if any_hit:
            sp = jnp.where(tri_best >= 0, 0, sp)

        # ---- push internal children far-to-near (pop order = near first)
        int_hit = hit8 & is_int
        key = jnp.where(int_hit, dist8, -jnp.inf)    # far first
        order = jnp.argsort(-key, axis=-1)           # descending distance
        for k in range(8):
            s = order[:, k]
            push = int_hit[r_idx, s]
            cid = child_id[r_idx, s]
            slot = jnp.minimum(sp, max_stack - 1)
            val = jnp.where(push, cid, stack[r_idx, slot])
            stack = stack.at[r_idx, slot].set(val)
            sp = sp + push.astype(jnp.int32)
        return stack, sp, t_best, tri_best, u_best, v_best

    st = (stack, sp, t_best, tri_best, u_best, v_best)
    st = jax.lax.while_loop(cond, body, st)
    return Hit(t=st[2], tri=st[3], u=st[4], v=st[5])


def _assert_classic_meta(nodes):
    """Guard: these oracles decode the CLASSIC meta byte only. A fat-leaf
    build (builder p_max>3) emits marker bytes 0b100xxxxx that would
    silently mis-decode as count=1 leaves — refuse them up front.
    Only runs when `nodes` is concrete (skipped under an outer trace)."""
    if isinstance(nodes, jax.core.Tracer):
        return
    w = np.asarray(nodes[:, 6:8])
    meta = np.stack([(w >> (8 * k)) & 0xFF for k in range(4)], axis=-1)
    if np.any((meta >> 5) == 0b100):
        raise ValueError(
            "cwbvh_ref classic-meta oracle given a fat-leaf (p_max>3) "
            "build; use the K-aware *_rows variants instead.")


_closest_hit_cwbvh = partial(jax.jit, static_argnames=("max_stack",))(
    lambda nodes, p0, e1, e2, ro, rd, t_max, max_stack=MAX_STACK:
    _traverse(nodes, p0, e1, e2, ro, rd, t_max, False, max_stack))


def closest_hit_cwbvh(nodes, p0, e1, e2, ro, rd, t_max,
                      max_stack: int = MAX_STACK) -> Hit:
    """Closest-hit via CWBVH on RAW builder nodes (word 5 = base_tri).
    p0/e1/e2 must be in CWBVH leaf order (permuted by CWBVH.tri_index).

    NOTE: `compile_scene` ships nodes patched by pack_leaf_rows (word 5 =
    base LEAF-ROW index) — use the `*_rows` variants for those. Classic
    p_max<=3 meta decode only; fat builds are rejected."""
    _assert_classic_meta(nodes)
    return _closest_hit_cwbvh(nodes, p0, e1, e2, ro, rd, t_max,
                              max_stack=max_stack)


_any_hit_cwbvh = partial(jax.jit, static_argnames=("max_stack",))(
    lambda nodes, p0, e1, e2, ro, rd, t_max, max_stack=MAX_STACK:
    _traverse(nodes, p0, e1, e2, ro, rd, t_max, True, max_stack))


def any_hit_cwbvh(nodes, p0, e1, e2, ro, rd, t_max,
                  max_stack: int = MAX_STACK):
    _assert_classic_meta(nodes)
    hit = _any_hit_cwbvh(nodes, p0, e1, e2, ro, rd, t_max,
                         max_stack=max_stack)
    return hit.tri >= 0


def _traverse_rows(nodes, leaf_rows, ro, rd, t_max, any_hit, max_stack):
    """Same lock-step traversal but against pack_leaf_rows-patched nodes:
    node word 5 is the base LEAF-ROW index and triangle geometry + global
    ids come from the [L,30] leaf-row table (the layout the wavefront
    kernel consumes). Independent oracle for the compiled-Scene path."""
    R = ro.shape[0]
    L = leaf_rows.shape[0]
    r_idx = jnp.arange(R)
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                             jnp.where(rd >= 0, 1e-12, -1e-12), rd)

    stack = jnp.zeros((R, max_stack), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                              (R,)).astype(jnp.float32)
    tri_best = jnp.full((R,), -1, jnp.int32)
    u_best = jnp.zeros((R,), jnp.float32)
    v_best = jnp.zeros((R,), jnp.float32)

    def cond(st):
        return jnp.any(st[1] > 0)

    def body(st):
        stack, sp, t_best, tri_best, u_best, v_best = st
        active = sp > 0
        spm1 = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[r_idx, spm1], 0)
        sp = jnp.where(active, spm1, sp)

        nd = decode_node(nodes, node)
        hit8, dist8 = intersect_children(nd, ro, rd, inv_rd, t_best)
        hit8 = hit8 & active[:, None]

        is_int = ((nd["imask"][:, None]
                   >> jnp.arange(8, dtype=U32)[None, :]) & U32(1)) == 1
        below = nd["imask"][:, None] \
            & ((U32(1) << jnp.arange(8, dtype=U32)[None, :]) - U32(1))
        rank = jax.lax.population_count(below).astype(jnp.int32)
        child_id = nd["base_child"][:, None] + rank

        # leaf slots address leaf rows by their rank among occupied
        # non-internal slots (pack_leaf_rows emits rows in slot order)
        occ = nd["meta"] != 0
        leafmask_bits = jnp.sum(
            jnp.where(occ & ~is_int,
                      1 << jnp.arange(8, dtype=jnp.int32)[None, :], 0),
            axis=-1).astype(U32)
        leaf_hit = hit8 & ~is_int
        for s in range(8):
            lrank = jax.lax.population_count(
                leafmask_bits & ((U32(1) << U32(s)) - U32(1))
            ).astype(jnp.int32)
            lrow_i = jnp.clip(nd["base_tri"] + lrank, 0, L - 1)
            row = leaf_rows[lrow_i]                          # [R,10K]
            K = leaf_rows.shape[1] // 10
            for j in range(K):
                tp0 = row[:, 9 * j: 9 * j + 3]
                te1 = row[:, 9 * j + 3: 9 * j + 6]
                te2 = row[:, 9 * j + 6: 9 * j + 9]
                tid = jax.lax.bitcast_convert_type(row[:, 9 * K + j],
                                                   jnp.int32)
                valid = leaf_hit[:, s] & (tid >= 0)
                h, th, hu, hv = ray_tri(ro, rd, tp0, te1, te2, t_best)
                take = valid & h
                t_best = jnp.where(take, th, t_best)
                tri_best = jnp.where(take, tid, tri_best)
                u_best = jnp.where(take, hu, u_best)
                v_best = jnp.where(take, hv, v_best)
        if any_hit:
            sp = jnp.where(tri_best >= 0, 0, sp)

        int_hit = hit8 & is_int
        key = jnp.where(int_hit, dist8, -jnp.inf)
        order = jnp.argsort(-key, axis=-1)
        for k in range(8):
            s = order[:, k]
            push = int_hit[r_idx, s]
            cid = child_id[r_idx, s]
            slot = jnp.minimum(sp, max_stack - 1)
            val = jnp.where(push, cid, stack[r_idx, slot])
            stack = stack.at[r_idx, slot].set(val)
            sp = sp + push.astype(jnp.int32)
        return stack, sp, t_best, tri_best, u_best, v_best

    st = (stack, sp, t_best, tri_best, u_best, v_best)
    st = jax.lax.while_loop(cond, body, st)
    return Hit(t=st[2], tri=st[3], u=st[4], v=st[5])


@partial(jax.jit, static_argnames=("max_stack",))
def closest_hit_cwbvh_rows(nodes, leaf_rows, ro, rd, t_max,
                           max_stack: int = MAX_STACK) -> Hit:
    """Closest-hit over compile_scene output (patched nodes + leaf rows)."""
    return _traverse_rows(nodes, leaf_rows, ro, rd, t_max, False, max_stack)


@partial(jax.jit, static_argnames=("max_stack",))
def any_hit_cwbvh_rows(nodes, leaf_rows, ro, rd, t_max,
                       max_stack: int = MAX_STACK):
    hit = _traverse_rows(nodes, leaf_rows, ro, rd, t_max, True, max_stack)
    return hit.tri >= 0
