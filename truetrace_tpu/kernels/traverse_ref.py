"""Reference BVH2 traversal in pure JAX (vectorized over a ray wavefront).

This is the always-correct baseline the Pallas CWBVH kernel (kernels/cwbvh.py)
is validated against, and the portable path for CPU tests. Behavioral
counterpart of the reference's compute traversal
(IntersectionKernels.compute:155-252 closest-hit,
CommonData.cginc:710-819 any-hit), redesigned for the TPU execution model:

* No per-thread persistent queues or atomics — the whole wavefront steps the
  traversal loop in lock-step under one `lax.while_loop`; finished lanes are
  masked (idle-lane cost is recovered at a higher level by ray compaction,
  integrate/wavefront.py).
* Per-ray traversal stack is a [R, S] int32 array in registers/VMEM, matching
  the reference's fixed 16-entry local stack idea (IntersectionKernels:65)
  but sized for BVH2 depth.
* Near-child-first ordering via slab-test distances, so early-out `t_max`
  tightening prunes like the reference's ordered traversal.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from truetrace_tpu.core.math import ray_aabb, ray_tri

MAX_STACK = 64


class Hit(NamedTuple):
    t: jnp.ndarray        # [R] hit distance (t_max if miss)
    tri: jnp.ndarray      # [R] int32 triangle id (-1 if miss)
    u: jnp.ndarray        # [R] barycentric u
    v: jnp.ndarray        # [R] barycentric v


def _traverse(box, left, count, p0, e1, e2, ro, rd, t_max,
              any_hit: bool, max_leaf: int, max_stack: int):
    R = ro.shape[0]
    T = p0.shape[0]
    r_idx = jnp.arange(R)
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                             jnp.where(rd >= 0, 1e-12, -1e-12), rd)

    stack = jnp.zeros((R, max_stack), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)          # root pre-pushed at slot 0
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)).astype(jnp.float32)
    tri_best = jnp.full((R,), -1, jnp.int32)
    u_best = jnp.zeros((R,), jnp.float32)
    v_best = jnp.zeros((R,), jnp.float32)

    def cond(state):
        sp = state[1]
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, t_best, tri_best, u_best, v_best = state
        active = sp > 0
        spm1 = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[r_idx, spm1], 0)
        sp = jnp.where(active, spm1, sp)

        nleft = left[node]
        ncount = count[node]
        is_leaf = ncount > 0

        # --- leaf: unrolled triangle tests (leaves hold <= max_leaf prims)
        leaf_active = active & is_leaf
        for j in range(max_leaf):
            tid = jnp.clip(nleft + j, 0, T - 1)
            valid = leaf_active & (j < ncount)
            h, th, hu, hv = ray_tri(ro, rd, p0[tid], e1[tid], e2[tid], t_best)
            take = valid & h
            t_best = jnp.where(take, th, t_best)
            tri_best = jnp.where(take, tid, tri_best)
            u_best = jnp.where(take, hu, u_best)
            v_best = jnp.where(take, hv, v_best)
        if any_hit:
            # early out: a found occluder empties the stack
            sp = jnp.where(tri_best >= 0, 0, sp)

        # --- internal: ordered child push
        int_active = active & ~is_leaf
        c0 = jnp.clip(nleft, 0, box.shape[0] - 1)
        c1 = jnp.clip(nleft + 1, 0, box.shape[0] - 1)
        h0, d0 = ray_aabb(ro, inv_rd, box[c0, 0], box[c0, 1], t_best)
        h1, d1 = ray_aabb(ro, inv_rd, box[c1, 0], box[c1, 1], t_best)
        h0 = h0 & int_active
        h1 = h1 & int_active
        both = h0 & h1
        near0 = d0 <= d1
        near = jnp.where(near0, c0, c1)
        far = jnp.where(near0, c1, c0)

        # push far first (popped last), then near
        push_far = both
        val = jnp.where(push_far, far, stack[r_idx, jnp.minimum(sp, max_stack - 1)])
        stack = stack.at[r_idx, jnp.minimum(sp, max_stack - 1)].set(val)
        sp = sp + push_far.astype(jnp.int32)

        push_any = h0 | h1
        only = jnp.where(h0, c0, c1)
        top = jnp.where(both, near, only)
        val = jnp.where(push_any, top, stack[r_idx, jnp.minimum(sp, max_stack - 1)])
        stack = stack.at[r_idx, jnp.minimum(sp, max_stack - 1)].set(val)
        sp = sp + push_any.astype(jnp.int32)

        return stack, sp, t_best, tri_best, u_best, v_best

    state = (stack, sp, t_best, tri_best, u_best, v_best)
    state = jax.lax.while_loop(cond, body, state)
    _, _, t_best, tri_best, u_best, v_best = state
    return Hit(t=t_best, tri=tri_best, u=u_best, v=v_best)


@partial(jax.jit, static_argnames=("max_leaf", "max_stack"))
def closest_hit_bvh2(box, left, count, p0, e1, e2, ro, rd, t_max,
                     max_leaf: int = 4, max_stack: int = MAX_STACK) -> Hit:
    """Closest-hit query for a wavefront of rays.

    box/left/count: BVH2 arrays; p0/e1/e2: triangles (leaf order);
    ro/rd: [R,3]; t_max: scalar or [R]."""
    return _traverse(box, left, count, p0, e1, e2, ro, rd, t_max,
                     any_hit=False, max_leaf=max_leaf, max_stack=max_stack)


@partial(jax.jit, static_argnames=("max_leaf", "max_stack"))
def any_hit_bvh2(box, left, count, p0, e1, e2, ro, rd, t_max,
                 max_leaf: int = 4, max_stack: int = MAX_STACK):
    """Occlusion query: returns bool [R] (True = blocked before t_max)."""
    hit = _traverse(box, left, count, p0, e1, e2, ro, rd, t_max,
                    any_hit=True, max_leaf=max_leaf, max_stack=max_stack)
    return hit.tri >= 0


def brute_force_closest(p0, e1, e2, ro, rd, t_max) -> Hit:
    """O(R*T) ground truth for property tests (hit set must match BVH)."""
    def per_ray(o, d):
        h, t, u, v = ray_tri(o[None, :], d[None, :], p0, e1, e2,
                             jnp.asarray(t_max, jnp.float32))
        t = jnp.where(h, t, jnp.inf)
        i = jnp.argmin(t)
        hit_any = jnp.isfinite(t[i])
        return (jnp.where(hit_any, t[i], t_max),
                jnp.where(hit_any, i.astype(jnp.int32), -1),
                u[i], v[i])
    t, tri, u, v = jax.vmap(per_ray)(ro, rd)
    return Hit(t=t, tri=tri, u=u, v=v)


def transmit_brute(p0, e1, e2, tint, ro, rd, t_max):
    """O(R*T) shadow transmittance oracle: product of the shadow tints of
    EVERY triangle crossed on the segment (reference
    triangle_intersect_shadow semantics, CommonData.cginc:593-634).
    tint: [T,3]; returns [R,3]."""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), ro.shape[:1])

    def per_ray(o, d, tm):
        h, t, _, _ = ray_tri(o[None, :], d[None, :], p0, e1, e2, tm)
        crossed = h & (t < tm)
        f = jnp.where(crossed[:, None], tint, 1.0)
        return jnp.exp(jnp.sum(jnp.log(jnp.maximum(f, 1e-30)), axis=0))

    tp = jax.vmap(per_ray)(ro, rd, t_max)
    return jnp.where(jnp.max(tp, axis=-1, keepdims=True) < 1e-3, 0.0, tp)
