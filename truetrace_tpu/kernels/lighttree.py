"""Light-BVH importance descent + pdf evaluation (pure JAX, vectorized).

Counterpart of the reference's GPU light-tree sampling
(CommonData.cginc:1007-1166: `Importance`, `SampleLightBVH`, `CalcLightPDF`),
built from the PBRT-4 formulation. Branchless vector math throughout —
angles are manipulated via cos/sin subtraction identities, never arccos.

Layout contract with build/lightbvh.py:
  nodes [N,12]: min(3) max(3) axis(3) cos_o _unused phi
  info  [N,2]:  leaf (first_prim, count>0); internal (left, -right)
  trail [L]:    bit k set = take the right child at depth k
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from truetrace_tpu.core.math import dot, normalize

MAX_DEPTH = 32
COS_E = 0.0     # emission cone falloff half-angle = pi/2 for area lights


def _cos_sub_clamped(sin_a, cos_a, sin_b, cos_b):
    """cos(a-b), = 1 when a < b (angles in [0, pi])."""
    return jnp.where(cos_a > cos_b, 1.0, cos_a * cos_b + sin_a * sin_b)


def _sin_sub_clamped(sin_a, cos_a, sin_b, cos_b):
    """sin(a-b), = 0 when a < b."""
    return jnp.where(cos_a > cos_b, 0.0, sin_a * cos_b - cos_a * sin_b)


def node_importance(nodes, idx, p, n):
    """PBRT-4 LightBounds::Importance for a batch of (node idx, point p,
    shading normal n). Returns [R] importance >= 0."""
    row = nodes[idx]                          # [R,12]
    lo = row[..., 0:3]
    hi = row[..., 3:6]
    axis = row[..., 6:9]
    cos_o = row[..., 9]
    phi = row[..., 11]

    pc = 0.5 * (lo + hi)
    d = pc - p
    d2 = jnp.maximum(dot(d, d), 1e-12)
    # clamp distance to half-diagonal: inside-the-bounds points see phi
    r2 = 0.25 * dot(hi - lo, hi - lo)
    d2c = jnp.maximum(d2, 0.5 * r2)
    wi = d * jax.lax.rsqrt(d2)[..., None]     # p -> light center

    # theta_w: angle between light axis and direction toward p
    cos_w = dot(axis, -wi)
    sin_w = jnp.sqrt(jnp.maximum(1.0 - cos_w * cos_w, 0.0))
    # theta_b: angle subtended by the bounding sphere from p
    sin2_b = jnp.clip(r2 / d2, 0.0, 1.0)
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin2_b, 0.0))
    sin_b = jnp.sqrt(sin2_b)
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))

    # theta' = max(theta_w - theta_o - theta_b, 0)
    cos_x = _cos_sub_clamped(sin_w, cos_w, sin_o, cos_o)
    sin_x = _sin_sub_clamped(sin_w, cos_w, sin_o, cos_o)
    cos_p = _cos_sub_clamped(sin_x, cos_x, sin_b, cos_b)
    # emission cone cutoff: theta' must be < theta_e (= pi/2)
    ok = cos_p > COS_E
    imp = phi * jnp.where(ok, cos_p, 0.0) / d2c

    # incident-angle factor at the shading point: cos(max(theta_i-theta_b,0))
    cos_i = jnp.abs(dot(wi, n))
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    cos_ip = _cos_sub_clamped(sin_i, cos_i, sin_b, cos_b)
    imp = imp * cos_ip
    return jnp.maximum(imp, 0.0)


def _children(info, node):
    """(left, right, is_leaf, first, count) for a batch of node ids
    (single row gather, then column slices)."""
    row = info[node]
    a = row[..., 0]
    b = row[..., 1]
    is_leaf = b > 0
    left = a
    right = -b
    return left, right, is_leaf, a, b


def sample_light_tree(nodes, info, prim, p, n, u):
    """Descend the tree: returns (light_idx [R] int32, pmf [R], u' [R]).

    u is one uniform per lane, progressively rescaled at every branch (the
    reference does the same: SampleLightBVH CommonData.cginc:1126)."""
    R = p.shape[0]

    def body(_, state):
        node, pmf, u, done = state
        left, right, is_leaf, _, _ = _children(info, node)
        il = node_importance(nodes, left, p, n)
        ir = node_importance(nodes, right, p, n)
        tot = il + ir
        ql = jnp.where(tot > 0.0, il / jnp.maximum(tot, 1e-20), 0.5)
        go_left = u < ql
        u_new = jnp.where(go_left, u / jnp.maximum(ql, 1e-9),
                          (u - ql) / jnp.maximum(1.0 - ql, 1e-9))
        u_new = jnp.clip(u_new, 0.0, 1.0 - 1e-7)
        q = jnp.where(go_left, ql, 1.0 - ql)
        nxt = jnp.where(go_left, left, right)
        active = ~done & ~is_leaf
        node = jnp.where(active, nxt, node)
        pmf = jnp.where(active, pmf * jnp.maximum(q, 1e-12), pmf)
        u = jnp.where(active, u_new, u)
        # check if the node we just moved to is a leaf
        _, _, now_leaf, _, _ = _children(info, node)
        done = done | now_leaf
        return node, pmf, u, done

    node0 = jnp.zeros((R,), jnp.int32)
    _, _, leaf0, _, _ = _children(info, node0)
    state = (node0, jnp.ones((R,), jnp.float32), u, leaf0,
             jnp.int32(0))

    def wbody(st):
        node, pmf, u, done, k = st
        node, pmf, u, done = body(k, (node, pmf, u, done))
        return node, pmf, u, done, k + 1

    # early-exit at the actual tree depth instead of a fixed 32 rounds
    node, pmf, u, _, _ = jax.lax.while_loop(
        lambda st: ~jnp.all(st[3]) & (st[4] < MAX_DEPTH), wbody, state)
    first = info[node, 0]
    light = prim[first]
    return light, pmf, u


def light_tree_pdf(nodes, info, trail, light_idx, p, n):
    """pmf the descent assigns to `light_idx` from point p — O(depth),
    following the stored root->leaf bit trail (reference CalcLightPDF,
    CommonData.cginc:1057)."""
    R = p.shape[0]
    bits = trail[jnp.maximum(light_idx, 0)]

    def body(k, state):
        node, pmf, done = state
        left, right, is_leaf, _, _ = _children(info, node)
        il = node_importance(nodes, left, p, n)
        ir = node_importance(nodes, right, p, n)
        tot = il + ir
        ql = jnp.where(tot > 0.0, il / jnp.maximum(tot, 1e-20), 0.5)
        go_right = ((bits >> k) & jnp.uint32(1)) == 1
        q = jnp.where(go_right, 1.0 - ql, ql)
        nxt = jnp.where(go_right, right, left)
        active = ~done & ~is_leaf
        node = jnp.where(active, nxt, node)
        pmf = jnp.where(active, pmf * jnp.maximum(q, 1e-12), pmf)
        _, _, now_leaf, _, _ = _children(info, node)
        done = done | now_leaf
        return node, pmf, done

    node0 = jnp.zeros((R,), jnp.int32)
    _, _, leaf0, _, _ = _children(info, node0)
    state = (node0, jnp.ones((R,), jnp.float32), leaf0, jnp.int32(0))

    def wbody(st):
        node, pmf, done, k = st
        node, pmf, done = body(k, (node, pmf, done))
        return node, pmf, done, k + 1

    _, pmf, _, _ = jax.lax.while_loop(
        lambda st: ~jnp.all(st[2]) & (st[3] < MAX_DEPTH), wbody, state)
    return jnp.where(light_idx >= 0, pmf, 0.0)
