"""Light-BVH importance descent + pdf evaluation (pure JAX, vectorized).

Counterpart of the reference's GPU light-tree sampling
(CommonData.cginc:1007-1166: `Importance`, `SampleLightBVH`, `CalcLightPDF`),
built from the PBRT-4 formulation. Branchless vector math throughout —
angles are manipulated via cos/sin subtraction identities, never arccos.

Data layout: descent "pair rows" (build/lightbvh.py `build_pairs`) hold
BOTH children's bounds plus the two links, so every descent step costs
exactly ONE row gather (the same lesson as the CWBVH traversal: dependent
gathers are the budget). All importance math runs on [R] column slices —
[R,3] sub-slices of gathered rows pay ~2x relayout tax (BASELINE.md).

Loops early-exit at the actual tree depth (while_loop), not a fixed
round count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Must not exceed the 32-bit pdf trail. build/lightbvh.py forces leaves at
# depth > 30, so descent depth <= 31 and every trail fits uint32; a deeper
# cap here would let sample_light_tree descend past where light_tree_pdf's
# trail bits can follow (wrong MIS pdfs).
MAX_DEPTH = 32
COS_E = 0.0     # emission cone falloff half-angle = pi/2 for area lights


def _cos_sub_clamped(sin_a, cos_a, sin_b, cos_b):
    """cos(a-b), = 1 when a < b (angles in [0, pi])."""
    return jnp.where(cos_a > cos_b, 1.0, cos_a * cos_b + sin_a * sin_b)


def _sin_sub_clamped(sin_a, cos_a, sin_b, cos_b):
    """sin(a-b), = 0 when a < b."""
    return jnp.where(cos_a > cos_b, 0.0, sin_a * cos_b - cos_a * sin_b)


def _importance_cols(row, off, px, py, pz, nx, ny, nz):
    """PBRT-4 LightBounds::Importance on a 12-float bounds block starting
    at column `off` of gathered pair rows. Fully scalarized."""
    c = lambda k: row[:, off + k]
    lox, loy, loz = c(0), c(1), c(2)
    hix, hiy, hiz = c(3), c(4), c(5)
    ax, ay, az = c(6), c(7), c(8)
    cos_o = c(9)
    phi = c(11)

    pcx = 0.5 * (lox + hix)
    pcy = 0.5 * (loy + hiy)
    pcz = 0.5 * (loz + hiz)
    dx, dy, dz = pcx - px, pcy - py, pcz - pz
    d2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12)
    ex, ey, ez = hix - lox, hiy - loy, hiz - loz
    r2 = 0.25 * (ex * ex + ey * ey + ez * ez)
    d2c = jnp.maximum(d2, 0.5 * r2)
    inv_d = jax.lax.rsqrt(d2)
    wx, wy, wz = dx * inv_d, dy * inv_d, dz * inv_d   # p -> light center

    # theta_w: angle between light axis and direction toward p
    cos_w = -(ax * wx + ay * wy + az * wz)
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
    imp = phi * jnp.where(cos_p > COS_E, cos_p, 0.0) / d2c

    # incident-angle factor: cos(max(theta_i - theta_b, 0))
    cos_i = jnp.abs(wx * nx + wy * ny + wz * nz)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    cos_ip = _cos_sub_clamped(sin_i, cos_i, sin_b, cos_b)
    return jnp.maximum(imp * cos_ip, 0.0)


def node_importance(nodes, idx, p, n):
    """Importance of standalone node rows [N,12] at indices idx (kept for
    refit/diagnostic tests; the samplers use the pair-row fast path)."""
    row = jnp.pad(nodes[idx], ((0, 0), (0, 14)))
    return _importance_cols(row, 0, p[..., 0], p[..., 1], p[..., 2],
                            n[..., 0], n[..., 1], n[..., 2])


def _link(row, col):
    return jax.lax.bitcast_convert_type(row[:, col], jnp.int32)


def sample_light_tree(pairs, prim, p, n, u):
    """Descend the pair-row tree: returns (light_idx [R] i32, pmf [R],
    u' [R]). u is one uniform per lane, progressively rescaled at every
    branch (the reference does the same: SampleLightBVH
    CommonData.cginc:1126)."""
    R = p.shape[0]
    Ni = pairs.shape[0]
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    if Ni == 0:         # single-leaf tree
        return (prim[jnp.zeros((R,), jnp.int32)],
                jnp.ones((R,), jnp.float32), u)

    def body(st):
        row, pmf, u, first, done, k = st
        il = _importance_cols(row, 0, px, py, pz, nx, ny, nz)
        ir = _importance_cols(row, 12, px, py, pz, nx, ny, nz)
        tot = il + ir
        ql = jnp.where(tot > 0.0, il / jnp.maximum(tot, 1e-20), 0.5)
        go_left = u < ql
        u_new = jnp.where(go_left, u / jnp.maximum(ql, 1e-9),
                          (u - ql) / jnp.maximum(1.0 - ql, 1e-9))
        u_new = jnp.clip(u_new, 0.0, 1.0 - 1e-7)
        q = jnp.where(go_left, ql, 1.0 - ql)
        link = jnp.where(go_left, _link(row, 24), _link(row, 25))
        act = ~done
        pmf = jnp.where(act, pmf * jnp.maximum(q, 1e-12), pmf)
        u = jnp.where(act, u_new, u)
        hit_leaf = act & (link < 0)
        first = jnp.where(hit_leaf, -(link + 1), first)
        done = done | hit_leaf
        nxt = jnp.clip(jnp.where(act & ~hit_leaf, link, 0), 0, Ni - 1)
        row = jnp.where(done[:, None], row, pairs[nxt])
        return row, pmf, u, first, done, k + 1

    row0 = jnp.broadcast_to(pairs[0], (R, 26))
    st = (row0, jnp.ones((R,), jnp.float32), u,
          jnp.zeros((R,), jnp.int32), jnp.zeros((R,), bool), jnp.int32(0))
    st = jax.lax.while_loop(
        lambda s: ~jnp.all(s[4]) & (s[5] < MAX_DEPTH), body, st)
    _, pmf, u, first, _, _ = st
    return prim[first], pmf, u


def _importance_dense(cut, px, py, pz, nx, ny, nz,
                      dtype=jnp.float32):
    """PBRT-4 importance of every cut node for every lane: [M,R] from
    cut [M,12] and [R] point/normal columns. No gathers — pure broadcast
    VPU work (the whole point of the cut: the per-step dependent gathers
    of the descent are latency-bound, ~190 ms/frame measured).

    Layout note: [M,R] puts the ray batch on the TPU lane dimension
    (R >> 128) and the cut on sublanes; the transposed [R,M] would pad
    M (~40-128) up to 128 lanes and waste up to 3x VPU width.

    dtype: bfloat16 halves the [M,R] intermediate traffic (the dense
    select is bandwidth-bound — ~0.27 ms/row/bounce at 262k lanes,
    round-4 probe). Callers that need the selection pmf must derive it
    from CDF DIFFERENCES of these values (see _cut_select) so the
    reported pmf equals the actual sampling distribution exactly in any
    precision."""
    cut = cut.astype(dtype)
    c = lambda k: cut[:, k][:, None]
    px, py, pz = (px.astype(dtype)[None, :], py.astype(dtype)[None, :],
                  pz.astype(dtype)[None, :])
    nx, ny, nz = (nx.astype(dtype)[None, :], ny.astype(dtype)[None, :],
                  nz.astype(dtype)[None, :])
    lox, loy, loz = c(0), c(1), c(2)
    hix, hiy, hiz = c(3), c(4), c(5)
    ax, ay, az = c(6), c(7), c(8)
    cos_o = c(9)
    phi = c(11)

    dx = 0.5 * (lox + hix) - px
    dy = 0.5 * (loy + hiy) - py
    dz = 0.5 * (loz + hiz) - pz
    d2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12)
    ex, ey, ez = hix - lox, hiy - loy, hiz - loz
    r2 = 0.25 * (ex * ex + ey * ey + ez * ez)
    d2c = jnp.maximum(d2, 0.5 * r2)
    inv_d = jax.lax.rsqrt(d2)
    wx, wy, wz = dx * inv_d, dy * inv_d, dz * inv_d

    cos_w = -(ax * wx + ay * wy + az * wz)
    sin_w = jnp.sqrt(jnp.maximum(1.0 - cos_w * cos_w, 0.0))
    sin2_b = jnp.clip(r2 / d2, 0.0, 1.0)
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin2_b, 0.0))
    sin_b = jnp.sqrt(sin2_b)
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))

    cos_x = _cos_sub_clamped(sin_w, cos_w, sin_o, cos_o)
    sin_x = _sin_sub_clamped(sin_w, cos_w, sin_o, cos_o)
    cos_p = _cos_sub_clamped(sin_x, cos_x, sin_b, cos_b)
    imp = phi * jnp.where(cos_p > COS_E, cos_p, 0.0) / d2c

    cos_i = jnp.abs(wx * nx + wy * ny + wz * nz)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    cos_ip = _cos_sub_clamped(sin_i, cos_i, sin_b, cos_b)
    return jnp.maximum(imp * cos_ip, 0.0)


def _cut_select(cut_bounds, p, n, u, dtype=jnp.float32):
    """Categorical pick over the cut: returns (pick [R] i32, p_cut [R],
    u' [R] rescaled within the bin).

    The pmf is derived from CDF DIFFERENCES (not the raw importance), so
    p_cut equals the realized sampling distribution bit-exactly even
    when `dtype` is bfloat16 and the cumsum rounds."""
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    imp = _importance_dense(cut_bounds, px, py, pz, nx, ny, nz,
                            dtype=dtype)                       # [M,R]
    M = imp.shape[0]
    cdf = jnp.cumsum(imp.astype(jnp.float32), axis=0)
    tot = cdf[-1]
    # all-zero importance (point outside every cone): uniform fallback
    zero = tot <= 0.0
    ramp = jnp.arange(1, M + 1, dtype=jnp.float32)[:, None]
    cdf = jnp.where(zero[None, :], jnp.broadcast_to(ramp, cdf.shape), cdf)
    tot = jnp.where(zero, jnp.float32(M), tot)
    x = u * tot
    pick = jnp.clip(jnp.sum((cdf <= x[None, :]).astype(jnp.int32), axis=0),
                    0, M - 1)
    chi = jnp.take_along_axis(cdf, pick[None, :], axis=0)[0]
    prev = jnp.where(
        pick > 0,
        jnp.take_along_axis(cdf, jnp.maximum(pick - 1, 0)[None, :],
                            axis=0)[0], 0.0)
    width = jnp.maximum(chi - prev, 0.0)
    u2 = jnp.clip((x - prev) / jnp.maximum(width, 1e-20),
                  0.0, 1.0 - 1e-7)
    p_cut = width / tot
    return pick, p_cut, u2


def sample_light_tree_cut(pairs, prim, cut_bounds, cut_link, p, n, u,
                          select_dtype=jnp.float32):
    """Cut-based light selection: dense categorical over the cut, then a
    residual descent below the chosen cut node (zero iterations when the
    cut is the leaf set). Same contract as sample_light_tree.

    select_dtype=bfloat16 halves the dense select's bandwidth; the
    returned pmf still matches the sampling distribution exactly
    (cdf-difference form). Use ONLY with approx MIS — the exact-MIS
    light_tree_pdf_cut recomputes importance in f32 and would drift."""
    R = p.shape[0]
    Ni = pairs.shape[0]
    pick, p_cut, u = _cut_select(cut_bounds, p, n, u, dtype=select_dtype)
    link = cut_link[pick]
    leaf_now = link < 0
    first = jnp.where(leaf_now, -(link + 1), 0)
    if Ni == 0:
        return prim[first], p_cut, u

    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]

    def body(st):
        row, pmf, u, first, done, k = st
        il = _importance_cols(row, 0, px, py, pz, nx, ny, nz)
        ir = _importance_cols(row, 12, px, py, pz, nx, ny, nz)
        tot = il + ir
        ql = jnp.where(tot > 0.0, il / jnp.maximum(tot, 1e-20), 0.5)
        go_left = u < ql
        u_new = jnp.where(go_left, u / jnp.maximum(ql, 1e-9),
                          (u - ql) / jnp.maximum(1.0 - ql, 1e-9))
        u_new = jnp.clip(u_new, 0.0, 1.0 - 1e-7)
        q = jnp.where(go_left, ql, 1.0 - ql)
        link = jnp.where(go_left, _link(row, 24), _link(row, 25))
        act = ~done
        pmf = jnp.where(act, pmf * jnp.maximum(q, 1e-12), pmf)
        u = jnp.where(act, u_new, u)
        hit_leaf = act & (link < 0)
        first = jnp.where(hit_leaf, -(link + 1), first)
        done = done | hit_leaf
        nxt = jnp.clip(jnp.where(act & ~hit_leaf, link, 0), 0, Ni - 1)
        row = jnp.where(done[:, None], row, pairs[nxt])
        return row, pmf, u, first, done, k + 1

    row0 = pairs[jnp.clip(jnp.where(leaf_now, 0, link), 0, Ni - 1)]
    st = (row0, p_cut, u, first, leaf_now, jnp.int32(0))
    st = jax.lax.while_loop(
        lambda s: ~jnp.all(s[4]) & (s[5] < MAX_DEPTH), body, st)
    _, pmf, u, first, _, _ = st
    return prim[first], pmf, u


def light_tree_pdf_cut(pairs, trail, cut_bounds, cut_link, cut_of_light,
                       cut_skip, light_idx, p, n):
    """pmf sample_light_tree_cut assigns to `light_idx` from p: the dense
    cut probability times the below-cut trail descent (trail bits above
    the cut — the first cut_skip bits — were consumed by the dense pick)."""
    R = p.shape[0]
    Ni = pairs.shape[0]
    li = jnp.maximum(light_idx, 0)
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    imp = _importance_dense(cut_bounds, px, py, pz, nx, ny, nz)  # [M,R]
    M = imp.shape[0]
    tot = jnp.sum(imp, axis=0)
    imp = jnp.where((tot > 0.0)[None, :], imp, 1.0)
    tot = jnp.where(tot > 0.0, tot, jnp.float32(M))
    entry = cut_of_light[li]
    p_cut = jnp.take_along_axis(imp, entry[None, :], axis=0)[0] / tot
    link = cut_link[entry]
    if Ni == 0:
        return jnp.where(light_idx >= 0, p_cut, 0.0)
    bits = trail[li]
    k0 = cut_skip[li]

    def body(st):
        row, pmf, done, k = st
        il = _importance_cols(row, 0, px, py, pz, nx, ny, nz)
        ir = _importance_cols(row, 12, px, py, pz, nx, ny, nz)
        tot = il + ir
        ql = jnp.where(tot > 0.0, il / jnp.maximum(tot, 1e-20), 0.5)
        sh = jnp.minimum(k0 + k, 31).astype(jnp.uint32)
        go_right = ((bits >> sh) & jnp.uint32(1)) == 1
        q = jnp.where(go_right, 1.0 - ql, ql)
        lnk = jnp.where(go_right, _link(row, 25), _link(row, 24))
        act = ~done
        pmf = jnp.where(act, pmf * jnp.maximum(q, 1e-12), pmf)
        done = done | (act & (lnk < 0))
        nxt = jnp.clip(jnp.where(lnk >= 0, lnk, 0), 0, Ni - 1)
        row = jnp.where(done[:, None], row, pairs[nxt])
        return row, pmf, done, k + 1

    leaf_now = link < 0
    row0 = pairs[jnp.clip(jnp.where(leaf_now, 0, link), 0, Ni - 1)]
    st = (row0, p_cut, leaf_now, jnp.int32(0))
    st = jax.lax.while_loop(
        lambda s: ~jnp.all(s[2]) & (s[3] < MAX_DEPTH), body, st)
    return jnp.where(light_idx >= 0, st[1], 0.0)


def light_tree_pdf(pairs, trail, light_idx, p, n):
    """pmf the descent assigns to `light_idx` from point p — O(depth),
    following the stored root->leaf bit trail (reference CalcLightPDF,
    CommonData.cginc:1057)."""
    R = p.shape[0]
    Ni = pairs.shape[0]
    if Ni == 0:
        return jnp.where(light_idx >= 0, 1.0, 0.0)
    bits = trail[jnp.maximum(light_idx, 0)]
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]

    def body(st):
        row, pmf, done, k = st
        il = _importance_cols(row, 0, px, py, pz, nx, ny, nz)
        ir = _importance_cols(row, 12, px, py, pz, nx, ny, nz)
        tot = il + ir
        ql = jnp.where(tot > 0.0, il / jnp.maximum(tot, 1e-20), 0.5)
        go_right = ((bits >> k.astype(jnp.uint32)) & jnp.uint32(1)) == 1
        q = jnp.where(go_right, 1.0 - ql, ql)
        link = jnp.where(go_right, _link(row, 25), _link(row, 24))
        act = ~done
        pmf = jnp.where(act, pmf * jnp.maximum(q, 1e-12), pmf)
        done = done | (act & (link < 0))
        nxt = jnp.clip(jnp.where(link >= 0, link, 0), 0, Ni - 1)
        row = jnp.where(done[:, None], row, pairs[nxt])
        return row, pmf, done, k + 1

    row0 = jnp.broadcast_to(pairs[0], (R, 26))
    st = (row0, jnp.ones((R,), jnp.float32), jnp.zeros((R,), bool),
          jnp.int32(0))
    st = jax.lax.while_loop(
        lambda s: ~jnp.all(s[2]) & (s[3] < MAX_DEPTH), body, st)
    return jnp.where(light_idx >= 0, st[1], 0.0)
