"""Interleaved two-level (TLAS -> BLAS) CWBVH wavefront traversal.

Counterpart of the reference's two-level kernel_trace
(IntersectionKernels.compute:155-252): the TLAS is itself a CWBVH whose
leaves are *instances*; hitting one transforms the ray into instance-local
space by W2L (:212-214), pushes the TLAS state, and continues inside that
instance's BLAS; when the BLAS part exhausts, the ray pops back to world
space. This replaces scene/instances.py's per-instance loop (exact but
O(#instances)) with a single O(log) descent — the upgrade flagged there.

Reuses the single-level machinery (kernels/cwbvh_wavefront.py: 3-word
hits-mask groups, shift-register stacks, one unified-table gather per
iteration). Additions:

* The unified table gets a THIRD section: instance rows [I, 30] holding
  W2L (12 floats), the instance's BLAS root node id, and a pad. TLAS leaf
  slots address instance rows exactly like BLAS leaf slots address
  triangle rows, so `bleaf` needs no new semantics.
* Per-ray two-level state: saved world ray (ro/rd/inv/oct), a local->world
  t scale (|W2L . rd| — supports non-uniform instance scale), and `ret_sp`
  = the stack height at instance entry. After a pop, `sp < ret_sp` means
  the BLAS is exhausted: restore the world ray. Nesting depth is 2 (TLAS
  -> BLAS), like the reference.
* `t_best` is kept in WORLD units; inside a BLAS the comparisons use
  t_best * scale (slab + Moller read it through the same state).

Build: `pack_instance_rows` makes the instance rows from an
InstancedScene-style table; the TLAS CWBVH is built over instance world
AABBs by build/bvh2+cwbvh with each instance as one "triangle" (leaf
slots hold instance ids via slot_tri_base).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.kernels.cwbvh_wavefront import (
    LEAF_MASK, MAX_STACK, PTR_MASK, ROW_W, U32, _decode_rows_to_group,
    _extract_slot, _k_of, _shift_pop, _shift_push, expand_nodes)
from truetrace_tpu.kernels.traverse_ref import Hit


def pack_instance_rows(w2l: np.ndarray, node_offset: np.ndarray,
                       inst_id: np.ndarray,
                       width: int = ROW_W) -> np.ndarray:
    """[I,width] f32 rows: W2L as 12 floats (3 rotation rows +
    translation, scene/instances.py `_mat34` layout), BLAS root node id
    (bitcast i32 at col 12), original instance id (col 13 — rows are
    stored in TLAS leaf order). Host-side. `width` matches the BLAS
    leaf-row width (10K for fat leaf_k builds)."""
    I = w2l.shape[0]
    rows = np.zeros((I, width), np.float32)
    rows[:, 0:12] = w2l.reshape(I, 12)
    rows.view(np.int32)[:, 12] = node_offset.astype(np.int32)
    rows.view(np.int32)[:, 13] = inst_id.astype(np.int32)
    return rows


def _xform(cols, px, py, pz, translate: bool):
    """Apply the gathered 3x4 W2L ([R] column tuples) to a point/dir."""
    ox = cols[0] * px + cols[1] * py + cols[2] * pz
    oy = cols[4] * px + cols[5] * py + cols[6] * pz
    oz = cols[8] * px + cols[9] * py + cols[10] * pz
    if translate:
        ox = ox + cols[3]
        oy = oy + cols[7]
        oz = oz + cols[11]
    return ox, oy, oz


def _ray_derived(rd):
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                          jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    oct_key = ((rd[:, 0] < 0).astype(U32)
               | ((rd[:, 1] < 0).astype(U32) << 1)
               | ((rd[:, 2] < 0).astype(U32) << 2))
    return inv, oct_key


def _init_state(unified, ro, rd, t_max, tlas_root, max_stack):
    R = ro.shape[0]
    inv, oct_key = _ray_derived(rd)
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)
                              ).astype(jnp.float32)
    root_ids = jnp.broadcast_to(jnp.asarray(tlas_root, jnp.int32), (R,))
    hits, chim, bleaf = _decode_rows_to_group(
        unified[root_ids], ro, rd, inv, t_best)
    zero_u = jnp.zeros((max_stack, R), U32)   # plane-major (see
    # cwbvh_wavefront._init_state: minor-dim tiles pad to 128)
    return dict(
        ro=ro, rd=rd, inv=inv, oct=oct_key,
        ro_w=ro, rd_w=rd,                      # saved world ray
        scale=jnp.ones((R,), jnp.float32),     # local t per world t
        ret_sp=jnp.full((R,), -1, jnp.int32),  # stack height at entry
        hits=hits, chim=chim, bleaf=bleaf,
        phits=zero_u, pchim=zero_u, pbleaf=zero_u,
        sp=jnp.zeros((R,), jnp.int32),
        t=t_best, tri=jnp.full((R,), -1, jnp.int32),
        inst=jnp.full((R,), -1, jnp.int32),
        inst_cur=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32), v=jnp.zeros((R,), jnp.float32),
        orig=jnp.arange(R, dtype=jnp.int32),
    )


def _active(st):
    return (st["hits"] != 0) | (st["sp"] > 0)


def _step(unified, C, L, I, any_hit, st):
    """One iteration. Table layout: rows [0,C) nodes (TLAS + BLAS
    aggregate), [C, C+L) BLAS leaf rows, [C+L, C+L+I) instance rows."""
    ro, rd, inv_rd, oct_key = st["ro"], st["rd"], st["inv"], st["oct"]
    hits, chim, bleaf, sp = st["hits"], st["chim"], st["bleaf"], st["sp"]
    t_best, tri_best, u_best, v_best = st["t"], st["tri"], st["u"], st["v"]
    scale, ret_sp = st["scale"], st["ret_sp"]
    in_blas = ret_sp >= 0

    # ---- 1. pop; leaving the instance when the stack drops below ret_sp
    pop = (hits == 0) & (sp > 0)
    hits = jnp.where(pop, st["phits"][0], hits)
    chim = jnp.where(pop, st["pchim"][0], chim)
    bleaf = jnp.where(pop, st["pbleaf"][0], bleaf)
    sp = sp - pop.astype(jnp.int32)
    leave = pop & in_blas & (sp < ret_sp)
    ro = jnp.where(leave[:, None], st["ro_w"], ro)
    rd = jnp.where(leave[:, None], st["rd_w"], rd)
    inv_w, oct_w = _ray_derived(st["rd_w"])
    inv_rd = jnp.where(leave[:, None], inv_w, inv_rd)
    oct_key = jnp.where(leave, oct_w, oct_key)
    scale = jnp.where(leave, 1.0, scale)
    ret_sp = jnp.where(leave, -1, ret_sp)
    in_blas = ret_sp >= 0
    inst_cur = jnp.where(leave, -1, st["inst_cur"])

    # ---- 2. choose work
    leaf_bits = hits & LEAF_MASK
    node_bits = hits >> 24
    active = hits != 0
    leaf_lane = active & (leaf_bits != 0)
    descend = active & ~leaf_lane
    # TLAS leaf slots are instance entries; BLAS leaf slots are triangles
    enter_lane = leaf_lane & ~in_blas
    tri_lane = leaf_lane & in_blas

    lsb = leaf_bits & (~leaf_bits + U32(1))
    leafmask = bleaf >> 24
    lrank = jax.lax.population_count(leafmask & (lsb - U32(1))
                                     ).astype(jnp.int32)
    lbase = (bleaf & PTR_MASK).astype(jnp.int32) + lrank
    lrow = jnp.clip(lbase, 0, max(L - 1, 0))
    irow = jnp.clip(lbase, 0, I - 1)

    slot, node_rest = _extract_slot(node_bits, oct_key)
    imask = chim >> 24
    below = imask & ((U32(1) << slot.astype(U32)) - U32(1))
    rank = jax.lax.population_count(below).astype(jnp.int32)
    child = jnp.clip((chim & PTR_MASK).astype(jnp.int32) + rank, 0, C - 1)

    # ---- 3. THE gather (one row per lane: node / leaf / instance)
    row_idx = jnp.where(tri_lane, C + lrow,
                        jnp.where(enter_lane, C + L + irow,
                                  jnp.where(descend, child, 0)))
    row = unified[row_idx]                              # [R,10K] u32
    K = _k_of(unified.shape[1])

    # ---- 3a. triangle lanes: <=K scalarized Moller tests in local space
    # (t compared against t_best * scale)
    tripf = jax.lax.bitcast_convert_type(row, jnp.float32)
    tcol = lambda k: tripf[:, k]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    inst_hit = st["inst"]
    t_loc = t_best * scale
    for j in range(K):
        b = 9 * j
        p0x, p0y, p0z = tcol(b), tcol(b + 1), tcol(b + 2)
        e1x, e1y, e1z = tcol(b + 3), tcol(b + 4), tcol(b + 5)
        e2x, e2y, e2z = tcol(b + 6), tcol(b + 7), tcol(b + 8)
        tri_id = jax.lax.bitcast_convert_type(row[:, 9 * K + j],
                                              jnp.int32)
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvx, tvy, tvz = rox - p0x, roy - p0y, roz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
        th = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = (tri_lane & (tri_id >= 0) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (th > 1e-4) & (th < t_loc)
              & (jnp.abs(det) > 1e-12))
        t_w = th / jnp.maximum(scale, 1e-20)
        t_loc = jnp.where(ok, th, t_loc)
        t_best = jnp.where(ok, t_w, t_best)
        tri_best = jnp.where(ok, tri_id, tri_best)
        inst_hit = jnp.where(ok, inst_cur, inst_hit)
        u_best = jnp.where(ok, u, u_best)
        v_best = jnp.where(ok, v, v_best)
    hits_after_leaf = hits & ~lsb

    # ---- 3b. instance-entry lanes: transform the ray, push the TLAS
    # remainder, and descend into the BLAS root (the gathered instance row
    # is consumed here; the BLAS root node is fetched NEXT iteration by a
    # plain descend on the swapped-in group)
    icolf = [tripf[:, k] for k in range(12)]
    blas_root = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
    row_inst_id = jax.lax.bitcast_convert_type(row[:, 13], jnp.int32)
    lox, loy, loz = _xform(icolf, rox, roy, roz, True)
    ldx, ldy, ldz = _xform(icolf, rdx, rdy, rdz, False)
    lscale = jnp.sqrt(jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz,
                                  1e-20))
    ldx, ldy, ldz = ldx / lscale, ldy / lscale, ldz / lscale
    ro_l = jnp.stack([lox, loy, loz], axis=-1)
    rd_l = jnp.stack([ldx, ldy, ldz], axis=-1)

    # ---- stack update. Push rules:
    #   descend lanes: push node remainder if non-empty (as before)
    #   enter lanes:   push the TLAS remainder (leaf bit cleared) if
    #                  non-empty, and record ret_sp
    rest_desc = node_rest << 24
    rest_enter = hits_after_leaf
    push_desc = descend & (node_rest != 0)
    push_enter = enter_lane & (rest_enter != 0)
    push = push_desc | push_enter
    saved_hits = jnp.where(enter_lane, rest_enter, rest_desc)
    for key, saved in (("phits", saved_hits), ("pchim", chim),
                       ("pbleaf", bleaf)):
        plane = st[key]
        based = jnp.where(pop[None, :], _shift_pop(plane), plane)
        pushed = _shift_push(based, saved.astype(plane.dtype))
        st[key] = jnp.where(push[None, :], pushed, based)
    sp = sp + push.astype(jnp.int32)

    # enter: swap in the local ray + mark return height
    ro = jnp.where(enter_lane[:, None], ro_l, ro)
    rd = jnp.where(enter_lane[:, None], rd_l, rd)
    inv_l, oct_l = _ray_derived(rd_l)
    inv_rd = jnp.where(enter_lane[:, None], inv_l, inv_rd)
    oct_key = jnp.where(enter_lane, oct_l, oct_key)
    scale = jnp.where(enter_lane, lscale, scale)
    ret_sp = jnp.where(enter_lane, sp, ret_sp)
    inst_cur = jnp.where(enter_lane, row_inst_id, inst_cur)

    # decode the fetched row as a node for descend lanes; enter lanes get
    # a synthetic single-node group pointing at their BLAS root
    c_hits, c_chim, c_bleaf = _decode_rows_to_group(
        row, ro, rd, inv_rd, t_best * scale)
    enter_hits = U32(1) << 24                    # one internal slot: slot 0
    enter_chim = (blas_root.astype(U32) & PTR_MASK) | (U32(1) << 24)
    hits = jnp.where(descend, c_hits,
                     jnp.where(enter_lane, enter_hits,
                               jnp.where(tri_lane, hits_after_leaf, hits)))
    chim = jnp.where(descend, c_chim,
                     jnp.where(enter_lane, enter_chim, chim))
    bleaf = jnp.where(descend, c_bleaf,
                      jnp.where(enter_lane, U32(0), bleaf))

    if any_hit:
        found = tri_best >= 0
        hits = jnp.where(found, U32(0), hits)
        sp = jnp.where(found, 0, sp)

    return dict(st, ro=ro, rd=rd, inv=inv_rd, oct=oct_key, scale=scale,
                ret_sp=ret_sp, inst_cur=inst_cur, inst=inst_hit,
                hits=hits, chim=chim, bleaf=bleaf, sp=sp,
                t=t_best, tri=tri_best, u=u_best, v=v_best)


def _step_transmit(unified, tint, C, L, I, st):
    """Transmittance variant of _step (reference shadow any-hit through
    instanced cutout/stained glass, IntersectionKernels.compute:264-498 +
    CommonData.cginc:593-634): every triangle crossed before t_max
    multiplies the lane's RGB throughput by its shadow tint (tint [T,3]
    indexed by GLOBAL tri id — instances share their source BLAS rows);
    t is never shortened, lanes retire at ~zero throughput."""
    ro, rd, inv_rd, oct_key = st["ro"], st["rd"], st["inv"], st["oct"]
    hits, chim, bleaf, sp = st["hits"], st["chim"], st["bleaf"], st["sp"]
    t_best = st["t"]
    tpr, tpg, tpb = st["tpr"], st["tpg"], st["tpb"]
    scale, ret_sp = st["scale"], st["ret_sp"]
    in_blas = ret_sp >= 0
    T = tint.shape[0]

    pop = (hits == 0) & (sp > 0)
    hits = jnp.where(pop, st["phits"][0], hits)
    chim = jnp.where(pop, st["pchim"][0], chim)
    bleaf = jnp.where(pop, st["pbleaf"][0], bleaf)
    sp = sp - pop.astype(jnp.int32)
    leave = pop & in_blas & (sp < ret_sp)
    ro = jnp.where(leave[:, None], st["ro_w"], ro)
    rd = jnp.where(leave[:, None], st["rd_w"], rd)
    inv_w, oct_w = _ray_derived(st["rd_w"])
    inv_rd = jnp.where(leave[:, None], inv_w, inv_rd)
    oct_key = jnp.where(leave, oct_w, oct_key)
    scale = jnp.where(leave, 1.0, scale)
    ret_sp = jnp.where(leave, -1, ret_sp)
    in_blas = ret_sp >= 0

    leaf_bits = hits & LEAF_MASK
    node_bits = hits >> 24
    active = hits != 0
    leaf_lane = active & (leaf_bits != 0)
    descend = active & ~leaf_lane
    enter_lane = leaf_lane & ~in_blas
    tri_lane = leaf_lane & in_blas

    lsb = leaf_bits & (~leaf_bits + U32(1))
    leafmask = bleaf >> 24
    lrank = jax.lax.population_count(leafmask & (lsb - U32(1))
                                     ).astype(jnp.int32)
    lbase = (bleaf & PTR_MASK).astype(jnp.int32) + lrank
    lrow = jnp.clip(lbase, 0, max(L - 1, 0))
    irow = jnp.clip(lbase, 0, I - 1)

    slot, node_rest = _extract_slot(node_bits, oct_key)
    imask = chim >> 24
    below = imask & ((U32(1) << slot.astype(U32)) - U32(1))
    rank = jax.lax.population_count(below).astype(jnp.int32)
    child = jnp.clip((chim & PTR_MASK).astype(jnp.int32) + rank, 0, C - 1)

    row_idx = jnp.where(tri_lane, C + lrow,
                        jnp.where(enter_lane, C + L + irow,
                                  jnp.where(descend, child, 0)))
    row = unified[row_idx]

    tripf = jax.lax.bitcast_convert_type(row, jnp.float32)
    tcol = lambda k: tripf[:, k]
    K = _k_of(unified.shape[1])
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    t_loc = t_best * scale
    for j in range(K):
        b = 9 * j
        p0x, p0y, p0z = tcol(b), tcol(b + 1), tcol(b + 2)
        e1x, e1y, e1z = tcol(b + 3), tcol(b + 4), tcol(b + 5)
        e2x, e2y, e2z = tcol(b + 6), tcol(b + 7), tcol(b + 8)
        tri_id = jax.lax.bitcast_convert_type(row[:, 9 * K + j],
                                              jnp.int32)
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvx, tvy, tvz = rox - p0x, roy - p0y, roz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
        th = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = (tri_lane & (tri_id >= 0) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (th > 1e-4) & (th < t_loc)
              & (jnp.abs(det) > 1e-12))
        trow = tint[jnp.clip(tri_id, 0, T - 1)]
        tpr = jnp.where(ok, tpr * trow[:, 0], tpr)
        tpg = jnp.where(ok, tpg * trow[:, 1], tpg)
        tpb = jnp.where(ok, tpb * trow[:, 2], tpb)
    hits_after_leaf = hits & ~lsb

    icolf = [tripf[:, k] for k in range(12)]
    blas_root = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
    lox, loy, loz = _xform(icolf, rox, roy, roz, True)
    ldx, ldy, ldz = _xform(icolf, rdx, rdy, rdz, False)
    lscale = jnp.sqrt(jnp.maximum(ldx * ldx + ldy * ldy + ldz * ldz,
                                  1e-20))
    ldx, ldy, ldz = ldx / lscale, ldy / lscale, ldz / lscale
    ro_l = jnp.stack([lox, loy, loz], axis=-1)
    rd_l = jnp.stack([ldx, ldy, ldz], axis=-1)

    rest_desc = node_rest << 24
    rest_enter = hits_after_leaf
    push_desc = descend & (node_rest != 0)
    push_enter = enter_lane & (rest_enter != 0)
    push = push_desc | push_enter
    saved_hits = jnp.where(enter_lane, rest_enter, rest_desc)
    for key, saved in (("phits", saved_hits), ("pchim", chim),
                       ("pbleaf", bleaf)):
        plane = st[key]
        based = jnp.where(pop[None, :], _shift_pop(plane), plane)
        pushed = _shift_push(based, saved.astype(plane.dtype))
        st[key] = jnp.where(push[None, :], pushed, based)
    sp = sp + push.astype(jnp.int32)

    ro = jnp.where(enter_lane[:, None], ro_l, ro)
    rd = jnp.where(enter_lane[:, None], rd_l, rd)
    inv_l, oct_l = _ray_derived(rd_l)
    inv_rd = jnp.where(enter_lane[:, None], inv_l, inv_rd)
    oct_key = jnp.where(enter_lane, oct_l, oct_key)
    scale = jnp.where(enter_lane, lscale, scale)
    ret_sp = jnp.where(enter_lane, sp, ret_sp)

    c_hits, c_chim, c_bleaf = _decode_rows_to_group(
        row, ro, rd, inv_rd, t_best * scale)
    enter_hits = U32(1) << 24
    enter_chim = (blas_root.astype(U32) & PTR_MASK) | (U32(1) << 24)
    hits = jnp.where(descend, c_hits,
                     jnp.where(enter_lane, enter_hits,
                               jnp.where(tri_lane, hits_after_leaf, hits)))
    chim = jnp.where(descend, c_chim,
                     jnp.where(enter_lane, enter_chim, chim))
    bleaf = jnp.where(descend, c_bleaf,
                      jnp.where(enter_lane, U32(0), bleaf))

    opaque = jnp.maximum(jnp.maximum(tpr, tpg), tpb) < 1e-3
    hits = jnp.where(opaque, U32(0), hits)
    sp = jnp.where(opaque, 0, sp)

    return dict(st, ro=ro, rd=rd, inv=inv_rd, oct=oct_key, scale=scale,
                ret_sp=ret_sp, hits=hits, chim=chim, bleaf=bleaf, sp=sp,
                tpr=tpr, tpg=tpg, tpb=tpb)


@partial(jax.jit, static_argnames=("max_stack",))
def transmit_tlas(nodes, leaf_rows, inst_rows, tint, ro, rd, t_max,
                  tlas_root=0, max_stack: int = MAX_STACK):
    """Shadow transmittance [R,3] through the two-level structure:
    product of per-triangle shadow tints of every surface crossed before
    t_max (1 = clear, 0 = blocked). Deletes the old binary-occlusion
    fallback for instanced scenes (pathtrace._transmission)."""
    C, L, I = nodes.shape[0], leaf_rows.shape[0], inst_rows.shape[0]
    exp = expand_nodes(nodes)
    W = leaf_rows.shape[1]
    unified = jnp.concatenate(
        [jnp.pad(exp, ((0, 0), (0, W - exp.shape[1]))),
         jax.lax.bitcast_convert_type(leaf_rows, jnp.uint32),
         jax.lax.bitcast_convert_type(inst_rows, jnp.uint32)], axis=0)
    st = _init_state(unified, ro, rd, t_max, tlas_root, max_stack)
    R = ro.shape[0]
    st = dict(st, tpr=jnp.ones((R,), jnp.float32),
              tpg=jnp.ones((R,), jnp.float32),
              tpb=jnp.ones((R,), jnp.float32))

    def cond(c):
        s, it = c
        return jnp.any(_active(s)) & (it < _ITER_CAP)

    def body(c):
        s, it = c
        return _step_transmit(unified, tint, C, L, I, s), it + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    tp = jnp.stack([st["tpr"], st["tpg"], st["tpb"]], axis=-1)
    return jnp.where(jnp.maximum(jnp.maximum(st["tpr"], st["tpg"]),
                                 st["tpb"])[:, None] < 1e-3, 0.0, tp)


_ITER_CAP = 65536


def _traverse_tlas(nodes, leaf_rows, inst_rows, ro, rd, t_max,
                   any_hit: bool, tlas_root, max_stack: int):
    C, L, I = nodes.shape[0], leaf_rows.shape[0], inst_rows.shape[0]
    assert C < (1 << 24) and L < (1 << 24)
    exp = expand_nodes(nodes)
    W = leaf_rows.shape[1]
    unified = jnp.concatenate(
        [jnp.pad(exp, ((0, 0), (0, W - exp.shape[1]))),
         jax.lax.bitcast_convert_type(leaf_rows, jnp.uint32),
         jax.lax.bitcast_convert_type(inst_rows, jnp.uint32)], axis=0)
    st = _init_state(unified, ro, rd, t_max, tlas_root, max_stack)

    def cond(c):
        s, it = c
        return jnp.any(_active(s)) & (it < _ITER_CAP)

    def body(c):
        s, it = c
        return _step(unified, C, L, I, any_hit, s), it + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return Hit(t=st["t"], tri=st["tri"], u=st["u"], v=st["v"]), st["inst"]


@partial(jax.jit, static_argnames=("max_stack",))
def closest_hit_tlas(nodes, leaf_rows, inst_rows, ro, rd, t_max,
                     tlas_root=0, max_stack: int = MAX_STACK):
    """Two-level closest hit. Returns (Hit with global tri ids, instance
    id per ray [-1 = miss])."""
    return _traverse_tlas(nodes, leaf_rows, inst_rows, ro, rd, t_max,
                          False, tlas_root, max_stack)


@partial(jax.jit, static_argnames=("max_stack",))
def any_hit_tlas(nodes, leaf_rows, inst_rows, ro, rd, t_max,
                 tlas_root=0, max_stack: int = MAX_STACK):
    hit, _ = _traverse_tlas(nodes, leaf_rows, inst_rows, ro, rd, t_max,
                            True, tlas_root, max_stack)
    return hit.tri >= 0
