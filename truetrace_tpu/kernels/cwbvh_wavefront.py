"""Scatter-free CWBVH wavefront traversal — the TPU fast path.

The first-cut traversal (kernels/cwbvh_ref.py) used per-ray stack *scatters*
(`stack.at[ray, sp].set`), which XLA lowers to row-serialized scatter on TPU
(~30 M updates/s — measured). This version is designed around the two
operations the hardware actually does well:

* **gathers are the budget**: exactly ONE row-gather per loop iteration
  from a unified [C+T, 36] table — descending lanes fetch their child-node
  row, leaf lanes their 3-triangle "triple" row (mutually exclusive per
  lane). (XLA row-gather measured ~80-240 M rows/s on v5e; row width is
  free up to ~40 words, so node rows are padded to triple width.)
* **stacks never scatter**: the per-ray stack is a set of [R, S] planes
  whose top is always column 0; push = shift-right + write col 0, pop =
  shift-left — pure `where`/`concat` vector ops.  Push and pop are
  mutually exclusive per lane per iteration by construction.

Traversal scheme (one *child slot* processed per iteration, the reference's
bitmask-group idea — IntersectionKernels.compute:155-252 — recast for
lock-step SIMD):

  state: decoded current node (base_child, base_tri, meta, imask) +
         `mask` of not-yet-visited hit children + best-hit registers.
  each iteration:
    1. lanes with empty mask pop a full saved group from the stack planes.
    2. extract the next child slot in near-to-far octant order
       (argmin over set bits of slot^octant via XOR bit-swizzle + LSB).
    3. leaf slots gather their 3-triangle "triple" row and run masked
       Moller tests; internal slots gather + decode the child node, slab-
       test its 8 quantized boxes against the current t_best, and make it
       the new current group (saving the old group to the stack if it
       still has pending children).

The node layout contract is build/cwbvh.py's; triangle triples are built by
`pack_tri_triples` (row t = tris t, t+1, t+2 -> one gather covers a leaf).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.kernels.traverse_ref import Hit

U32 = jnp.uint32
MAX_STACK = 16        # one entry per tree level; CWBVH depth ~ log8(T)


def pack_tri_triples(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray
                     ) -> np.ndarray:
    """[T,12] packed tris -> [T,36] rows of (tri t, t+1, t+2) so one gather
    fetches a whole <=3-tri CWBVH leaf. Host-side (numpy)."""
    T = p0.shape[0]
    tri = np.concatenate([p0, e1, e2, np.zeros((T, 3), np.float32)],
                         axis=1).astype(np.float32)      # [T,12]
    i1 = np.minimum(np.arange(T) + 1, T - 1)
    i2 = np.minimum(np.arange(T) + 2, T - 1)
    return np.concatenate([tri, tri[i1], tri[i2]], axis=1)  # [T,36]


def pack_unified(nodes: np.ndarray, tri_triple: np.ndarray) -> np.ndarray:
    """One [C+T, 36] uint32 table holding node rows (padded 20->36 words)
    followed by triangle-triple rows (bitcast f32->u32).

    A traversal iteration needs EITHER a child-node row (descending lanes)
    OR a leaf-triple row (leaf lanes) — never both on the same lane — so a
    unified table turns the loop body's two gathers into one. Row gather
    cost is width-independent (measured), so the padding is free."""
    C = nodes.shape[0]
    out = np.zeros((C + tri_triple.shape[0], 36), np.uint32)
    out[:C, :20] = nodes
    out[C:] = tri_triple.view(np.uint32)
    return out


def _byte(w, k):
    return (w >> U32(8 * k)) & U32(0xFF)


def _xor_permute8(m, v):
    """Permute the bits of 8-bit mask m by position XOR v (vectorized)."""
    b = (v & U32(1)) > 0
    m = jnp.where(b, ((m & U32(0xAA)) >> 1) | ((m & U32(0x55)) << 1), m)
    b = (v & U32(2)) > 0
    m = jnp.where(b, ((m & U32(0xCC)) >> 2) | ((m & U32(0x33)) << 2), m)
    b = (v & U32(4)) > 0
    m = jnp.where(b, ((m & U32(0xF0)) >> 4) | ((m & U32(0x0F)) << 4), m)
    return m


def _extract_slot(mask, oct_key):
    """Next slot in near-to-far order: argmin over set bits of (slot ^
    oct_key). Returns (slot [R] int32, mask_without_slot)."""
    pm = _xor_permute8(mask, oct_key)
    lsb = pm & (~pm + U32(1))
    idx = jax.lax.population_count(lsb - U32(1)).astype(jnp.int32)
    slot = (idx ^ oct_key.astype(jnp.int32)) & 7
    return slot, mask & ~(U32(1) << slot.astype(U32))


class _Group(NamedTuple):
    mask: jnp.ndarray        # u32 pending child slots (already slab-culled)
    base_child: jnp.ndarray  # i32
    base_tri: jnp.ndarray    # i32
    meta0: jnp.ndarray       # u32 meta bytes 0..3
    meta1: jnp.ndarray       # u32 meta bytes 4..7
    imask: jnp.ndarray       # u32


def _decode_and_slab(nodes, idx, ro, rd, inv_rd, t_best):
    """Gather node rows, decode, slab-test the 8 children. Returns _Group
    (mask = hit children)."""
    w = nodes[idx]                                 # [R,20] u32  (gather B)
    return _decode_rows_and_slab(w, ro, rd, inv_rd, t_best)


def _decode_rows_and_slab(w, ro, rd, inv_rd, t_best):
    """Decode pre-gathered node rows [R,>=20] u32 + slab-test children.

    All byte fields come from ONE u8 bitcast view (little-endian word
    layout) instead of per-byte shift/mask chains — the decode is a large
    share of the per-iteration VPU work."""
    R = w.shape[0]
    b = jax.lax.bitcast_convert_type(w, jnp.uint8)     # [R,>=20,4]
    p = jax.lax.bitcast_convert_type(w[:, 0:3], jnp.float32)
    e_b = b[:, 3, 0:3].astype(U32)
    scale = jax.lax.bitcast_convert_type(e_b << 23, jnp.float32)
    imask = b[:, 3, 3].astype(U32)
    base_child = w[:, 4].astype(jnp.int32)
    base_tri = w[:, 5].astype(jnp.int32)
    meta0 = w[:, 6]
    meta1 = w[:, 7]
    meta8 = jnp.concatenate([b[:, 6, :], b[:, 7, :]], axis=1)   # [R,8] u8

    tn = jnp.full((R, 8), -jnp.inf)
    tf = jnp.full((R, 8), jnp.inf)
    for axis in range(3):
        qlo = jnp.concatenate([b[:, 8 + 2 * axis, :],
                               b[:, 9 + 2 * axis, :]],
                              axis=1).astype(jnp.float32)
        qhi = jnp.concatenate([b[:, 14 + 2 * axis, :],
                               b[:, 15 + 2 * axis, :]],
                              axis=1).astype(jnp.float32)
        lo = p[:, axis:axis + 1] + qlo * scale[:, axis:axis + 1]
        hi = p[:, axis:axis + 1] + qhi * scale[:, axis:axis + 1]
        t0 = (lo - ro[:, axis:axis + 1]) * inv_rd[:, axis:axis + 1]
        t1 = (hi - ro[:, axis:axis + 1]) * inv_rd[:, axis:axis + 1]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best[:, None]) \
        & (meta8 != 0)
    mask = jnp.sum(jnp.where(hit, U32(1) << jnp.arange(8, dtype=U32)[None, :],
                             U32(0)), axis=-1).astype(U32)
    return _Group(mask=mask, base_child=base_child, base_tri=base_tri,
                  meta0=meta0, meta1=meta1, imask=imask)


def _shift_pop(plane):
    return jnp.concatenate([plane[:, 1:], plane[:, :1] * 0], axis=1)


def _shift_push(plane, new_col):
    return jnp.concatenate([new_col[:, None], plane[:, :-1]], axis=1)


def _meta_at(meta0, meta1, slot):
    """meta byte for a dynamic slot [R]."""
    word = jnp.where(slot < 4, meta0, meta1)
    sh = (slot % 4).astype(U32) * U32(8)
    return (word >> sh) & U32(0xFF)


_GROUP_KEYS = ("gmask", "gbc", "gbt", "gm0", "gm1", "gim")
_PLANE_KEYS = ("pmask", "pbc", "pbt", "pm0", "pm1", "pim")


def _pack_table(nodes, tri_triple):
    """Device-side pack_unified (see module docstring)."""
    return jnp.concatenate(
        [jnp.pad(nodes, ((0, 0), (0, 16))),
         jax.lax.bitcast_convert_type(tri_triple, jnp.uint32)], axis=0)


def _init_state(nodes, ro, rd, t_max, root, max_stack):
    """Per-ray traversal state as a flat dict of [R,...] arrays, so the
    cascade can permute/compact it uniformly."""
    R = ro.shape[0]
    inv_rd = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                             jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    # near-octant key: bit k set where rd[k] < 0
    oct_key = ((rd[:, 0] < 0).astype(U32)
               | ((rd[:, 1] < 0).astype(U32) << 1)
               | ((rd[:, 2] < 0).astype(U32) << 2))
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)
                              ).astype(jnp.float32)
    # enter the root (an aggregated multi-BLAS buffer roots an instance's
    # subtree at its node_offset)
    root_ids = jnp.broadcast_to(jnp.asarray(root, jnp.int32), (R,))
    cur = _decode_and_slab(nodes, root_ids, ro, rd, inv_rd, t_best)
    zero_u = jnp.zeros((R, max_stack), U32)
    zero_i = jnp.zeros((R, max_stack), jnp.int32)
    return dict(
        ro=ro, rd=rd, inv=inv_rd, oct=oct_key,
        gmask=cur.mask, gbc=cur.base_child, gbt=cur.base_tri,
        gm0=cur.meta0, gm1=cur.meta1, gim=cur.imask,
        pmask=zero_u, pbc=zero_i, pbt=zero_i,
        pm0=zero_u, pm1=zero_u, pim=zero_u,
        sp=jnp.zeros((R,), jnp.int32),
        t=t_best, tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32), v=jnp.zeros((R,), jnp.float32),
        orig=jnp.arange(R, dtype=jnp.int32),
    )


def _active(st):
    return (st["gmask"] != 0) | (st["sp"] > 0)


def _step(unified, T, C, any_hit, st):
    """One lock-step traversal iteration over the state dict (the loop body
    described in the module docstring)."""
    ro, rd, inv_rd, oct_key = st["ro"], st["rd"], st["inv"], st["oct"]
    cur = _Group(mask=st["gmask"], base_child=st["gbc"], base_tri=st["gbt"],
                 meta0=st["gm0"], meta1=st["gm1"], imask=st["gim"])
    planes = dict(mask=st["pmask"], base_child=st["pbc"], base_tri=st["pbt"],
                  meta0=st["pm0"], meta1=st["pm1"], imask=st["pim"])
    sp = st["sp"]
    t_best, tri_best, u_best, v_best = st["t"], st["tri"], st["u"], st["v"]

    # ---- 1. pop a saved group where the current one is exhausted
    pop = (cur.mask == 0) & (sp > 0)
    popped = _Group(mask=planes["mask"][:, 0],
                    base_child=planes["base_child"][:, 0],
                    base_tri=planes["base_tri"][:, 0],
                    meta0=planes["meta0"][:, 0],
                    meta1=planes["meta1"][:, 0],
                    imask=planes["imask"][:, 0])
    cur = jax.tree_util.tree_map(
        lambda new, old: jnp.where(pop, new, old), popped, cur)
    sp = sp - pop.astype(jnp.int32)
    pop_planes = {k: _shift_pop(v) for k, v in planes.items()}

    # ---- 2. extract next slot (near-to-far octant order)
    active = cur.mask != 0
    slot, mask_rest = _extract_slot(cur.mask, oct_key)
    is_int = ((cur.imask >> slot.astype(U32)) & U32(1)) == 1
    meta_s = _meta_at(cur.meta0, cur.meta1, slot)

    # ---- 3. THE gather: leaf lanes fetch their triple row, descending
    # lanes fetch their child-node row — one unified-table access
    leaf_lane = active & ~is_int
    off = (meta_s & U32(0x1F)).astype(jnp.int32)
    count = jax.lax.population_count(meta_s >> 5).astype(jnp.int32)
    t0i = jnp.clip(cur.base_tri + off, 0, T - 1)
    below = cur.imask & ((U32(1) << slot.astype(U32)) - U32(1))
    rank = jax.lax.population_count(below).astype(jnp.int32)
    child = jnp.clip(cur.base_child + rank, 0, C - 1)
    descend = active & is_int
    row_idx = jnp.where(leaf_lane, C + t0i,
                        jnp.where(descend, child, 0))
    row = unified[row_idx]                              # [R,36] u32

    # ---- 3a. leaf slots: <=3 Moller tests on the fetched triple
    trip = jax.lax.bitcast_convert_type(row, jnp.float32)
    for j in range(3):
        base = 12 * j
        p0 = trip[:, base + 0:base + 3]
        e1 = trip[:, base + 3:base + 6]
        e2 = trip[:, base + 6:base + 9]
        # Moller-Trumbore
        pv = jnp.cross(rd, e2)
        det = jnp.sum(e1 * pv, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tv = ro - p0
        u = jnp.sum(tv * pv, axis=-1) * inv_det
        qv = jnp.cross(tv, e1)
        v = jnp.sum(rd * qv, axis=-1) * inv_det
        th = jnp.sum(e2 * qv, axis=-1) * inv_det
        ok = (leaf_lane & (j < count) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (th > 1e-4) & (th < t_best)
              & (jnp.abs(det) > 1e-12))
        t_best = jnp.where(ok, th, t_best)
        tri_best = jnp.where(ok, t0i + j, tri_best)
        u_best = jnp.where(ok, u, u_best)
        v_best = jnp.where(ok, v, v_best)

    # ---- 3b. internal slots: descend into the child
    push = descend & (mask_rest != 0)

    # stack update: pop applies first, then push on the popped state
    # (a lane may pop AND push in one iteration — pushing onto the
    # pre-pop stack would resurrect the popped entry and drop the
    # deepest one)
    saved = cur._replace(mask=mask_rest)
    new_planes = {}
    for k, plane in planes.items():
        base = jnp.where(pop[:, None], pop_planes[k], plane)
        pushed = _shift_push(base, getattr(saved, k).astype(plane.dtype))
        new_planes[k] = jnp.where(push[:, None], pushed, base)
    planes = new_planes
    sp = sp + push.astype(jnp.int32)

    # decode + slab the child row for descending lanes (no extra
    # gather — `row` already holds it; leaf lanes' rows are garbage
    # as node data but fully masked out by `descend`)
    child_grp = _decode_rows_and_slab(row[:, :20], ro, rd, inv_rd,
                                      t_best)
    cur = jax.tree_util.tree_map(
        lambda new, old: jnp.where(descend, new, old), child_grp,
        cur._replace(mask=jnp.where(active, mask_rest, cur.mask)))

    if any_hit:
        found = tri_best >= 0
        cur = cur._replace(mask=jnp.where(found, U32(0), cur.mask))
        sp = jnp.where(found, 0, sp)

    return dict(st, gmask=cur.mask, gbc=cur.base_child, gbt=cur.base_tri,
                gm0=cur.meta0, gm1=cur.meta1, gim=cur.imask,
                pmask=planes["mask"], pbc=planes["base_child"],
                pbt=planes["base_tri"], pm0=planes["meta0"],
                pm1=planes["meta1"], pim=planes["imask"],
                sp=sp, t=t_best, tri=tri_best, u=u_best, v=v_best)


_ITER_CAP = 65536   # safety bound; reference caps at 1000 iters/ray
                    # (IntersectionKernels.compute:155 `while(i++ < 1000)`)


def _run_stage(unified, T, C, any_hit, st, target: int):
    """Iterate until <= `target` lanes remain active (0 = run to done)."""
    def cond(c):
        s, it = c
        n = jnp.sum(_active(s).astype(jnp.int32))
        return (n > target) & (it < _ITER_CAP)

    def body(c):
        s, it = c
        return _step(unified, T, C, any_hit, s), it + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return st


def _traverse(nodes, tri_triple, ro, rd, t_max, any_hit: bool,
              max_stack: int, root=0):
    """Single-stage traversal (full batch lock-step until every ray done)."""
    T, C = tri_triple.shape[0], nodes.shape[0]
    unified = _pack_table(nodes, tri_triple)
    st = _init_state(nodes, ro, rd, t_max, root, max_stack)
    st = _run_stage(unified, T, C, any_hit, st, 0)
    return Hit(t=st["t"], tri=st["tri"], u=st["u"], v=st["v"])


def _traverse_cascade(nodes, tri_triple, ro, rd, t_max, any_hit: bool,
                      max_stack: int, root=0, stages: int = 8):
    """Occupancy-cascade traversal.

    The lock-step loop pays one full-width gather per iteration until the
    LAST ray finishes, so stragglers dominate (the reference instead refills
    idle threads from an atomic work queue — IntersectionKernels.compute:79).
    The TPU version compacts instead: run until half the lanes retire, sort
    actives to the front (sorts are ~free on TPU, BASELINE.md), continue at
    half width. Retired rows are collected per stage and inverse-permuted at
    the end — zero scatters."""
    R = ro.shape[0]
    T, C = tri_triple.shape[0], nodes.shape[0]
    unified = _pack_table(nodes, tri_triple)
    st = _init_state(nodes, ro, rd, t_max, root, max_stack)

    retired = []
    size = R
    for _ in range(stages):
        if size % 2 or size // 2 < 512:
            break
        st = _run_stage(unified, T, C, any_hit, st, size // 2)
        act = _active(st)
        # active lanes first (stable, so retired rows keep relative order)
        perm = jnp.argsort(jnp.where(act, 0, 1), stable=True)
        half = size // 2
        keep, drop = perm[:half], perm[half:]
        retired.append(tuple(st[k][drop] for k in ("orig", "t", "tri",
                                                   "u", "v")))
        st = {k: a[keep] for k, a in st.items()}
        size = half
    st = _run_stage(unified, T, C, any_hit, st, 0)
    retired.append(tuple(st[k] for k in ("orig", "t", "tri", "u", "v")))

    orig, t, tri, u, v = (jnp.concatenate(cols) for cols in zip(*retired))
    inv = jnp.argsort(orig)
    return Hit(t=t[inv], tri=tri[inv], u=u[inv], v=v[inv])


# below this ray count the cascade's sort/compact overhead outweighs the
# straggler savings; fall back to the single-stage loop
_CASCADE_MIN_RAYS = 4096


def _dispatch(nodes, tri_triple, ro, rd, t_max, any_hit, max_stack,
              cascade):
    R = ro.shape[0]
    if cascade and R >= _CASCADE_MIN_RAYS:
        return _traverse_cascade(nodes, tri_triple, ro, rd, t_max, any_hit,
                                 max_stack)
    return _traverse(nodes, tri_triple, ro, rd, t_max, any_hit, max_stack)


@partial(jax.jit, static_argnames=("max_stack", "cascade"))
def closest_hit_wavefront(nodes, tri_triple, ro, rd, t_max,
                          max_stack: int = MAX_STACK,
                          cascade: bool = True) -> Hit:
    return _dispatch(nodes, tri_triple, ro, rd, t_max, False, max_stack,
                     cascade)


@partial(jax.jit, static_argnames=("max_stack", "cascade"))
def any_hit_wavefront(nodes, tri_triple, ro, rd, t_max,
                      max_stack: int = MAX_STACK, cascade: bool = True):
    hit = _dispatch(nodes, tri_triple, ro, rd, t_max, True, max_stack,
                    cascade)
    return hit.tri >= 0
