"""Scatter-free CWBVH wavefront traversal — the TPU fast path.

The first-cut traversal (kernels/cwbvh_ref.py) used per-ray stack *scatters*
(`stack.at[ray, sp].set`), which XLA lowers to row-serialized scatter on TPU
(~30 M updates/s — measured). This version is designed around what the
hardware actually does well, with the cost model re-measured on v5e:

* **the dependent gather is the floor**: a gather whose index comes from
  the loop carry costs ~2.7 ns/row when the table fits the on-chip cache
  (~30 MB on v5e) and ~10-43 ns/row beyond it (BASELINE.md). The loop does
  exactly ONE row-gather per iteration from a unified [C+L, 30] table —
  descending lanes fetch their child-node row, leaf lanes their packed
  leaf row (mutually exclusive per lane) — and the leaf-row layout exists
  precisely to keep that table under the cache cliff.
* **the real budget is VPU work per iteration** (stack shuffling, node
  decode, slab tests). The per-ray traversal group is therefore packed
  into THREE words — the classic CWBVH hits-mask encoding (Ylitie 2017,
  the reference's own GPU layout: CommonData.cginc:641-707):
      hits  u32: bits 24..31 = pending internal-child slots,
                 bits 0..7   = pending leaf slots
      chim  u32: base_child | imask << 24
      bleaf u32: base_leaf_row | leafmask << 24
  so the stack is 3 shift-register planes instead of 6 and all meta
  bookkeeping disappears after decode.
* **stacks never scatter**: push = shift-right + write col 0, pop =
  shift-left — pure `where`/`concat` vector ops.
* **stragglers don't bill the whole batch**: the occupancy cascade
  (closest/any entry points) compacts live rays to half width whenever
  half the lanes retire (argsort is ~free on TPU), so the lock-step loop
  pays for the *average* ray, not the worst (the reference instead refills
  idle threads from an atomic work queue — IntersectionKernels.compute:79).

Traversal scheme per iteration (tri-first, near-to-far octant order for
node slots — IntersectionKernels.compute:155-252 recast for lock-step
SIMD):
  1. lanes with an empty group pop a saved group from the stack planes.
  2. lanes with pending leaf bits gather that slot's packed leaf row and
     run its <=3 Moller tests (pad tris are degenerate + id-gated).
  3. other lanes extract the nearest pending node slot, gather + decode
     the child node, slab-test its 8 quantized boxes against t_best, and
     make it the new current group (saving the remainder if non-empty).

The node layout contract is build/cwbvh.py's, with one post-pass
(`pack_leaf_rows`): word 5 is rewritten from base_tri to base_leaf_row and
the triangle table becomes PER-LEAF rows — 3 packed tris (degenerate-padded)
plus their 3 global tri ids, 30 words. Only leaf starts are ever gathered,
so this deduplicates the old per-tri triple table ~2.4x; together with the
node rows the whole gather table fits the on-chip cache for Sponza-class
scenes, which is worth ~4x on dependent-gather latency (BASELINE.md).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.kernels.traverse_ref import Hit

U32 = jnp.uint32
# Transpose the gathered [R,30] row to [30,R] once per iteration so every
# column read is a clean lane row instead of a stride-30 slice: measured
# +5-8% on v5e (3.10 vs 2.88 Mrays/s same-session, scripts/tune_r2.py).
# TT_TRANSPOSE_ROW=0 restores column slices.
_TRANSPOSE_ROW = os.environ.get("TT_TRANSPOSE_ROW", "1") == "1"


def _row_cols(row):
    """Column accessor for a gathered [R,W] row block (see _TRANSPOSE_ROW)."""
    if _TRANSPOSE_ROW:
        t = row.T
        return lambda k: t[k]
    return lambda k: row[:, k]


# Fuse the per-iteration Moller+decode core into one Pallas VMEM kernel
# (kernels/step_pallas.py) instead of XLA fusion groups. Bit-identical;
# measured on-chip before flipping the default (BASELINE.md round 3).
_PALLAS_STEP = os.environ.get("TT_PALLAS_STEP", "0") == "1"

# Slab-decode restructure experiments (round 5, scripts/tune_decode5.py).
# All variants are bitwise-identical to v1: for occupied slots lo <= hi,
# and both subtraction and multiplication by a positive (resp. negative)
# inv are monotone (resp. antitone) under round-to-nearest, so
# min(t0,t1) IS the near-bound product exactly. Read at trace time.
#   0 = v1 baseline (inline, 3-op unpacks, per-slot min/max + occ gate)
#   2 = hoisted near/far word select + deferred masking — MEASURED 3x
#       SLOWER (243 vs 85 ms on the bench mix): the 24 hoisted select
#       intermediates are materialized across the slot loop and break
#       the single decode fusion. Kept as the experimental record.
#   3 = inline sign-select near/far + 1-op halfword unpacks (fusion
#       intact, ~10 ops/slot-axis vs 14)
#   4 = 1-op halfword unpacks only (minimal delta vs v1)
_DECODE_V2 = int(os.environ.get("TT_DECODE_V2", "0"))

# One entry per tree level; CWBVH depth ~ log8(T) (measured: 9 at 293k
# tris, 12 at 5.2M). The stack planes are shift registers — every
# iteration shuffles all MAX_STACK columns of 3 planes (~14% of the step,
# ablation in BASELINE.md) — so compile_scene computes the EXACT tree
# depth and passes it via Scene.cw_stack; 16 is the safe default for
# callers without a scene handle.
MAX_STACK = int(os.environ.get("TT_MAX_STACK", "16"))

# Top-level prepass (TT_TOP_PREPASS=1): decode the root's children OUTSIDE
# the loop from scalar-indexed row slices (dynamic-slice, NO per-ray
# gather, no [R,W] row materialization) and hand the loop the two nearest
# pre-decoded groups. Single-BLAS scalar roots only (the TLAS path roots
# subtrees per ray). MEASURED NEUTRAL on v5e (4.790 vs 4.781 Mrays/s,
# round-4 bench mix, scripts/tune_prepass.py): the ~2 saved iterations
# are offset by the extra stack row + prepass decodes — the in-loop
# dependent gather is throughput-bound at 64k lanes, not latency-bound,
# so skipping shallow iterations buys nothing. Kept for study; off by
# default.
_TOP_PREPASS = os.environ.get("TT_TOP_PREPASS", "0") == "1"
PTR_MASK = U32(0x00FFFFFF)   # low 24 bits of chim/bleaf hold the base index
LEAF_MASK = U32(0x000000FF)  # hits bits 0..7 = pending leaf slots
ROW_W = 30                   # default leaf row: 3x(p0,e1,e2) + 3 tri ids

# Leaf rows generalize to K tris per row ("fat leaves", K in {3, 6, 12}):
# row = K x 9 triangle words + K id words = 10K wide, built by
# compile_scene(leaf_k=K) over a max_leaf=K BVH2. Rationale (measured,
# BASELINE.md round-3 width map): the HBM-resident dependent gather has a
# mode switch at W>=57ish — W=60..128 all stream at ~1.1 ns/word, so a
# 60-wide row costs ~as much as a 30-wide one while testing 2x the
# triangles per leaf iteration. Cache-resident tables are width-free but
# pay the extra Moller VPU work, so K=3 stays the small-scene default.
# The traversal derives K statically from the table width (10K).


def _k_of(width: int) -> int:
    """Tris per leaf row from the unified/leaf table width (10K)."""
    assert width % 10 == 0 and width >= 30, f"bad leaf-row width {width}"
    return width // 10


def pack_leaf_rows(nodes: np.ndarray, slot_tri_base: np.ndarray,
                   slot_tri_count: np.ndarray, p0: np.ndarray,
                   e1: np.ndarray, e2: np.ndarray, k: int = 3):
    """Host post-pass: build the per-leaf row table and rewrite node word 5
    to base_leaf_row.

    slot_tri_base/slot_tri_count: [C,8] builder metadata; p0/e1/e2: [T,3]
    triangles in CWBVH order. Returns (nodes_patched [C,20] u32,
    leaf_rows [L,10k] f32 — tri-id columns 9k..10k-1 are bitcast int32;
    missing tris are degenerate (e=0 -> det=0, never hit) with id -1)."""
    C = nodes.shape[0]
    T = p0.shape[0]
    mask = slot_tri_count > 0                        # [C,8]
    per_node = mask.sum(axis=1)
    base_leaf = np.concatenate([[0], np.cumsum(per_node)[:-1]])
    L = int(per_node.sum())
    assert L < (1 << 24) and C < (1 << 24)
    nodes2 = nodes.copy()
    nodes2[:, 5] = base_leaf.astype(np.uint32)
    sb = slot_tri_base[mask].astype(np.int64)        # [L] node-major order
    scnt = slot_tri_count[mask]
    assert scnt.size == 0 or int(scnt.max()) <= k, \
        "leaf slot exceeds k tris — build the BVH2 with max_leaf<=k"
    rows = np.zeros((L, 10 * k), np.float32)
    for j in range(k):
        valid = (j < scnt)[:, None]
        tid = np.clip(sb + j, 0, T - 1)
        rows[:, 9 * j + 0: 9 * j + 3] = np.where(valid, p0[tid], 0.0)
        rows[:, 9 * j + 3: 9 * j + 6] = np.where(valid, e1[tid], 0.0)
        rows[:, 9 * j + 6: 9 * j + 9] = np.where(valid, e2[tid], 0.0)
        rows.view(np.int32)[:, 9 * k + j] = np.where(
            valid[:, 0], sb + j, -1).astype(np.int32)
    return nodes2, rows


def pack_leaf_rows_jax(slot_tri_base, slot_tri_count, p0, e1, e2,
                       k: int = 3):
    """Device-side leaf-row rebuild for deformed geometry (skinning/refit):
    same layout as pack_leaf_rows but from [L] flattened slot arrays
    (slot_tri_base[mask], slot_tri_count[mask] — host-static) and jnp
    triangle arrays. Jit-friendly."""
    T = p0.shape[0]
    sb = jnp.asarray(slot_tri_base, jnp.int32)
    scnt = jnp.asarray(slot_tri_count, jnp.int32)
    cols = []
    ids = []
    for j in range(k):
        valid = (j < scnt)[:, None]
        tid = jnp.clip(sb + j, 0, T - 1)
        cols += [jnp.where(valid, p0[tid], 0.0),
                 jnp.where(valid, e1[tid], 0.0),
                 jnp.where(valid, e2[tid], 0.0)]
        ids.append(jnp.where(valid[:, 0], sb + j, -1))
    idf = jax.lax.bitcast_convert_type(jnp.stack(ids, axis=1), jnp.float32)
    return jnp.concatenate(cols + [idf], axis=1)


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


def _bf16_down(x):
    """f32 -> bf16 bits rounded toward -inf (conservative lower bound)."""
    b = jax.lax.bitcast_convert_type(x, U32)
    trunc = b & U32(0xFFFF0000)
    rem = (b & U32(0xFFFF)) != 0
    neg = (b >> 31) == 1
    # negative: adding one bf16 ulp to the bit pattern grows the magnitude
    return jnp.where(neg & rem, trunc + U32(0x10000), trunc)


def _bf16_up(x):
    """f32 -> bf16 bits rounded toward +inf (conservative upper bound)."""
    b = jax.lax.bitcast_convert_type(x, U32)
    trunc = b & U32(0xFFFF0000)
    rem = (b & U32(0xFFFF)) != 0
    neg = (b >> 31) == 1
    return jnp.where(~neg & rem, trunc + U32(0x10000), trunc)


def expand_nodes(nodes):
    """Canonical 20-word quantized nodes -> 26-word traversal rows with
    ABSOLUTE child bounds in conservative bf16 (2 per u32 word):

      cols 0..23 : per axis (8 words each): lo[8 slots] as 4 words then
                   hi[8 slots] as 4 words; slot j lives in word j>>1,
                   half j&1 (low halfword = even slot)
      col 24     : chim  = base_child | imask << 24
      col 25     : bleaf = base_leaf  | leafmask << 24

    This removes the per-iteration byte unpack + dequantize mul-add from
    the hot loop (a ~40% decode saving — BASELINE.md); bf16 rounded
    outward keeps the boxes conservative so traversal results are
    IDENTICAL (empty slots get inverted boxes that never pass the slab).
    Runs under jit (vectorized over nodes) — refit nodes re-expand
    automatically at the next traversal call."""
    C = nodes.shape[0]
    w3 = nodes[:, 3]
    imask = w3 >> 24
    m0, m1 = nodes[:, 6], nodes[:, 7]
    out = [jnp.zeros((C,), U32) for _ in range(24)]
    leafmask = jnp.zeros((C,), U32)
    for j in range(8):
        sh = U32(8 * (j % 4))
        m = ((m0 if j < 4 else m1) >> sh) & U32(0xFF)
        is_int = ((imask >> j) & U32(1)) == 1
        leafmask = leafmask | jnp.where((m != 0) & ~is_int,
                                        U32(1 << j), U32(0))
        for axis in range(3):
            p = jax.lax.bitcast_convert_type(nodes[:, axis], jnp.float32)
            scale = jax.lax.bitcast_convert_type(
                ((w3 >> U32(8 * axis)) & U32(0xFF)) << 23, jnp.float32)
            lo_w = nodes[:, (8 if j < 4 else 9) + 2 * axis]
            hi_w = nodes[:, (14 if j < 4 else 15) + 2 * axis]
            qlo = ((lo_w >> sh) & U32(0xFF)).astype(jnp.float32)
            qhi = ((hi_w >> sh) & U32(0xFF)).astype(jnp.float32)
            lo16 = _bf16_down(p + qlo * scale) >> 16
            hi16 = _bf16_up(p + qhi * scale) >> 16
            wi = 8 * axis + (j >> 1)
            half = U32(16 * (j & 1))
            out[wi] = out[wi] | (lo16 << half)
            out[wi + 4] = out[wi + 4] | (hi16 << half)
    chim = (nodes[:, 4] & PTR_MASK) | (imask << 24)
    bleaf = (nodes[:, 5] & PTR_MASK) | (leafmask << 24)
    return jnp.stack(out + [chim, bleaf], axis=1)


def _decode_rows_to_group(w, ro, rd, inv_rd, t_best):
    """Slab-test pre-gathered EXPANDED node rows [R,30] (expand_nodes
    layout) — see _decode_cols."""
    return _decode_cols(_row_cols(w), w.shape[0], ro, rd, inv_rd, t_best)


def _decode_cols(col, R, ro, rd, inv_rd, t_best):
    """Slab-test the 8 children of expanded node rows given a COLUMN
    accessor col(k) -> [R] u32 (lets _step share one transpose between
    decode and the Moller tests). Returns the 3-word group:

        hits  u32: bit j      = leaf slot j pending (j = 0..7)
                   bit 24+j   = internal child slot j pending
        chim  u32: base_child | imask << 24
        bleaf u32: base_leaf_row | leafmask << 24
                   (leafmask = occupied non-internal slots — the rank of a
                    leaf bit in it addresses that slot's packed leaf row)

    Everything is computed on full-width [R] columns (single-column slices
    of the gathered rows; [R,8]/[R,3]/u8-bitcast formulations cost ~2x in
    TPU relayout traffic — measured, see BASELINE.md)."""
    chim = col(24)
    bleaf = col(25)
    imask = chim >> 24
    occ = imask | (bleaf >> 24)
    rox = [ro[:, k] for k in range(3)]
    invx = [inv_rd[:, k] for k in range(3)]

    if _DECODE_V2 in (3, 4):
        bc = jax.lax.bitcast_convert_type
        sel = _DECODE_V2 == 3
        pos = [invx[a] >= 0 for a in range(3)] if sel else None
        hits8 = jnp.zeros((R,), U32)
        for j in range(8):
            wi = j >> 1
            hi_half = (j & 1) == 1
            tn = jnp.full((R,), -jnp.inf)
            tf = jnp.full((R,), jnp.inf)
            for axis in range(3):
                lo_w = col(8 * axis + wi)
                hi_w = col(8 * axis + 4 + wi)
                # bf16 halfword -> f32 bits in ONE op per bound
                if hi_half:
                    lo = bc(lo_w & U32(0xFFFF0000), jnp.float32)
                    hi = bc(hi_w & U32(0xFFFF0000), jnp.float32)
                else:
                    lo = bc(lo_w << 16, jnp.float32)
                    hi = bc(hi_w << 16, jnp.float32)
                t0 = (lo - rox[axis]) * invx[axis]
                t1 = (hi - rox[axis]) * invx[axis]
                if sel:
                    tn = jnp.maximum(tn, jnp.where(pos[axis], t0, t1))
                    tf = jnp.minimum(tf, jnp.where(pos[axis], t1, t0))
                else:
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            hitj = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
            hits8 = hits8 | jnp.where(hitj, U32(1 << j), U32(0))
        m = hits8 & occ
        return ((m & imask) << 24) | (m & (bleaf >> 24)), chim, bleaf

    if _DECODE_V2 == 2:
        # near/far word select hoisted per (axis, word): 24 selects total
        # instead of re-deriving both bounds + min/max inside all 24
        # slot-axis bodies (see _DECODE_V2 note at top of file)
        nearw, farw = {}, {}
        for axis in range(3):
            p = invx[axis] >= 0
            for wi in range(4):
                lo_w = col(8 * axis + wi)
                hi_w = col(8 * axis + 4 + wi)
                nearw[axis, wi] = jnp.where(p, lo_w, hi_w)
                farw[axis, wi] = jnp.where(p, hi_w, lo_w)
        bc = jax.lax.bitcast_convert_type
        hits8 = jnp.zeros((R,), U32)
        for j in range(8):
            wi = j >> 1
            hi_half = (j & 1) == 1
            tn = jnp.full((R,), -jnp.inf)
            tf = jnp.full((R,), jnp.inf)
            for axis in range(3):
                nw, fw = nearw[axis, wi], farw[axis, wi]
                # bf16 halfword -> f32 bits in ONE op per bound
                if hi_half:
                    nb, fb = nw & U32(0xFFFF0000), fw & U32(0xFFFF0000)
                else:
                    nb, fb = nw << 16, fw << 16
                tn = jnp.maximum(tn, (bc(nb, jnp.float32) - rox[axis])
                                 * invx[axis])
                tf = jnp.minimum(tf, (bc(fb, jnp.float32) - rox[axis])
                                 * invx[axis])
            hitj = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
            hits8 = hits8 | jnp.where(hitj, U32(1 << j), U32(0))
        m = hits8 & occ
        return ((m & imask) << 24) | (m & (bleaf >> 24)), chim, bleaf

    # v5/v6 isolate the two deltas shared by the slower variants:
    # v5 = v1 with ONLY the 1-op halfword unpack; v6 = v1 with ONLY the
    # deferred occ/is_int masking (3-op unpack kept).
    one_op_unpack = _DECODE_V2 == 5
    deferred_mask = _DECODE_V2 == 6
    bc = jax.lax.bitcast_convert_type
    hits = jnp.zeros((R,), U32)
    hits8 = jnp.zeros((R,), U32)
    for j in range(8):
        wi = j >> 1
        lo_sh = U32(16 * (j & 1))
        tn = jnp.full((R,), -jnp.inf)
        tf = jnp.full((R,), jnp.inf)
        for axis in range(3):
            lo_w = col(8 * axis + wi)
            hi_w = col(8 * axis + 4 + wi)
            if one_op_unpack:
                if (j & 1) == 1:
                    lo = bc(lo_w & U32(0xFFFF0000), jnp.float32)
                    hi = bc(hi_w & U32(0xFFFF0000), jnp.float32)
                else:
                    lo = bc(lo_w << 16, jnp.float32)
                    hi = bc(hi_w << 16, jnp.float32)
            else:
                lo = bc(((lo_w >> lo_sh) & U32(0xFFFF)) << 16,
                        jnp.float32)
                hi = bc(((hi_w >> lo_sh) & U32(0xFFFF)) << 16,
                        jnp.float32)
            t0 = (lo - rox[axis]) * invx[axis]
            t1 = (hi - rox[axis]) * invx[axis]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        if deferred_mask:
            hitj = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
            hits8 = hits8 | jnp.where(hitj, U32(1 << j), U32(0))
        else:
            hitj = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best) \
                & (((occ >> j) & U32(1)) == 1)
            is_int = ((imask >> j) & U32(1)) == 1
            bit = jnp.where(is_int, U32(1 << (24 + j)), U32(1 << j))
            hits = hits | jnp.where(hitj, bit, U32(0))
    if deferred_mask:
        m = hits8 & occ
        hits = ((m & imask) << 24) | (m & (bleaf >> 24))
    return hits, chim, bleaf


def _pack_table(nodes, leaf_rows):
    """One [C+L, 10K] uint32 table: EXPANDED node rows (expand_nodes,
    26 words, zero-padded to the leaf-row width) then leaf rows (bitcast
    f32->u32). A traversal iteration needs EITHER a child-node row
    (descending lanes) OR a leaf row (leaf lanes) — never both on the
    same lane — so a unified table keeps the loop at one gather per
    iteration. Width K=3 (30) for cache-resident tables; fat K=6 rows
    (60) ride the measured flat W>=60 gather mode on HBM-resident
    tables."""
    exp = expand_nodes(nodes)
    W = leaf_rows.shape[1]
    return jnp.concatenate(
        [jnp.pad(exp, ((0, 0), (0, W - exp.shape[1]))),
         jax.lax.bitcast_convert_type(leaf_rows, jnp.uint32)], axis=0)


_PLANE_KEYS = ("phits", "pchim", "pbleaf", "ray9")


def _take(st, idx):
    """Compact/permute the state dict along the LANE axis. Stack planes
    (and the lane-major ray9 block) are [S,R] (lane axis LAST);
    everything else leads with it."""
    return {k: (a[:, idx] if k in _PLANE_KEYS else a[idx])
            for k, a in st.items()}


def _init_state(unified, ro, rd, t_max, root, max_stack):
    """Per-ray traversal state as a flat dict of arrays keyed by lane.

    The stack planes are PLANE-MAJOR [max_stack, R]: TPU tiles pad the
    minor dimension to 128 lanes, so a [R,S] plane wastes (128-S)/128 of
    its tile and its shift-register push/pop walks the padded minor dim —
    measured 3.37 vs 3.55 Mrays/s for S=10 vs 16, i.e. shrinking S bought
    nothing. With [S,R] the shifts are major-dim concats and the pop read
    st["phits"][0] is a clean [R] row. `unified` is the packed table from
    _pack_table (expanded node rows first)."""
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
    hits, chim, bleaf = _decode_rows_to_group(
        unified[root_ids], ro, rd, inv_rd, t_best)
    zero_u = jnp.zeros((max_stack, R), U32)
    st = dict(
        ro=ro, rd=rd, inv=inv_rd, oct=oct_key,
        hits=hits, chim=chim, bleaf=bleaf,
        phits=zero_u, pchim=zero_u, pbleaf=zero_u,
        sp=jnp.zeros((R,), jnp.int32),
        t=t_best, tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32), v=jnp.zeros((R,), jnp.float32),
        orig=jnp.arange(R, dtype=jnp.int32),
    )
    if _TOP_PREPASS and isinstance(root, int):
        st = _top_prepass(unified, st, root)
    if _PALLAS_STEP:
        # lane-major ray block for the fused step kernel — transposed
        # ONCE here (rays are loop-invariant in single-level traversal)
        st["ray9"] = jnp.concatenate([ro.T, rd.T, inv_rd.T], axis=0)
    return st


def _top_prepass(unified, st, root: int):
    """Decode the root's (up to 8) children from SCALAR-indexed row
    slices — dynamic-slice broadcasts, no per-ray gather, no [R,W] row
    materialization — then seed the loop with the two nearest surviving
    children's pre-decoded groups (current + stack top) and a root
    remainder group below. Exact: same work, two fewer in-loop
    iterations for the common ray. Needs one extra stack row (callers
    bump max_stack when _TOP_PREPASS is on)."""
    R = st["ro"].shape[0]
    ro, rd, inv_rd, oct_key = st["ro"], st["rd"], st["inv"], st["oct"]
    t_best = st["t"]
    hits, chim, bleaf = st["hits"], st["chim"], st["bleaf"]

    row0 = jax.lax.dynamic_slice_in_dim(unified, root, 1, 0)[0]
    chim0 = row0[24]
    imask0 = chim0 >> 24
    base0 = (chim0 & PTR_MASK).astype(jnp.int32)
    N = unified.shape[0]
    dec = []
    for j in range(8):
        below = imask0 & U32((1 << j) - 1)
        rank = jax.lax.population_count(below).astype(jnp.int32)
        cid = jnp.clip(base0 + rank, 0, N - 1)
        rowj = jax.lax.dynamic_slice_in_dim(unified, cid, 1, 0)[0]
        dec.append(_decode_cols(lambda k, r=rowj: r[k], R, ro, rd,
                                inv_rd, t_best))

    def select(slot):
        h = jnp.zeros((R,), U32)
        c = jnp.zeros((R,), U32)
        b = jnp.zeros((R,), U32)
        for j in range(8):
            m = slot == j
            h = jnp.where(m, dec[j][0], h)
            c = jnp.where(m, dec[j][1], c)
            b = jnp.where(m, dec[j][2], b)
        return h, c, b

    node_bits = hits >> 24
    leaf_bits = hits & LEAF_MASK
    eligible = (leaf_bits == 0) & (node_bits != 0)
    slot1, rest1 = _extract_slot(node_bits, oct_key)
    slot2, rest2 = _extract_slot(rest1, oct_key)
    have2 = rest1 != 0
    g1h, g1c, g1b = select(slot1)
    g2h, g2c, g2b = select(slot2)

    rem_h = rest2 << 24                       # unprocessed far children
    has_rem = eligible & (rem_h != 0)
    has_g2 = eligible & have2 & (g2h != 0)
    # stack rows (planes are zero at init): top = row 0
    top_h = jnp.where(has_g2, g2h, rem_h)
    top_c = jnp.where(has_g2, g2c, chim)
    top_b = jnp.where(has_g2, g2b, bleaf)
    bot_on = has_g2 & has_rem
    take_top = has_g2 | has_rem
    phits = st["phits"].at[0].set(jnp.where(take_top, top_h, 0))
    pchim = st["pchim"].at[0].set(jnp.where(take_top, top_c, 0))
    pbleaf = st["pbleaf"].at[0].set(jnp.where(take_top, top_b, 0))
    phits = phits.at[1].set(jnp.where(bot_on, rem_h, 0))
    pchim = pchim.at[1].set(jnp.where(bot_on, chim, 0))
    pbleaf = pbleaf.at[1].set(jnp.where(bot_on, bleaf, 0))
    sp = jnp.where(eligible,
                   take_top.astype(jnp.int32) + bot_on.astype(jnp.int32),
                   st["sp"])
    return dict(st,
                hits=jnp.where(eligible, g1h, hits),
                chim=jnp.where(eligible, g1c, chim),
                bleaf=jnp.where(eligible, g1b, bleaf),
                phits=jnp.where(eligible[None, :], phits, st["phits"]),
                pchim=jnp.where(eligible[None, :], pchim, st["pchim"]),
                pbleaf=jnp.where(eligible[None, :], pbleaf, st["pbleaf"]),
                sp=sp)


def _active(st):
    return (st["hits"] != 0) | (st["sp"] > 0)


def _shift_pop(plane):
    """[S,R] plane-major: drop row 0, zero-fill the bottom."""
    return jnp.concatenate([plane[1:], plane[:1] * 0], axis=0)


def _shift_push(plane, new_row):
    return jnp.concatenate([new_row[None, :], plane[:-1]], axis=0)


def _step_tail(st, any_hit, pop, push_from, decoded, sp, t_best, tri_best,
               u_best, v_best):
    """Shared step tail: shift-register stack update, group select,
    any-hit early-out (used by both the XLA and Pallas step cores)."""
    descend, leaf_lane, node_rest, chim, bleaf, hits, lsb = push_from
    hits_leaf = hits & ~lsb
    # pop applies first, then push on the popped state (a lane may pop
    # AND push in one iteration — pushing onto the pre-pop stack would
    # resurrect the popped entry and drop the deepest one).
    rest = node_rest << 24          # leaf bits drained before any descent
    push = descend & (rest != 0)
    for key, saved in (("phits", rest), ("pchim", chim),
                       ("pbleaf", bleaf)):
        plane = st[key]
        based = jnp.where(pop[None, :], _shift_pop(plane), plane)
        pushed = _shift_push(based, saved.astype(plane.dtype))
        st[key] = jnp.where(push[None, :], pushed, based)
    sp = sp + push.astype(jnp.int32)

    c_hits, c_chim, c_bleaf = decoded
    hits = jnp.where(descend, c_hits, jnp.where(leaf_lane, hits_leaf,
                                                hits))
    chim = jnp.where(descend, c_chim, chim)
    bleaf = jnp.where(descend, c_bleaf, bleaf)

    if any_hit == "mixed":
        # per-lane any-hit flag: flagged lanes stop at their first hit
        found = st["anyf"] & (tri_best >= 0)
        hits = jnp.where(found, U32(0), hits)
        sp = jnp.where(found, 0, sp)
    elif any_hit:
        found = tri_best >= 0
        hits = jnp.where(found, U32(0), hits)
        sp = jnp.where(found, 0, sp)

    return dict(st, hits=hits, chim=chim, bleaf=bleaf, sp=sp,
                t=t_best, tri=tri_best, u=u_best, v=v_best)


def _step(unified, L, C, any_hit, st):
    """One lock-step traversal iteration over the state dict (the loop body
    described in the module docstring).

    A "fused" variant that gathered one leaf row AND one node row per
    iteration (two independent gathers per latency window) was measured
    and REMOVED: 2.58 vs 2.98 Mrays/s on cache-resident tables and 0.43
    vs 0.79 on the 290 MB 5.2M-tri table — the second gather stream costs
    more than the saved iterations in BOTH regimes (BASELINE.md)."""
    ro, rd, inv_rd, oct_key = st["ro"], st["rd"], st["inv"], st["oct"]
    hits, chim, bleaf, sp = st["hits"], st["chim"], st["bleaf"], st["sp"]
    t_best, tri_best, u_best, v_best = st["t"], st["tri"], st["u"], st["v"]

    # ---- 1. pop a saved group where the current one is exhausted
    pop = (hits == 0) & (sp > 0)
    hits = jnp.where(pop, st["phits"][0], hits)
    chim = jnp.where(pop, st["pchim"][0], chim)
    bleaf = jnp.where(pop, st["pbleaf"][0], bleaf)
    sp = sp - pop.astype(jnp.int32)

    # ---- 2. choose work: pending leaves first (shrinks t_best before
    # more descents)
    leaf_bits = hits & LEAF_MASK
    node_bits = hits >> 24
    active = hits != 0
    leaf_lane = active & (leaf_bits != 0)
    descend = active & ~leaf_lane

    # leaf: lowest pending slot bit; its rank among the node's leaf slots
    # addresses the packed leaf row
    lsb = leaf_bits & (~leaf_bits + U32(1))
    leafmask = bleaf >> 24
    lrank = jax.lax.population_count(leafmask & (lsb - U32(1))
                                     ).astype(jnp.int32)
    lrow = jnp.clip((bleaf & PTR_MASK).astype(jnp.int32) + lrank, 0, L - 1)

    # node: extract nearest slot, child id = base + rank-in-imask
    # (any-hit rays don't care about order: plain lowest-set-bit saves
    # the octant permute)
    if any_hit is True:
        lsb_n = node_bits & (~node_bits + U32(1))
        slot = jax.lax.population_count(lsb_n - U32(1)).astype(jnp.int32)
        node_rest = node_bits & ~lsb_n
    else:
        slot, node_rest = _extract_slot(node_bits, oct_key)
    imask = chim >> 24
    below = imask & ((U32(1) << slot.astype(U32)) - U32(1))
    rank = jax.lax.population_count(below).astype(jnp.int32)
    child = jnp.clip((chim & PTR_MASK).astype(jnp.int32) + rank, 0, C - 1)

    # ---- 3. THE gather: one unified row per lane (leaf row for leaf
    # lanes, child node row for descending lanes)
    row_idx = jnp.where(leaf_lane, C + lrow,
                        jnp.where(descend, child, 0))
    row = unified[row_idx]                              # [R,10K] u32
    K = _k_of(unified.shape[1])

    if _PALLAS_STEP and K == 3 and ro.shape[0] % 1024 == 0:
        # fused Moller+decode in one VMEM kernel (kernels/step_pallas.py)
        from truetrace_tpu.kernels.step_pallas import step_core
        bc = jax.lax.bitcast_convert_type
        rowt = jnp.pad(row, ((0, 0), (0, 32 - row.shape[1]))).T
        st5 = jnp.stack([bc(t_best, U32), bc(tri_best, U32),
                         bc(u_best, U32), bc(v_best, U32),
                         leaf_lane.astype(U32)], axis=0)
        out = step_core(rowt, st["ray9"], st5,
                        write_uv=(any_hit is not True))
        t_best = bc(out[0], jnp.float32)
        tri_best = bc(out[1], jnp.int32)
        u_best = bc(out[2], jnp.float32)
        v_best = bc(out[3], jnp.float32)
        c_hits, c_chim, c_bleaf = out[4], out[5], out[6]
        return _step_tail(st, any_hit, pop, push_from=(descend, leaf_lane,
                          node_rest, chim, bleaf, hits, lsb),
                          decoded=(c_hits, c_chim, c_bleaf), sp=sp,
                          t_best=t_best, tri_best=tri_best, u_best=u_best,
                          v_best=v_best)

    # ONE u32 transpose of the gathered row serves the Moller tests, the
    # tri ids AND the node decode: per-column f32/i32 views are free
    # bitcasts of [R] u32 rows, where separate f32/u32 transposes of the
    # same row cost an extra relayout each (ablation: the Moller block is
    # ~25% of the step and is dominated by column-read traffic)
    ucol = _row_cols(row)
    tcol = lambda k: jax.lax.bitcast_convert_type(ucol(k), jnp.float32)

    # ---- 3a. leaf lanes: <=3 Moller tests (pad tris are degenerate and
    # id-gated). Fully scalarized on [R] columns — [R,3] slices of the
    # gathered row cost ~2x in relayout traffic (measured, BASELINE.md).
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    for j in range(K):
        b = 9 * j
        p0x, p0y, p0z = tcol(b), tcol(b + 1), tcol(b + 2)
        e1x, e1y, e1z = tcol(b + 3), tcol(b + 4), tcol(b + 5)
        e2x, e2y, e2z = tcol(b + 6), tcol(b + 7), tcol(b + 8)
        tri_id = jax.lax.bitcast_convert_type(ucol(9 * K + j), jnp.int32)
        # Moller-Trumbore
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
        ok = (leaf_lane & (tri_id >= 0) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (th > 1e-4) & (th < t_best)
              & (jnp.abs(det) > 1e-12))
        t_best = jnp.where(ok, th, t_best)
        tri_best = jnp.where(ok, tri_id, tri_best)
        if any_hit is not True:  # shadow-only dispatches skip u/v
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)

    # decode + slab the child row for descending lanes (from the shared
    # transpose of `row`), then the shared stack-update/select tail
    c_hits, c_chim, c_bleaf = _decode_cols(ucol, ro.shape[0], ro, rd,
                                           inv_rd, t_best)
    return _step_tail(st, any_hit, pop, (descend, leaf_lane, node_rest,
                                         chim, bleaf, hits, lsb),
                      (c_hits, c_chim, c_bleaf), sp, t_best, tri_best,
                      u_best, v_best)


_ITER_CAP = 65536   # safety bound; reference caps at 1000 iters/ray
                    # (IntersectionKernels.compute:155 `while(i++ < 1000)`)


def _run_stage(unified, L, C, any_hit, st, target: int):
    """Iterate until <= `target` lanes remain active (0 = run to done)."""
    def cond(c):
        s, it = c
        n = jnp.sum(_active(s).astype(jnp.int32))
        return (n > target) & (it < _ITER_CAP)

    def body(c):
        s, it = c
        return _step(unified, L, C, any_hit, s), it + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return st


def _traverse(nodes, leaf_rows, ro, rd, t_max, any_hit: bool,
              max_stack: int, root=0):
    """Single-stage traversal (full batch lock-step until every ray done)."""
    L, C = leaf_rows.shape[0], nodes.shape[0]
    assert C < (1 << 24) and L < (1 << 24), \
        "chim/bleaf pack base indices into 24 bits"
    if _TOP_PREPASS and isinstance(root, int):
        max_stack += 1   # prepass parks TWO level-1 groups
    unified = _pack_table(nodes, leaf_rows)
    st = _init_state(unified, ro, rd, t_max, root, max_stack)
    st = _run_stage(unified, L, C, any_hit, st, 0)
    return Hit(t=st["t"], tri=st["tri"], u=st["u"], v=st["v"])


def _traverse_cascade(nodes, leaf_rows, ro, rd, t_max, any_hit: bool,
                      max_stack: int, root=0, stages: int = 8,
                      floor: int = 512):
    """Occupancy-cascade traversal (see module docstring). stages/floor:
    max halvings and minimum stage width (round-5 sweep knobs,
    TT_CASCADE_STAGES / TT_CASCADE_FLOOR)."""
    R = ro.shape[0]
    L, C = leaf_rows.shape[0], nodes.shape[0]
    if _TOP_PREPASS and isinstance(root, int):
        max_stack += 1   # prepass parks TWO level-1 groups
    unified = _pack_table(nodes, leaf_rows)
    st = _init_state(unified, ro, rd, t_max, root, max_stack)

    retired = []
    size = R
    for _ in range(stages):
        if size % 2 or size // 2 < floor:
            break
        st = _run_stage(unified, L, C, any_hit, st, size // 2)
        act = _active(st)
        # active lanes first (stable, so retired rows keep relative order)
        perm = jnp.argsort(jnp.where(act, 0, 1), stable=True)
        half = size // 2
        keep, drop = perm[:half], perm[half:]
        retired.append(tuple(st[k][drop] for k in ("orig", "t", "tri",
                                                   "u", "v")))
        st = _take(st, keep)
        size = half
    st = _run_stage(unified, L, C, any_hit, st, 0)
    retired.append(tuple(st[k] for k in ("orig", "t", "tri", "u", "v")))

    orig, t, tri, u, v = (jnp.concatenate(cols) for cols in zip(*retired))
    inv = jnp.argsort(orig)
    return Hit(t=t[inv], tri=tri[inv], u=u[inv], v=v[inv])


# below this ray count the cascade's sort/compact overhead outweighs the
# straggler savings; fall back to the single-stage loop
_CASCADE_MIN_RAYS = 4096
# above this, chunk through lax.map: 64k batches are the measured v5e
# sweet spot (BASELINE.md) — big batches lose ~2x to cascade-stage width
_CHUNK_RAYS = int(os.environ.get("TT_CHUNK_RAYS", "65536"))
_CASCADE_STAGES = int(os.environ.get("TT_CASCADE_STAGES", "8"))
_CASCADE_FLOOR = int(os.environ.get("TT_CASCADE_FLOOR", "512"))


def _dispatch(nodes, leaf_rows, ro, rd, t_max, any_hit, max_stack,
              cascade):
    # NOTE: Morton/octant ray sorting before dispatch was measured twice
    # (round 1 and round 2) and is a dead end on this hardware: neutral on
    # HBM-resident tables (0.56 vs 0.58 Mrays/s @5.2M tris) and HARMFUL on
    # cache-resident ones (3.0 vs 3.7) — the XLA row gather is per-row
    # latency-bound, not inter-lane-locality-bound (BASELINE.md).
    R = ro.shape[0]
    if cascade and R > _CHUNK_RAYS and R % _CHUNK_RAYS == 0:
        n = R // _CHUNK_RAYS
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

        def chunk(args):
            o, d, tm = args
            return _traverse_cascade(nodes, leaf_rows, o, d, tm, any_hit,
                                     max_stack, stages=_CASCADE_STAGES,
                                     floor=_CASCADE_FLOOR)

        hit = jax.lax.map(chunk, (ro.reshape(n, _CHUNK_RAYS, 3),
                                  rd.reshape(n, _CHUNK_RAYS, 3),
                                  t_max.reshape(n, _CHUNK_RAYS)))
        return Hit(t=hit.t.reshape(R), tri=hit.tri.reshape(R),
                   u=hit.u.reshape(R), v=hit.v.reshape(R))
    if cascade and R >= _CASCADE_MIN_RAYS:
        return _traverse_cascade(nodes, leaf_rows, ro, rd, t_max, any_hit,
                                 max_stack, stages=_CASCADE_STAGES,
                                 floor=_CASCADE_FLOOR)
    return _traverse(nodes, leaf_rows, ro, rd, t_max, any_hit, max_stack)


@partial(jax.jit, static_argnames=("max_stack", "cascade"))
def closest_hit_wavefront(nodes, leaf_rows, ro, rd, t_max,
                          max_stack: int = MAX_STACK,
                          cascade: bool = True) -> Hit:
    return _dispatch(nodes, leaf_rows, ro, rd, t_max, False, max_stack,
                     cascade)


@partial(jax.jit, static_argnames=("max_stack", "cascade"))
def mixed_hit_wavefront(nodes, leaf_rows, ro, rd, t_max, is_any,
                        max_stack: int = MAX_STACK,
                        cascade: bool = True) -> Hit:
    """Heterogeneous dispatch: one batch mixing closest-hit and any-hit
    rays (is_any [R] bool — flagged lanes early-out at their first hit).
    The occupancy cascade then compacts fast-retiring shadow rays against
    slow closest-hit stragglers, which is how the integrator merges its
    per-bounce shadow flush with the next bounce's trace (the reference
    instead runs separate kernel_trace / kernel_shadow indirect
    dispatches, RayTracingMaster.cs:968,996)."""
    R = ro.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    ms = max_stack + 1 if _TOP_PREPASS else max_stack

    def run(o, d, tm, af):
        L, C = leaf_rows.shape[0], nodes.shape[0]
        unified = _pack_table(nodes, leaf_rows)
        st = _init_state(unified, o, d, tm, 0, ms)
        st = dict(st, anyf=af)
        n = o.shape[0]
        if cascade and n >= _CASCADE_MIN_RAYS:
            retired = []
            size = n
            for _ in range(8):
                if size % 2 or size // 2 < 512:
                    break
                st = _run_stage(unified, L, C, "mixed", st, size // 2)
                act = _active(st)
                perm = jnp.argsort(jnp.where(act, 0, 1), stable=True)
                half = size // 2
                keep, drop = perm[:half], perm[half:]
                retired.append(tuple(st[k][drop] for k in
                                     ("orig", "t", "tri", "u", "v")))
                st = _take(st, keep)
                size = half
            st = _run_stage(unified, L, C, "mixed", st, 0)
            retired.append(tuple(st[k] for k in
                                 ("orig", "t", "tri", "u", "v")))
            orig, t, tri, u, v = (jnp.concatenate(cols)
                                  for cols in zip(*retired))
            inv = jnp.argsort(orig)
            return Hit(t=t[inv], tri=tri[inv], u=u[inv], v=v[inv])
        st = _run_stage(unified, L, C, "mixed", st, 0)
        return Hit(t=st["t"], tri=st["tri"], u=st["u"], v=st["v"])

    if R > _CHUNK_RAYS and R % _CHUNK_RAYS == 0:
        n = R // _CHUNK_RAYS
        hit = jax.lax.map(
            lambda a: run(*a),
            (ro.reshape(n, _CHUNK_RAYS, 3), rd.reshape(n, _CHUNK_RAYS, 3),
             t_max.reshape(n, _CHUNK_RAYS), is_any.reshape(n, _CHUNK_RAYS)))
        return Hit(t=hit.t.reshape(R), tri=hit.tri.reshape(R),
                   u=hit.u.reshape(R), v=hit.v.reshape(R))
    return run(ro, rd, t_max, is_any)


@partial(jax.jit, static_argnames=("max_stack", "cascade"))
def any_hit_wavefront(nodes, leaf_rows, ro, rd, t_max,
                      max_stack: int = MAX_STACK, cascade: bool = True):
    hit = _dispatch(nodes, leaf_rows, ro, rd, t_max, True, max_stack,
                    cascade)
    return hit.tri >= 0


# ---------------------------------------------------------------------------
# transmittance traversal: shadow rays through cutout-alpha / stained glass
# (reference triangle_intersect_shadow, CommonData.cginc:593-634: any-hit
# that accumulates glass tint throughput and stops at opaque surfaces)
# ---------------------------------------------------------------------------

def _step_transmit(unified, tint, L, C, st):
    """Like the any-hit _step, but every accepted triangle multiplies the
    per-lane RGB throughput by its shadow tint (tint[T,3]: 0 = opaque,
    (1-alpha) + alpha*spec_trans*base_color otherwise) and traversal
    continues — t_best is NOT shortened (every surface on the segment
    must be visited once). Lanes retire when throughput ~ 0."""
    ro, rd, inv_rd = st["ro"], st["rd"], st["inv"]
    hits, chim, bleaf, sp = st["hits"], st["chim"], st["bleaf"], st["sp"]
    t_max = st["t"]
    tpr, tpg, tpb = st["tpr"], st["tpg"], st["tpb"]
    R = ro.shape[0]

    pop = (hits == 0) & (sp > 0)
    hits = jnp.where(pop, st["phits"][0], hits)
    chim = jnp.where(pop, st["pchim"][0], chim)
    bleaf = jnp.where(pop, st["pbleaf"][0], bleaf)
    sp = sp - pop.astype(jnp.int32)

    leaf_bits = hits & LEAF_MASK
    node_bits = hits >> 24
    active = hits != 0
    leaf_lane = active & (leaf_bits != 0)
    descend = active & ~leaf_lane

    lsb = leaf_bits & (~leaf_bits + U32(1))
    leafmask = bleaf >> 24
    lrank = jax.lax.population_count(leafmask & (lsb - U32(1))
                                     ).astype(jnp.int32)
    lrow = jnp.clip((bleaf & PTR_MASK).astype(jnp.int32) + lrank, 0, L - 1)

    lsb_n = node_bits & (~node_bits + U32(1))
    slot = jax.lax.population_count(lsb_n - U32(1)).astype(jnp.int32)
    node_rest = node_bits & ~lsb_n
    imask = chim >> 24
    below = imask & ((U32(1) << slot.astype(U32)) - U32(1))
    rank = jax.lax.population_count(below).astype(jnp.int32)
    child = jnp.clip((chim & PTR_MASK).astype(jnp.int32) + rank, 0, C - 1)

    row_idx = jnp.where(leaf_lane, C + lrow, jnp.where(descend, child, 0))
    row = unified[row_idx]
    K = _k_of(unified.shape[1])

    # one shared u32 transpose (see _step)
    ucol = _row_cols(row)
    tcol = lambda k: jax.lax.bitcast_convert_type(ucol(k), jnp.float32)
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    T = tint.shape[0]
    for j in range(K):
        b = 9 * j
        p0x, p0y, p0z = tcol(b), tcol(b + 1), tcol(b + 2)
        e1x, e1y, e1z = tcol(b + 3), tcol(b + 4), tcol(b + 5)
        e2x, e2y, e2z = tcol(b + 6), tcol(b + 7), tcol(b + 8)
        tri_id = jax.lax.bitcast_convert_type(ucol(9 * K + j), jnp.int32)
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
        ok = (leaf_lane & (tri_id >= 0) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (th > 1e-4) & (th < t_max)
              & (jnp.abs(det) > 1e-12))
        trow = tint[jnp.clip(tri_id, 0, T - 1)]
        tpr = jnp.where(ok, tpr * trow[:, 0], tpr)
        tpg = jnp.where(ok, tpg * trow[:, 1], tpg)
        tpb = jnp.where(ok, tpb * trow[:, 2], tpb)
    hits_leaf = hits & ~lsb

    rest = node_rest << 24
    push = descend & (node_rest != 0)
    for key, saved in (("phits", rest), ("pchim", chim),
                       ("pbleaf", bleaf)):
        plane = st[key]
        based = jnp.where(pop[None, :], _shift_pop(plane), plane)
        pushed = _shift_push(based, saved.astype(plane.dtype))
        st[key] = jnp.where(push[None, :], pushed, based)
    sp = sp + push.astype(jnp.int32)

    c_hits, c_chim, c_bleaf = _decode_cols(ucol, R, ro, rd, inv_rd, t_max)
    hits = jnp.where(descend, c_hits, jnp.where(leaf_lane, hits_leaf, hits))
    chim = jnp.where(descend, c_chim, chim)
    bleaf = jnp.where(descend, c_bleaf, bleaf)

    opaque = jnp.maximum(jnp.maximum(tpr, tpg), tpb) < 1e-3
    hits = jnp.where(opaque, U32(0), hits)
    sp = jnp.where(opaque, 0, sp)

    return dict(st, hits=hits, chim=chim, bleaf=bleaf, sp=sp,
                tpr=tpr, tpg=tpg, tpb=tpb)


@partial(jax.jit, static_argnames=("max_stack",))
def transmit_wavefront(nodes, leaf_rows, tint, ro, rd, t_max,
                       max_stack: int = MAX_STACK):
    """Shadow transmittance [R,3] along each segment: product of the
    per-triangle shadow tints of every surface crossed before t_max
    (1 = unoccluded, 0 = fully blocked). tint: [T,3] from
    scene compile (mesh.py shadow_tint_table)."""
    L, C = leaf_rows.shape[0], nodes.shape[0]
    if _TOP_PREPASS:
        max_stack += 1   # prepass parks TWO level-1 groups
    unified = _pack_table(nodes, leaf_rows)
    st = _init_state(unified, ro, rd, t_max, 0, max_stack)
    R = ro.shape[0]
    st = dict(st, tpr=jnp.ones((R,), jnp.float32),
              tpg=jnp.ones((R,), jnp.float32),
              tpb=jnp.ones((R,), jnp.float32))

    def cond(c):
        s, it = c
        return jnp.any(_active(s)) & (it < _ITER_CAP)

    def body(c):
        s, it = c
        return _step_transmit(unified, tint, L, C, s), it + 1

    st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    tp = jnp.stack([st["tpr"], st["tpg"], st["tpb"]], axis=-1)
    return jnp.where(jnp.maximum(jnp.maximum(st["tpr"], st["tpg"]),
                                 st["tpb"])[:, None] < 1e-3, 0.0, tp)


def reorder_leaf_rows_hot(nodes2: "np.ndarray", rows: "np.ndarray"):
    """Permute leaf-row GROUPS (one contiguous group per node) so
    high-heat groups pack at the FRONT of the unified gather table.

    Motivation (round-5 locality probe, BASELINE.md): the TPU gather
    cache operates on address granules, so a hot subset of rows
    SCATTERED across an HBM-sized table drags cold granule neighbours
    into cache and thrashes, while the same subset packed contiguously
    stays resident. Heat proxy = leaf AABB half-area (probability a
    random ray's slab test touches the row — the same SAH measure the
    builder minimizes; reference CWBVH exists for cache-friendly
    traversal, CommonData.cginc:641-707).

    Bitwise-neutral: rows carry their own triangle data + global ids,
    so only node word 5 (base_leaf_row) is rewritten. NOT compatible
    with the deformable refit path (pack_leaf_rows_jax regenerates rows
    in node-major order) — compile_scene(hot_order=True) is for static
    HBM-scale scenes.
    """
    import numpy as np
    C = nodes2.shape[0]
    L = rows.shape[0]
    base = nodes2[:, 5].astype(np.int64)
    per_node = np.diff(np.append(base, L))
    k = rows.shape[1] // 10
    # per-row AABB over the valid triangles' vertices
    ids = rows.view(np.int32)[:, 9 * k:]
    lo = np.full((L, 3), np.inf, np.float32)
    hi = np.full((L, 3), -np.inf, np.float32)
    for j in range(k):
        valid = (ids[:, j] >= 0)[:, None]
        p0 = rows[:, 9 * j: 9 * j + 3]
        v1 = p0 + rows[:, 9 * j + 3: 9 * j + 6]
        v2 = p0 + rows[:, 9 * j + 6: 9 * j + 9]
        for v in (p0, v1, v2):
            lo = np.where(valid, np.minimum(lo, v), lo)
            hi = np.where(valid, np.maximum(hi, v), hi)
    d = np.maximum(hi - lo, 0.0)
    row_heat = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2]
    row_heat = np.where(np.isfinite(row_heat), row_heat, 0.0)
    node_heat = np.zeros(C)
    np.add.at(node_heat, np.repeat(np.arange(C), per_node), row_heat)
    order = np.argsort(-node_heat, kind="stable")
    new_base = np.concatenate([[0], np.cumsum(per_node[order])[:-1]])
    perm = np.concatenate([np.arange(base[n], base[n] + per_node[n])
                           for n in order]).astype(np.int64) \
        if L else np.zeros((0,), np.int64)
    out_nodes = nodes2.copy()
    out_nodes[order, 5] = new_base.astype(np.uint32)
    return out_nodes, rows[perm]
