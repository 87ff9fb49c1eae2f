"""Scatter-free CWBVH wavefront traversal — the TPU fast path.

The first-cut traversal (kernels/cwbvh_ref.py) used per-ray stack *scatters*
(`stack.at[ray, sp].set`), which XLA lowers to row-serialized scatter on TPU
(~30 M updates/s — measured). This version is designed around what the
hardware actually does well, with the cost model re-measured on v5e:

* **row gathers are cheap and bandwidth-bound** (~1.0-1.3 ns/row at 36-120
  words — NOT latency-bound; see BASELINE.md), so the loop does exactly ONE
  row-gather per iteration from a unified [C+T, 36] table — descending
  lanes fetch their child-node row, leaf lanes their 3-triangle "triple"
  row (mutually exclusive per lane).
* **the real budget is VPU work per iteration** (stack shuffling, node
  decode, slab tests). The per-ray traversal group is therefore packed
  into THREE words — the classic CWBVH hits-mask encoding (Ylitie 2017,
  the reference's own GPU layout: CommonData.cginc:641-707):
      hits  u32: bits 24..31 = pending internal-child slots,
                 bits 0..23  = pending triangles (bit i = tri base_tri+i)
      chim  u32: base_child | imask << 24
      btri  i32: base_index_triangle
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
  2. lanes with pending tri bits gather the triple row at the lowest set
     bit and run up to 3 masked Moller tests (bit-gated).
  3. other lanes extract the nearest pending node slot, gather + decode
     the child node, slab-test its 8 quantized boxes against t_best, and
     make it the new current group (saving the remainder if non-empty).

The node layout contract is build/cwbvh.py's; triangle triples are built by
`pack_tri_triples` (row t = tris t, t+1, t+2 -> one gather covers a leaf).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.kernels.traverse_ref import Hit

U32 = jnp.uint32
MAX_STACK = 16        # one entry per tree level; CWBVH depth ~ log8(T)
TRI_MASK = U32(0x00FFFFFF)


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


def _decode_rows_to_group(w, ro, rd, inv_rd, t_best):
    """Decode pre-gathered node rows [R,>=20] u32 + slab-test the 8
    children. Returns the 3-word group (hits, chim, btri).

    Everything is computed on full-width [R] columns (single-column slices
    of the gathered rows + u32 shift/mask byte extraction). The "obvious"
    [R,8]/[R,3]/u8-bitcast formulation costs ~2x in TPU relayout traffic —
    measured, see BASELINE.md. Hit results of leaf slots are baked into the
    low 24 tri bits (unary count << offset) and internal slots into the
    high 8 bits — the reference's own GPU trick
    (CommonData.cginc:641-707)."""
    R = w.shape[0]
    col = lambda k: w[:, k]
    p = [jax.lax.bitcast_convert_type(col(k), jnp.float32) for k in range(3)]
    w3 = col(3)
    scale = [jax.lax.bitcast_convert_type(
        ((w3 >> U32(8 * k)) & U32(0xFF)) << 23, jnp.float32)
        for k in range(3)]
    imask = w3 >> 24
    base_child = col(4)
    base_tri = col(5).astype(jnp.int32)
    rox = [ro[:, k] for k in range(3)]
    invx = [inv_rd[:, k] for k in range(3)]
    m0, m1 = col(6), col(7)

    hits = jnp.zeros((R,), U32)
    for j in range(8):
        sh = U32(8 * (j % 4))
        m = ((m0 if j < 4 else m1) >> sh) & U32(0xFF)
        tn = jnp.full((R,), -jnp.inf)
        tf = jnp.full((R,), jnp.inf)
        for axis in range(3):
            lo_w = col((8 if j < 4 else 9) + 2 * axis)
            hi_w = col((14 if j < 4 else 15) + 2 * axis)
            qlo = ((lo_w >> sh) & U32(0xFF)).astype(jnp.float32)
            qhi = ((hi_w >> sh) & U32(0xFF)).astype(jnp.float32)
            lo = p[axis] + qlo * scale[axis]
            hi = p[axis] + qhi * scale[axis]
            t0 = (lo - rox[axis]) * invx[axis]
            t1 = (hi - rox[axis]) * invx[axis]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hitj = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best) & (m != 0)
        # leaf slot j contributes unary(count) << offset (bits 0..23);
        # internal slot j contributes bit 24+j (meta = 0b001_00000 | j)
        is_int = ((imask >> j) & U32(1)) == 1
        shift = jnp.where(is_int, U32(24 + j), m & U32(0x1F))
        hits = hits | jnp.where(hitj, (m >> 5) << shift, U32(0))
    chim = (base_child & TRI_MASK) | (imask << 24)
    return hits, chim, base_tri


_GKEYS = ("hits", "chim", "btri")


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
    hits, chim, btri = _decode_rows_to_group(
        nodes[root_ids], ro, rd, inv_rd, t_best)
    zero_u = jnp.zeros((R, max_stack), U32)
    return dict(
        ro=ro, rd=rd, inv=inv_rd, oct=oct_key,
        hits=hits, chim=chim, btri=btri,
        phits=zero_u, pchim=zero_u, pbtri=jnp.zeros((R, max_stack),
                                                    jnp.int32),
        sp=jnp.zeros((R,), jnp.int32),
        t=t_best, tri=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32), v=jnp.zeros((R,), jnp.float32),
        orig=jnp.arange(R, dtype=jnp.int32),
    )


def _active(st):
    return (st["hits"] != 0) | (st["sp"] > 0)


def _shift_pop(plane):
    return jnp.concatenate([plane[:, 1:], plane[:, :1] * 0], axis=1)


def _shift_push(plane, new_col):
    return jnp.concatenate([new_col[:, None], plane[:, :-1]], axis=1)


def _step(unified, T, C, any_hit, st):
    """One lock-step traversal iteration over the state dict (the loop body
    described in the module docstring)."""
    ro, rd, inv_rd, oct_key = st["ro"], st["rd"], st["inv"], st["oct"]
    hits, chim, btri, sp = st["hits"], st["chim"], st["btri"], st["sp"]
    t_best, tri_best, u_best, v_best = st["t"], st["tri"], st["u"], st["v"]

    # ---- 1. pop a saved group where the current one is exhausted
    pop = (hits == 0) & (sp > 0)
    hits = jnp.where(pop, st["phits"][:, 0], hits)
    chim = jnp.where(pop, st["pchim"][:, 0], chim)
    btri = jnp.where(pop, st["pbtri"][:, 0], btri)
    sp = sp - pop.astype(jnp.int32)

    # ---- 2. choose work: pending tris first (shrinks t_best before more
    # descents), else nearest node slot in octant order
    tri_bits = hits & TRI_MASK
    node_bits = hits >> 24
    active = hits != 0
    leaf_lane = active & (tri_bits != 0)
    descend = active & ~leaf_lane

    # leaf: lowest pending tri bit; one triple covers bits i..i+2
    lsb = tri_bits & (~tri_bits + U32(1))
    i_bit = jax.lax.population_count(lsb - U32(1)).astype(jnp.int32)
    t0i = jnp.clip(btri + i_bit, 0, T - 1)

    # node: extract nearest slot, child id = base + rank-in-imask
    slot, node_rest = _extract_slot(node_bits, oct_key)
    imask = chim >> 24
    below = imask & ((U32(1) << slot.astype(U32)) - U32(1))
    rank = jax.lax.population_count(below).astype(jnp.int32)
    child = jnp.clip((chim & TRI_MASK).astype(jnp.int32) + rank, 0, C - 1)

    # ---- 3. THE gather: leaf lanes fetch their triple row, descending
    # lanes fetch their child-node row — one unified-table access
    row_idx = jnp.where(leaf_lane, C + t0i, jnp.where(descend, child, 0))
    row = unified[row_idx]                              # [R,36] u32

    # ---- 3a. leaf lanes: <=3 Moller tests, gated by their pending bits.
    # Fully scalarized on [R] columns — [R,3] slices of the gathered row
    # cost ~2x in relayout traffic (measured, BASELINE.md).
    tripf = jax.lax.bitcast_convert_type(row, jnp.float32)
    tcol = lambda k: tripf[:, k]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    for j in range(3):
        b = 12 * j
        p0x, p0y, p0z = tcol(b), tcol(b + 1), tcol(b + 2)
        e1x, e1y, e1z = tcol(b + 3), tcol(b + 4), tcol(b + 5)
        e2x, e2y, e2z = tcol(b + 6), tcol(b + 7), tcol(b + 8)
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
        gate = ((tri_bits >> (i_bit + j).astype(U32)) & U32(1)) == 1
        ok = (leaf_lane & gate & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (th > 1e-4) & (th < t_best)
              & (jnp.abs(det) > 1e-12))
        t_best = jnp.where(ok, th, t_best)
        tri_best = jnp.where(ok, t0i + j, tri_best)
        u_best = jnp.where(ok, u, u_best)
        v_best = jnp.where(ok, v, v_best)
    hits_leaf = hits & ~((U32(0b111) << i_bit.astype(U32)) & TRI_MASK)

    # ---- 3b. descending lanes: stack update then swap in the child.
    # pop applies first, then push on the popped state (a lane may pop AND
    # push in one iteration — pushing onto the pre-pop stack would
    # resurrect the popped entry and drop the deepest one).
    rest = node_rest << 24          # tri bits drained before any descent
    push = descend & (node_rest != 0)
    for key, saved in (("phits", rest), ("pchim", chim),
                       ("pbtri", btri)):
        plane = st[key]
        based = jnp.where(pop[:, None], _shift_pop(plane), plane)
        pushed = _shift_push(based, saved.astype(plane.dtype))
        st[key] = jnp.where(push[:, None], pushed, based)
    sp = sp + push.astype(jnp.int32)

    # decode + slab the child row for descending lanes (no extra gather —
    # `row` already holds it; leaf lanes' rows are garbage as node data
    # but fully masked out by `descend`)
    c_hits, c_chim, c_btri = _decode_rows_to_group(row[:, :20], ro, rd,
                                                   inv_rd, t_best)
    hits = jnp.where(descend, c_hits, jnp.where(leaf_lane, hits_leaf, hits))
    chim = jnp.where(descend, c_chim, chim)
    btri = jnp.where(descend, c_btri, btri)

    if any_hit:
        found = tri_best >= 0
        hits = jnp.where(found, U32(0), hits)
        sp = jnp.where(found, 0, sp)

    return dict(st, hits=hits, chim=chim, btri=btri, sp=sp,
                t=t_best, tri=tri_best, u=u_best, v=v_best)


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
    assert C < (1 << 24), "chim packs base_child into 24 bits"
    unified = _pack_table(nodes, tri_triple)
    st = _init_state(nodes, ro, rd, t_max, root, max_stack)
    st = _run_stage(unified, T, C, any_hit, st, 0)
    return Hit(t=st["t"], tri=st["tri"], u=st["u"], v=st["v"])


def _traverse_cascade(nodes, tri_triple, ro, rd, t_max, any_hit: bool,
                      max_stack: int, root=0, stages: int = 8):
    """Occupancy-cascade traversal (see module docstring)."""
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
