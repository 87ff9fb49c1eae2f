"""Pallas TPU kernel: fused CWBVH traversal step core (Moller + decode).

The wavefront traversal's per-iteration VPU work — three scalarized
Moller-Trumbore tests plus the 8-slot bf16 slab decode
(kernels/cwbvh_wavefront.py `_step`) — is memory-layout bound under XLA:
the ~30 column reads of the transposed row block plus the slab/Moller
arithmetic lower to separate fusion groups with relayout traffic between
them (measured 274 + 58 us per 64k-lane iteration, BASELINE.md round-2
ablation). This kernel keeps the whole row block and all per-lane state
in VMEM and emits one fused program: one HBM read per input, one write
per output.

Layout contract (lane-major, R = batch width):
  rowt [32, R] u32 : transposed unified-table row (30 words + 2 pad) —
                     the expand_nodes/pack_leaf_rows layout
  ray9 [9, R] f32  : ro(0..2), rd(3..5), inv_rd(6..8) — loop-invariant
  st5  [5, R] u32  : t_best (f32 bits), tri_best (i32), u, v (f32 bits),
                     leaf_lane (0/1)
  out  [7, R] u32  : t, tri, u, v, c_hits, c_chim, c_bleaf

The traversal loop (pop/extract/push shift-register stacks) stays in
XLA; only the data-parallel core is fused here. Enabled by
TT_PALLAS_STEP=1 (cwbvh_wavefront._step); bit-identical to the XLA path
(tests/test_step_pallas.py).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32


def _kernel(write_uv: bool, rowt_ref, ray_ref, st_ref, out_ref):
    f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    u32 = lambda x: jax.lax.bitcast_convert_type(x, U32)
    tcol = lambda k: f32(rowt_ref[k, :])
    ucol = lambda k: rowt_ref[k, :]

    rox, roy, roz = ray_ref[0, :], ray_ref[1, :], ray_ref[2, :]
    rdx, rdy, rdz = ray_ref[3, :], ray_ref[4, :], ray_ref[5, :]
    invx = [ray_ref[6, :], ray_ref[7, :], ray_ref[8, :]]
    t_best = f32(st_ref[0, :])
    tri_best = jax.lax.bitcast_convert_type(st_ref[1, :], jnp.int32)
    u_best = f32(st_ref[2, :])
    v_best = f32(st_ref[3, :])
    leaf_lane = st_ref[4, :] != 0

    # ---- <=3 Moller-Trumbore tests (cwbvh_wavefront._step 3a)
    for j in range(3):
        b = 9 * j
        p0x, p0y, p0z = tcol(b), tcol(b + 1), tcol(b + 2)
        e1x, e1y, e1z = tcol(b + 3), tcol(b + 4), tcol(b + 5)
        e2x, e2y, e2z = tcol(b + 6), tcol(b + 7), tcol(b + 8)
        tri_id = jax.lax.bitcast_convert_type(ucol(27 + j), jnp.int32)
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
        if write_uv:
            u_best = jnp.where(ok, u, u_best)
            v_best = jnp.where(ok, v, v_best)

    # ---- 8-slot conservative-bf16 slab decode (_decode_cols), against
    # the POST-Moller t_best (leaves shrink t before more descents)
    chim = ucol(24)
    bleaf = ucol(25)
    imask = chim >> 24
    occ = imask | (bleaf >> 24)
    rox3 = [rox, roy, roz]
    hits = jnp.zeros_like(chim)
    for j in range(8):
        wi = j >> 1
        lo_sh = U32(16 * (j & 1))
        tn = jnp.full_like(t_best, -jnp.inf)
        tf = jnp.full_like(t_best, jnp.inf)
        for axis in range(3):
            lo_w = ucol(8 * axis + wi)
            hi_w = ucol(8 * axis + 4 + wi)
            lo = f32(((lo_w >> lo_sh) & U32(0xFFFF)) << 16)
            hi = f32(((hi_w >> lo_sh) & U32(0xFFFF)) << 16)
            t0 = (lo - rox3[axis]) * invx[axis]
            t1 = (hi - rox3[axis]) * invx[axis]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hitj = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best) \
            & (((occ >> j) & U32(1)) == 1)
        is_int = ((imask >> j) & U32(1)) == 1
        bit = jnp.where(is_int, U32(1 << (24 + j)), U32(1 << j))
        hits = hits | jnp.where(hitj, bit, U32(0))

    out_ref[0, :] = u32(t_best)
    out_ref[1, :] = u32(tri_best)
    out_ref[2, :] = u32(u_best)
    out_ref[3, :] = u32(v_best)
    out_ref[4, :] = hits
    out_ref[5, :] = chim
    out_ref[6, :] = bleaf


@partial(jax.jit, static_argnames=("write_uv",))
def step_core(rowt, ray9, st5, write_uv: bool = True):
    """Fused Moller+decode. rowt [32,R] u32, ray9 [9,R] f32, st5 [5,R]
    u32 -> out [7,R] u32 (layout in the module docstring). Gridded over
    the lane axis in blocks (whole-batch blocks OOM the 16 MB VMEM at
    64k lanes); R must be a multiple of 1024 (cwbvh_wavefront gates)."""
    R = rowt.shape[1]
    blk = 8192 if R % 8192 == 0 else 1024
    grid = (R // blk,)
    return pl.pallas_call(
        partial(_kernel, write_uv),
        out_shape=jax.ShapeDtypeStruct((7, R), U32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((32, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(rowt, ray9, st5)
