"""MXU brute-force intersection: ray-triangle tests as dense matmuls.

The TPU's matrix unit does 100+ TFLOP/s; its weakness is gathers. For
small-to-medium triangle sets the fastest traversal is *no* traversal:
precompute each triangle's Woop unit-triangle transform, and the whole
ray-set x tri-set intersection becomes six [R,4] x [4,T] matmuls plus a
streaming min-reduction — no BVH, no gathers, no divergence.

Woop transform: M = inverse([e1 e2 n]) maps world points into the
triangle's unit space; a ray (o, d) hits where
  t = -oz'/dz',  u = ox' + t dx',  v = oy' + t dy'
with o' = M(o - p0), d' = M d. Each of the six primed scalars is an affine
function of (o) or linear in (d) with per-tri coefficients — i.e. one row
of a dense [R,4] x [4,T] product.

Selected via RenderConfig(traversal="brute"); compile_scene packs the Woop
table only for scenes below BRUTE_MAX_TRIS (Cornell-class). Also the
building block for the planned cluster-streamed tracer (bin rays to
treelets, stream each treelet's tris through the MXU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.kernels.traverse_ref import Hit

BRUTE_MAX_TRIS = 4096
T_TILE = 512            # stream tris in tiles; keeps [R, T_TILE] blocks hot


def pack_woop(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """[T,24] rows: for axis k in (x,y,z): (m_k[3], c_k) for origin rows,
    then the same m_k reused for direction rows. Host-side."""
    T = p0.shape[0]
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)            # [T,3,3] columns e1,e2,n
    # singular tris: fall back to identity (they will simply never hit)
    det = np.linalg.det(A)
    bad = np.abs(det) < 1e-18
    A[bad] = np.eye(3)
    M = np.linalg.inv(A)                          # [T,3,3]
    c = -np.einsum("tij,tj->ti", M, p0)           # [T,3]
    out = np.zeros((T, 24), np.float32)
    out[:, 0:3] = M[:, 0, :]
    out[:, 3] = c[:, 0]
    out[:, 4:7] = M[:, 1, :]
    out[:, 7] = c[:, 1]
    out[:, 8:11] = M[:, 2, :]
    out[:, 11] = c[:, 2]
    out[:, 12] = bad
    return out


@partial(jax.jit, static_argnames=("any_hit",))
def intersect_brute(woop: jnp.ndarray, ro, rd, t_max,
                    any_hit: bool = False) -> Hit:
    """woop [T,24] from pack_woop; ro/rd [R,3]; t_max scalar or [R]."""
    R = ro.shape[0]
    T = woop.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    ro4 = jnp.concatenate([ro, jnp.ones((R, 1), jnp.float32)], axis=1)

    n_tiles = -(-T // T_TILE)
    pad = n_tiles * T_TILE - T
    woop_p = jnp.pad(woop, ((0, pad), (0, 0)),
                     constant_values=0.0)
    # padded rows get bad=1 so they never hit
    if pad:
        woop_p = woop_p.at[T:, 12].set(1.0)
    woop_t = woop_p.reshape(n_tiles, T_TILE, 24)

    def tile(carry, wt):
        t_best, tri_best, u_best, v_best, base = carry
        mo = jnp.stack([wt[:, 0:4], wt[:, 4:8], wt[:, 8:12]], 0)  # [3,Tt,4]
        # origin-prime rows: [R,4] @ [4,Tt] per axis. HIGHEST precision is
        # required: TPU matmuls default to bf16 multiplicands, whose 8-bit
        # mantissa quantizes hit distances into visible ring artifacts.
        op = jnp.einsum("rk,atk->art", ro4, mo,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)     # [3,R,Tt]
        dp = jnp.einsum("rk,atk->art", rd, mo[:, :, :3],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        dz = dp[2]
        inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
        t = -op[2] * inv_dz
        u = op[0] + t * dp[0]
        v = op[1] + t * dp[1]
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t > 1e-4) & (t < t_best[:, None])
              & (jnp.abs(dz) > 1e-10) & (wt[None, :, 12] < 0.5))
        t_ok = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_ok, axis=1)
        rows = jnp.arange(R)
        hit = ok[rows, j]
        tb = t_ok[rows, j]
        take = hit & (tb < t_best)
        t_best = jnp.where(take, tb, t_best)
        tri_best = jnp.where(take, base + j, tri_best)
        u_best = jnp.where(take, u[rows, j], u_best)
        v_best = jnp.where(take, v[rows, j], v_best)
        return (t_best, tri_best, u_best, v_best, base + wt.shape[0]), None

    init = (t_max, jnp.full((R,), -1, jnp.int32),
            jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.float32),
            jnp.int32(0))
    (t_best, tri_best, u_best, v_best, _), _ = jax.lax.scan(
        tile, init, woop_t)
    return Hit(t=t_best, tri=tri_best, u=u_best, v=v_best)


def any_hit_brute(woop: jnp.ndarray, ro, rd, t_max):
    hit = intersect_brute(woop, ro, rd, t_max)
    return hit.tri >= 0
