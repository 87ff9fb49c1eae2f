"""Heightfield ray tracing (reference kernel_heightmap /
kernel_shadow_heightmap, IntersectionKernels.compute:513-710).

The reference sphere-traces each terrain per thread. The TPU version is a
lock-step fixed-budget march: clip the ray batch to the terrain AABB, take
N uniform steps looking for a sign change of f(t) = ray_y(t) - h(x(t),z(t))
(bilinear height fetch = 4 one-word row gathers from the flat height
array), then refine the bracketing interval with a fixed bisection ladder.
Fixed iteration counts mean one traced XLA program with no divergence;
idle lanes are masked.

Returns world-space hit t, surface normal (analytic bilinear gradient),
terrain UV in [0,1]^2 and the blended layer weights for the shade stage.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from truetrace_tpu.scene.terrain import Terrain

MARCH_STEPS = 96
BISECT_STEPS = 10


class TerrainHit(NamedTuple):
    t: jnp.ndarray        # [R] hit distance (t_max when miss)
    valid: jnp.ndarray    # [R] bool
    normal: jnp.ndarray   # [R,3]
    uv: jnp.ndarray       # [R,2]


def _sample_height(ter: Terrain, x, z):
    """Bilinear world-space height at world (x, z). Clamps to the grid
    edge (the reference clamps its heightmap sampler the same way)."""
    Hm, Wm = ter.hm_shape
    fx = (x - ter.origin[0]) / ter.size[0] * (Wm - 1)
    fz = (z - ter.origin[2]) / ter.size[1] * (Hm - 1)
    fx = jnp.clip(fx, 0.0, Wm - 1.001)
    fz = jnp.clip(fz, 0.0, Hm - 1.001)
    ix = fx.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    wx = fx - ix
    wz = fz - iz
    base = iz * Wm + ix
    h00 = ter.height[base]
    h01 = ter.height[base + 1]
    h10 = ter.height[base + Wm]
    h11 = ter.height[base + Wm + 1]
    return ((h00 * (1 - wx) + h01 * wx) * (1 - wz)
            + (h10 * (1 - wx) + h11 * wx) * wz)


def _normal(ter: Terrain, x, z):
    """Central-difference normal with one-cell spacing."""
    Hm, Wm = ter.hm_shape
    dx = ter.size[0] / (Wm - 1)
    dz = ter.size[1] / (Hm - 1)
    gx = (_sample_height(ter, x + dx, z) - _sample_height(ter, x - dx, z)) \
        / (2 * dx)
    gz = (_sample_height(ter, x, z + dz) - _sample_height(ter, x, z - dz)) \
        / (2 * dz)
    n = jnp.stack([-gx, jnp.ones_like(gx), -gz], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def _aabb_clip(ter: Terrain, ro, rd, t_max):
    lo = ter.origin
    hi = jnp.stack([ter.origin[0] + ter.size[0],
                    ter.origin[1] + ter.h_max,
                    ter.origin[2] + ter.size[1]])
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                          jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    t0 = (lo[None] - ro) * inv
    t1 = (hi[None] - ro) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tn = jnp.maximum(tn, 0.0)
    tf = jnp.minimum(tf, t_max)
    return tn, tf, tf >= tn


@partial(jax.jit, static_argnames=("steps", "bisect"))
def heightmap_closest(ter: Terrain, ro, rd, t_max,
                      steps: int = MARCH_STEPS,
                      bisect: int = BISECT_STEPS) -> TerrainHit:
    """Closest-hit march. ro/rd [R,3]; t_max scalar or [R]."""
    R = ro.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tn, tf, inside = _aabb_clip(ter, ro, rd, t_max)
    dt = jnp.where(inside, (tf - tn) / steps, 0.0)

    def f_at(t):
        p = ro + rd * t[:, None]
        return p[:, 1] - _sample_height(ter, p[:, 0], p[:, 2])

    f0 = f_at(tn)

    def march(i, carry):
        lo, hi, found, f_prev, t_prev = carry
        t = tn + dt * (i + 1.0)
        f = f_at(t)
        # surface crossing in either direction (rays may start below)
        crossed = inside & ~found & (jnp.sign(f) != jnp.sign(f_prev))
        lo = jnp.where(crossed, t_prev, lo)
        hi = jnp.where(crossed, t, hi)
        return lo, hi, found | crossed, f, t

    lo, hi, found, _, _ = jax.lax.fori_loop(
        0, steps, march, (tn, tf, jnp.zeros((R,), bool), f0, tn))

    def refine(_, carry):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fm = f_at(mid)
        same = jnp.sign(fm) == jnp.sign(flo)
        lo = jnp.where(same, mid, lo)
        flo = jnp.where(same, fm, flo)
        hi = jnp.where(same, hi, mid)
        return lo, hi, flo

    lo, hi, _ = jax.lax.fori_loop(0, bisect, refine,
                                  (lo, hi, f_at(lo)))
    t_hit = 0.5 * (lo + hi)
    p = ro + rd * t_hit[:, None]
    n = _normal(ter, p[:, 0], p[:, 2])
    uv = jnp.stack([(p[:, 0] - ter.origin[0]) / ter.size[0],
                    (p[:, 2] - ter.origin[2]) / ter.size[1]], axis=-1)
    t_out = jnp.where(found, t_hit, t_max)
    return TerrainHit(t=t_out, valid=found, normal=n,
                      uv=jnp.clip(uv, 0.0, 1.0))


def heightmap_any(ter: Terrain, ro, rd, t_max,
                  steps: int = MARCH_STEPS) -> jnp.ndarray:
    """Any-hit (shadow) variant: cheaper (no bisection/normal)."""
    hit = heightmap_closest(ter, ro, rd, t_max, steps=steps, bisect=1)
    return hit.valid


def sample_layers(ter: Terrain, uv):
    """Bilinear alphamap fetch -> [R,4] layer weights (normalized), the
    input to the terrain material blend (RayTracingShader.compute:587-616)."""
    A0, A1 = ter.alphamap.shape[0], ter.alphamap.shape[1]
    fz = jnp.clip(uv[:, 1] * (A0 - 1), 0.0, A0 - 1.001)
    fx = jnp.clip(uv[:, 0] * (A1 - 1), 0.0, A1 - 1.001)
    iz = fz.astype(jnp.int32)
    ix = fx.astype(jnp.int32)
    wz = (fz - iz)[:, None]
    wx = (fx - ix)[:, None]
    a00 = ter.alphamap[iz, ix]
    a01 = ter.alphamap[iz, ix + 1]
    a10 = ter.alphamap[iz + 1, ix]
    a11 = ter.alphamap[iz + 1, ix + 1]
    w = (a00 * (1 - wx) + a01 * wx) * (1 - wz) \
        + (a10 * (1 - wx) + a11 * wx) * wz
    live = (ter.mat_ids >= 0).astype(jnp.float32)[None]
    w = w * live
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)
