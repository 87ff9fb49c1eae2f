"""ReCur denoiser — the reference author's recurrent denoiser
(PostProcess/ReCurDenoiser/ReCur.compute:135-619, orchestrated by
ReCurDenoiser.cs `Do`, called from RayTracingMaster.cs:1113-1128).

Pass chain mirrored here (each pass is a jitted whole-image stencil —
the reference's seven dispatches become fused XLA map/reduce stages):

  1. SSAO        — screen-space ambient occlusion from the depth/normal
                   G-buffer (ReCur.compute `SSAO` kernel), spiral taps.
  2. SSAOFilter  — edge-aware 5x5 blur of the AO term.
  3. temporal    — reprojected exponential history with neighborhood
                   min/max clamping (ReCur `temporal`).
  4. BlurKernel  — edge-stopping multi-scale blur whose radius shrinks as
                   history converges (the "recurrent" part: the blurred
                   output is next frame's history).
  5. secondarytemporal — slower second accumulator on the blurred result
                   that suppresses residual flicker (ReCur
                   `secondarytemporal`).
  6. ColorKernel — re-modulate albedo and multiply AO.

State is an explicit pytree so the step jits/shards/checkpoints.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from truetrace_tpu.core.math import luminance

ALPHA_MAIN = 0.15
ALPHA_SECOND = 0.05
SSAO_RADIUS = 0.15       # fraction of depth
SSAO_TAPS = 8
SIGMA_N = 64.0
SIGMA_Z = 8.0


class ReCurState(NamedTuple):
    color: jnp.ndarray       # [H,W,3] primary history (demodulated)
    second: jnp.ndarray      # [H,W,3] secondary history
    hist_len: jnp.ndarray    # [H,W]
    normal: jnp.ndarray      # [H,W,3]
    depth: jnp.ndarray       # [H,W]
    ao: jnp.ndarray          # [H,W] AO history

    @staticmethod
    def create(h: int, w: int) -> "ReCurState":
        return ReCurState(color=jnp.zeros((h, w, 3), jnp.float32),
                          second=jnp.zeros((h, w, 3), jnp.float32),
                          hist_len=jnp.zeros((h, w), jnp.float32),
                          normal=jnp.zeros((h, w, 3), jnp.float32),
                          depth=jnp.zeros((h, w), jnp.float32),
                          ao=jnp.ones((h, w), jnp.float32))


def _shift(img, dy, dx):
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


def _ssao(normal, depth):
    """Screen-space AO: compare each pixel's depth against spiral-offset
    neighbors; nearer neighbors above the tangent plane occlude (ReCur
    `SSAO` kernel, simplified to a fixed tap set)."""
    ao = jnp.zeros_like(depth)
    total = 0.0
    offs = [(1, 0), (0, 1), (-1, 0), (0, -1),
            (2, 2), (-2, 2), (2, -2), (-2, -2)][:SSAO_TAPS]
    for i, (dy, dx) in enumerate(offs):
        s = 1 + (i // 4)          # grow radius on later taps
        zq = _shift(depth, dy * s, dx * s)
        dz = depth - zq           # >0: neighbor is closer (occluder)
        r = SSAO_RADIUS * jnp.maximum(depth, 1e-3)
        occ = jnp.clip(dz / r, 0.0, 1.0) * (dz > 1e-4)
        ao = ao + occ
        total += 1.0
    return jnp.clip(1.0 - ao / total, 0.0, 1.0)


def _ssao_filter(ao, normal, depth):
    """Edge-aware 5x5 AO blur (ReCur `SSAOFilter`)."""
    acc = jnp.zeros_like(ao)
    wacc = jnp.zeros_like(ao)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w_n = jnp.maximum(
                jnp.sum(normal * _shift(normal, dy, dx), -1), 0.0) ** 8
            w_z = jnp.exp(-jnp.abs(depth - _shift(depth, dy, dx))
                          / (0.05 * jnp.maximum(depth, 1e-3) + 1e-4))
            w = w_n * w_z
            acc = acc + _shift(ao, dy, dx) * w
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-6)


def _neighborhood_clamp(hist, cur):
    """3x3 min/max clamp of history against the current frame (the
    temporal kernel's anti-ghosting gate)."""
    lo = cur
    hi = cur
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            q = _shift(cur, dy, dx)
            lo = jnp.minimum(lo, q)
            hi = jnp.maximum(hi, q)
    return jnp.clip(hist, lo, hi)


def _edge_blur(color, normal, depth, hist_len, step: int):
    """Edge-stopping blur pass; weight falls off with history length so a
    converged history stops being blurred (ReCur `BlurKernel`)."""
    conv = jnp.clip(hist_len / 32.0, 0.0, 1.0)      # 0 young -> 1 converged
    acc = jnp.zeros_like(color)
    wacc = jnp.zeros_like(depth)
    lum = luminance(color)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            sy, sx = dy * step, dx * step
            w_n = jnp.maximum(
                jnp.sum(normal * _shift(normal, sy, sx), -1), 0.0) ** SIGMA_N
            w_z = jnp.exp(-jnp.abs(depth - _shift(depth, sy, sx))
                          / (jnp.maximum(depth, 1e-3) * 0.05 * step + 1e-4))
            w_l = jnp.exp(-jnp.abs(lum - _shift(lum, sy, sx))
                          / (0.5 + 4.0 * (1.0 - conv)))
            w = w_n * w_z * w_l
            if dy == 0 and dx == 0:
                w = jnp.ones_like(w)
            acc = acc + _shift(color, sy, sx) * w[..., None]
            wacc = wacc + w
    blurred = acc / jnp.maximum(wacc, 1e-6)[..., None]
    # converged pixels keep their history nearly untouched
    return blurred * (1.0 - conv)[..., None] + color * conv[..., None]


def recur_denoise(noisy: jnp.ndarray, albedo: jnp.ndarray,
                  normal: jnp.ndarray, depth: jnp.ndarray,
                  state: ReCurState,
                  motion: Optional[jnp.ndarray] = None,
                  emissive: Optional[jnp.ndarray] = None):
    """One ReCur frame. Returns (denoised [H,W,3], new_state).

    emissive: noise-free directly-visible radiance (stats["emitted0"]),
    passed through UNfiltered — same contract as svgf_denoise. Without
    it, emissive pixels (albedo ~ 0) demodulate their radiance by the
    albedo floor and the blur ladder leaks the blown-up values into
    neighbours (round-5 sequence matrix caught ReCur exploding to
    ~6000x from frame 1). The 0.05 floor matches svgf.py: near-black
    albedo must not amplify residual radiance."""
    if emissive is not None:
        noisy = jnp.maximum(noisy - emissive, 0.0)
    demod = noisy / jnp.maximum(albedo, 0.05)

    # ---- reproject history (nearest; static camera = identity)
    prev_color, prev_second, prev_len = state.color, state.second, \
        state.hist_len
    prev_n, prev_z, prev_ao = state.normal, state.depth, state.ao
    if motion is not None:
        H, W = depth.shape
        ys = jnp.clip(jnp.round(jnp.arange(H)[:, None] - motion[..., 1]).astype(jnp.int32),
                      0, H - 1)
        xs = jnp.clip(jnp.round(jnp.arange(W)[None, :] - motion[..., 0]).astype(jnp.int32),
                      0, W - 1)
        prev_color = prev_color[ys, xs]
        prev_second = prev_second[ys, xs]
        prev_len = prev_len[ys, xs]
        prev_n = prev_n[ys, xs]
        prev_z = prev_z[ys, xs]
        prev_ao = prev_ao[ys, xs]
    valid = (jnp.sum(normal * prev_n, axis=-1) > 0.9) \
        & (jnp.abs(depth - prev_z) < 0.1 * jnp.maximum(depth, 1e-3)) \
        & (prev_len > 0)
    hist_len = jnp.where(valid, prev_len + 1.0, 1.0)

    # ---- SSAO + filter + its own small temporal
    ao = _ssao_filter(_ssao(normal, depth), normal, depth)
    ao = jnp.where(valid, prev_ao * 0.9 + ao * 0.1, ao)

    # ---- primary temporal with neighborhood clamp
    a = jnp.maximum(ALPHA_MAIN, 1.0 / hist_len)[..., None]
    clamped = _neighborhood_clamp(prev_color, demod)
    color_t = jnp.where(valid[..., None],
                        clamped + a * (demod - clamped), demod)

    # ---- recurrent blur ladder (3 scales)
    color_b = color_t
    for i in range(3):
        color_b = _edge_blur(color_b, normal, depth, hist_len, 1 << i)

    # ---- secondary temporal on the blurred result
    a2 = jnp.maximum(ALPHA_SECOND, 1.0 / hist_len)[..., None]
    second = jnp.where(valid[..., None],
                       prev_second + a2 * (color_b - prev_second), color_b)

    out = second * jnp.maximum(albedo, 0.05) * ao[..., None]
    if emissive is not None:
        out = out + emissive
    new_state = ReCurState(color=color_b, second=second, hist_len=hist_len,
                           normal=normal, depth=depth, ao=ao)
    return out, new_state
