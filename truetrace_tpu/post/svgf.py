"""SVGF denoiser: temporal accumulation + variance-guided a-trous filtering.

Counterpart of the reference's SVGF/ASVGF family (PostProcess/Compute/
SVGF.compute:67-568 copy/reproject/variance/atrous/finalize; the ASVGF
wrapper chain PostProcess/ASVGF.cs:232). TPU design: each pass is one
jitted stencil over the whole image (XLA fuses the 5x5 taps into vector
code; the reference's ping-pong RT juggling becomes pure-functional array
returns).

State is explicit and pytree-shaped (works under jit / shard_map / scan):
  SVGFState: color history [H,W,3], moments history [H,W,2],
             history length [H,W], prev normal/depth G-buffer.

Static-camera reprojection is the identity (motion-vector reprojection
lands with the animated-scene milestone; the API already takes `motion`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from truetrace_tpu.core.math import luminance

ALPHA_COLOR = 0.2
ALPHA_MOMENTS = 0.2
EPS_NORMAL = 1e-3
SIGMA_Z = 1.0
SIGMA_N = 128.0
SIGMA_L = 4.0


class SVGFState(NamedTuple):
    color: jnp.ndarray      # [H,W,3] filtered-history (demodulated)
    moments: jnp.ndarray    # [H,W,2] first/second luminance moments
    hist_len: jnp.ndarray   # [H,W]
    normal: jnp.ndarray     # [H,W,3]
    depth: jnp.ndarray      # [H,W]

    @staticmethod
    def create(h: int, w: int) -> "SVGFState":
        return SVGFState(color=jnp.zeros((h, w, 3), jnp.float32),
                         moments=jnp.zeros((h, w, 2), jnp.float32),
                         hist_len=jnp.zeros((h, w), jnp.float32),
                         normal=jnp.zeros((h, w, 3), jnp.float32),
                         depth=jnp.zeros((h, w), jnp.float32))


def _shift(img, dy, dx):
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


def _edge_weights(normal, depth, lum, var, dy, dx, step):
    """Edge-stopping weights against the (dy,dx)-shifted neighbor."""
    n_q = _shift(normal, dy, dx)
    z_q = _shift(depth, dy, dx)
    l_q = _shift(lum, dy, dx)
    w_n = jnp.maximum(jnp.sum(normal * n_q, axis=-1), 0.0) ** SIGMA_N
    dz = jnp.abs(depth - z_q)
    w_z = jnp.exp(-dz / (SIGMA_Z * abs(step) * (jnp.abs(depth) * 0.02 + 1e-2)
                         + 1e-8))
    w_l = jnp.exp(-jnp.abs(lum - l_q)
                  / (SIGMA_L * jnp.sqrt(jnp.maximum(var, 1e-10)) + 1e-8))
    return w_n * w_z * w_l


# 5x5 B3-spline a-trous kernel (separable 1/16,1/4,3/8,1/4,1/16)
_K1D = (1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16)


def _var_prefilter3(var):
    """3x3 Gaussian prefilter of the variance used for the luminance
    edge-stopping sigma (the original SVGF paper's variance prefilter):
    without it a stable-zero pixel has var ~ 0, rejects every bright
    neighbor and stays black forever — the dark-speckle artifact."""
    acc = jnp.zeros_like(var)
    wsum = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = (2.0 if dy == 0 else 1.0) * (2.0 if dx == 0 else 1.0)
            acc = acc + _shift(var, dy, dx) * k
            wsum += k
    return acc / wsum


def _atrous_pass(color, var, normal, depth, step: int):
    lum = luminance(color)
    var_w = _var_prefilter3(var)
    acc_c = jnp.zeros_like(color)
    acc_v = jnp.zeros_like(var)
    acc_w = jnp.zeros_like(var)
    for i, ky in enumerate(_K1D):
        for j, kx in enumerate(_K1D):
            dy = (i - 2) * step
            dx = (j - 2) * step
            k = ky * kx
            w = _edge_weights(normal, depth, lum, var_w, dy, dx, step) * k
            if dy == 0 and dx == 0:
                w = jnp.full_like(w, k)
            acc_c = acc_c + _shift(color, dy, dx) * w[..., None]
            acc_v = acc_v + _shift(var, dy, dx) * (w * w)
            acc_w = acc_w + w
    inv = 1.0 / jnp.maximum(acc_w, 1e-8)
    return acc_c * inv[..., None], acc_v * inv * inv


def svgf_denoise(noisy: jnp.ndarray, albedo: jnp.ndarray,
                 normal: jnp.ndarray, depth: jnp.ndarray,
                 state: SVGFState, n_atrous: int = 5,
                 motion: Optional[jnp.ndarray] = None,
                 alpha_map: Optional[jnp.ndarray] = None,
                 emissive: Optional[jnp.ndarray] = None):
    """One frame of SVGF. Returns (denoised [H,W,3], new_state).

    noisy: raw per-frame radiance; albedo/normal/depth: primary G-buffer
    (integrator stats). motion: [H,W,2] pixel offsets (None = static).
    alpha_map: optional per-pixel temporal blend override (ASVGF gradients
    drive this — post/asvgf.py). emissive: noise-free directly-visible
    radiance (stats["emitted0"]) — passed through UNfiltered; filtering
    it would duplicate light-source energy into neighbors."""
    if emissive is not None:
        noisy = jnp.maximum(noisy - emissive, 0.0)
    # demodulate albedo so the filter works on irradiance. The floor is
    # 0.05 (not 1e-3): near-black albedo would amplify residual radiance
    # (specular on dark surfaces) ~1000x into single-pixel speckles; the
    # re-modulation below uses the same floor so the round trip is exact
    demod = noisy / jnp.maximum(albedo, 0.05)
    lum = luminance(demod)

    # ---- temporal reprojection + validity (normal/depth similarity gate,
    # reference SVGF reproject pass)
    prev_color = state.color
    prev_moments = state.moments
    prev_len = state.hist_len
    if motion is not None:
        # gather history at p - motion (nearest)
        H, W = depth.shape
        ys = jnp.clip(jnp.round(jnp.arange(H)[:, None] - motion[..., 1]).astype(jnp.int32),
                      0, H - 1)
        xs = jnp.clip(jnp.round(jnp.arange(W)[None, :] - motion[..., 0]).astype(jnp.int32),
                      0, W - 1)
        prev_color = prev_color[ys, xs]
        prev_moments = prev_moments[ys, xs]
        prev_len = prev_len[ys, xs]
        prev_n = state.normal[ys, xs]
        prev_z = state.depth[ys, xs]
    else:
        prev_n = state.normal
        prev_z = state.depth
    valid = (jnp.sum(normal * prev_n, axis=-1) > 0.9) \
        & (jnp.abs(depth - prev_z) < 0.1 * jnp.maximum(depth, 1e-3)) \
        & (prev_len > 0)

    hist_len = jnp.where(valid, prev_len + 1.0, 1.0)
    base_a = ALPHA_COLOR if alpha_map is None else alpha_map
    hist_len = hist_len if alpha_map is None else \
        jnp.minimum(hist_len, 1.0 / jnp.maximum(alpha_map, 1e-3))
    a_c = jnp.maximum(base_a, 1.0 / hist_len)
    a_m = jnp.maximum(ALPHA_MOMENTS if alpha_map is None else alpha_map,
                      1.0 / hist_len)
    color_t = jnp.where(valid[..., None],
                        prev_color + a_c[..., None] * (demod - prev_color),
                        demod)
    mom = jnp.stack([lum, lum * lum], axis=-1)
    moments_t = jnp.where(valid[..., None],
                          prev_moments + a_m[..., None] * (mom - prev_moments),
                          mom)

    # RCRS firefly clamp on the TEMPORALLY INTEGRATED signal (reference
    # runs FireFlyPass around its filters): the normalized bilateral
    # a-trous otherwise DUPLICATES single-pixel spike energy into every
    # neighbor that accepts it, inflating the mean ~3x whenever history
    # resets (measured). Clamping the raw INPUT instead was measured to
    # blacken sparse-radiance regions: with ~40% zero-radiance pixels per
    # frame (hard indirect scenes), a lone lit pixel among zero neighbors
    # lost its energy BEFORE temporal integration, leaving permanent dark
    # speckles. It is additionally gated on SHORT history (< 4 frames):
    # at steady state the temporal mean is the unbiased estimate and
    # clamping it against neighbors re-introduced an energy loss on
    # sparse signals (measured: a p=0.05 spike field converged to 0.48x
    # its true mean with an ungated clamp — tests/test_svgf.py).
    nmax = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = _shift(color_t, dy, dx)
            nmax = n if nmax is None else jnp.maximum(nmax, n)
    color_t = jnp.where((hist_len < 4.0)[..., None],
                        jnp.minimum(color_t, nmax * 3.0 + 1e-3), color_t)

    # variance: temporal when history is long enough, else 7x7 spatial
    var_t = jnp.maximum(moments_t[..., 1] - moments_t[..., 0] ** 2, 0.0)
    sp_m = jnp.zeros_like(moments_t)
    sp_w = jnp.zeros_like(lum)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            k = jnp.exp(-0.5 * (dy * dy + dx * dx) / 4.0)
            sp_m = sp_m + _shift(mom, dy, dx) * k
            sp_w = sp_w + k
    sp_m = sp_m / sp_w[..., None]
    var_sp = jnp.maximum(sp_m[..., 1] - sp_m[..., 0] ** 2, 0.0)
    var = jnp.where(hist_len >= 4.0, var_t, var_sp)

    # ---- a-trous iterations; 1st filtered result feeds the history
    # (Pallas VMEM-resident kernel on TPU when the frame fits, else XLA:
    # kernels/atrous_pallas.py)
    from truetrace_tpu.kernels.atrous_pallas import atrous_pass_auto
    color_f = color_t
    new_hist_color = color_t
    for i in range(n_atrous):
        color_f, var = atrous_pass_auto(color_f, var, normal, depth, 1 << i)
        if i == 0:
            new_hist_color = color_f

    out = color_f * jnp.maximum(albedo, 0.05)
    if emissive is not None:
        out = out + emissive
    new_state = SVGFState(color=new_hist_color, moments=moments_t,
                          hist_len=hist_len, normal=normal, depth=depth)
    return out, new_state
