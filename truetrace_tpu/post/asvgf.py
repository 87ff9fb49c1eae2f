"""ASVGF: adaptive SVGF driven by sparse temporal gradient samples.

Counterpart of the reference's ASVGF chain (PostProcess/ASVGF.compute —
kernels at :177 CopyData, :408 Reproject, :603 Gradient_Img, :711
Gradient_Atrous x7, :797 Temporal, :1166 Atrous_LF, :1377 Atrous; wrapper
PostProcess/ASVGF.cs:181-232). Structure reproduced here, TPU-shaped:

* **Replay stratum** (1-in-9 pixels): our RNG is a pure counter stream,
  so "re-trace last frame's random decisions" is literally rendering the
  stratum with the previous sample id — no RNG-buffer forward projection
  (the reference's Reproject pass) is needed.
* **Gradient image at 1/3 res** (Gradient_Img): relative luminance
  difference between the replay and what last frame actually saw.
* **Gradient a-trous chain** (Gradient_Atrous x N): the sparse gradient
  is diffused into a dense, smooth "how stale is history here" field —
  this is what distinguishes ASVGF from a per-pixel clamp.
* **Temporal pass with gradient-driven history clamp** (Temporal): the
  filtered gradient bounds the effective history length per pixel.
* **LF/HF split** (CopyData + Atrous_LF + Atrous): the demodulated
  irradiance is split into a 1/3-res low-frequency field (filtered with
  wide a-trous passes at low res + long history — the role of the
  reference's SH LF channel) and a full-res high-frequency residual
  (filtered by the variance-guided SVGF chain). Composite re-modulates
  albedo. The reference's spherical-harmonic LF encoding is replaced by
  an RGB LF field: on TPU the bandwidth saving of SH does not apply
  (everything is f32 vector lanes), while the frequency split itself is
  what controls the filter footprints.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from truetrace_tpu.core.math import luminance
from truetrace_tpu.integrate.pathtrace import (
    RenderConfig, render_sample_with_stats)
from truetrace_tpu.post.svgf import SVGFState, svgf_denoise

STRATUM = 3           # 1-in-9 gradient pixels, like the reference
ALPHA_MIN = 0.05
ALPHA_MAX = 1.0
N_GRAD_ATROUS = 5     # reference runs 7 at 1/3 res; 5 covers a 31-cell
                      # footprint at stratum res (~93 px) — same reach
N_LF_ATROUS = 4       # reference: 1 + 4 Atrous_LF iterations
LF_ALPHA = 0.1        # LF temporal blend (long history)


class ASVGFState(NamedTuple):
    svgf: SVGFState             # HF chain state (moments, history)
    prev_lum: jnp.ndarray       # [Hs,Ws] stratum luminance of last frame
    prev_sid: jnp.ndarray       # [] uint32
    lf_hist: jnp.ndarray        # [Hl,Wl,3] low-frequency history
    lf_len: jnp.ndarray         # [Hl,Wl] LF history length

    @staticmethod
    def create(h: int, w: int) -> "ASVGFState":
        hs, ws = h // STRATUM, w // STRATUM
        hl, wl = -(-h // STRATUM), -(-w // STRATUM)
        return ASVGFState(svgf=SVGFState.create(h, w),
                          prev_lum=jnp.zeros((hs, ws), jnp.float32),
                          prev_sid=jnp.uint32(0),
                          lf_hist=jnp.zeros((hl, wl, 3), jnp.float32),
                          lf_len=jnp.zeros((hl, wl), jnp.float32))


def _stratum_pixels(h: int, w: int):
    ys = jnp.arange(h // STRATUM) * STRATUM + 1
    xs = jnp.arange(w // STRATUM) * STRATUM + 1
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")
    return (Y * w + X).reshape(-1).astype(jnp.uint32)


def _shift(img, dy, dx):
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


_K1D = (1 / 4, 1 / 2, 1 / 4)


def gradient_atrous(grad, n_passes: int = N_GRAD_ATROUS):
    """Diffuse the sparse stratum gradient into a smooth field (reference
    Gradient_Atrous x7 at 1/3 res): max-preserving weighted a-trous so a
    single changed cell discounts the history of its neighborhood."""
    g = grad
    for it in range(n_passes):
        step = 1 << it
        acc = jnp.zeros_like(g)
        wacc = jnp.zeros_like(g)
        for i, ky in enumerate(_K1D):
            for j, kx in enumerate(_K1D):
                k = ky * kx
                n = _shift(g, (i - 1) * step, (j - 1) * step)
                acc = acc + n * k
                wacc = wacc + k
        # blend diffusion with a max-dilate so peaks survive the chain
        g = jnp.maximum(acc / wacc, 0.7 * g)
    return g


def _down3(img):
    """3x3 box downsample to stratum resolution (edge-padded)."""
    H, W = img.shape[:2]
    ph = (-H) % STRATUM
    pw = (-W) % STRATUM
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2),
                      mode="edge")
    hl, wl = img.shape[0] // STRATUM, img.shape[1] // STRATUM
    return img.reshape((hl, STRATUM, wl, STRATUM) + img.shape[2:]
                       ).mean(axis=(1, 3))


def _up3(img, h, w):
    up = jnp.repeat(jnp.repeat(img, STRATUM, 0), STRATUM, 1)
    return up[:h, :w]


def _lf_atrous(lf, depth_l, n_passes: int = N_LF_ATROUS):
    """Wide a-trous at 1/3 res, depth-edge-stopped (reference Atrous_LF)."""
    out = lf
    for it in range(n_passes):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros((out.shape[0], out.shape[1]), out.dtype)
        for i, ky in enumerate(_K1D):
            for j, kx in enumerate(_K1D):
                k = ky * kx
                dz = jnp.abs(depth_l - _shift(depth_l, (i - 1) * step,
                                              (j - 1) * step))
                wz = jnp.exp(-dz / (jnp.abs(depth_l) * 0.05 + 1e-2))
                wgt = k * jnp.where((i, j) == (1, 1),
                                    jnp.ones_like(wz), wz)
                acc = acc + _shift(out, (i - 1) * step,
                                   (j - 1) * step) * wgt[..., None]
                wacc = wacc + wgt
        out = acc / jnp.maximum(wacc, 1e-8)[..., None]
    return out


def asvgf_gradient(scene, cam, cfg: RenderConfig, state: ASVGFState,
                   sample_id, rad_flat):
    """Stratum replay + gradient estimation + gradient a-trous chain.
    Returns (alpha_map [H,W], grad_full [H,W], new_prev_lum, sid)."""
    H, W = cfg.height, cfg.width
    sid = jnp.asarray(sample_id, jnp.uint32)
    strat = _stratum_pixels(H, W)
    Hs, Ws = H // STRATUM, W // STRATUM
    replay, _ = render_sample_with_stats(scene, cam, cfg, strat,
                                         state.prev_sid)
    lum_replay = luminance(replay).reshape(Hs, Ws)
    denom = jnp.maximum(jnp.maximum(lum_replay, state.prev_lum), 1e-4)
    grad_s = jnp.abs(lum_replay - state.prev_lum) / denom
    g = gradient_atrous(grad_s)
    grad_full = jnp.repeat(jnp.repeat(g, STRATUM, 0), STRATUM, 1)[:H, :W]
    if grad_full.shape != (H, W):
        grad_full = jnp.pad(grad_full,
                            ((0, H - grad_full.shape[0]),
                             (0, W - grad_full.shape[1])), mode="edge")
    alpha_map = jnp.clip(ALPHA_MIN + grad_full * (ALPHA_MAX - ALPHA_MIN),
                         ALPHA_MIN, ALPHA_MAX)
    cur_lum = luminance(rad_flat[strat.astype(jnp.int32)]).reshape(Hs, Ws)
    return alpha_map, grad_full, cur_lum, sid


def gradient_alpha(gradient, h, w):
    """Map an arbitrary full-res sparse gradient image (e.g. ReSTIR
    validation gradients) through the stratum-res a-trous chain to a
    history-clamp alpha map."""
    gl = _down3(gradient) * (STRATUM * STRATUM)   # sparse cells -> density
    gl = gradient_atrous(jnp.clip(gl, 0.0, 1.0))
    gf = _up3(gl, h, w)
    return jnp.clip(ALPHA_MIN + gf * (ALPHA_MAX - ALPHA_MIN),
                    ALPHA_MIN, ALPHA_MAX), gf


def asvgf_filter(img, albedo, normal, depth, state: ASVGFState,
                 alpha_map, motion=None, emissive=None):
    """LF/HF split filtering (reference CopyData/Atrous_LF/Atrous):
    returns (filtered [H,W,3], new_svgf_state, new_lf_hist, new_lf_len).
    emissive: directly-visible radiance, passed through unfiltered."""
    H, W = depth.shape
    if emissive is not None:
        img = jnp.maximum(img - emissive, 0.0)
    demod = img / jnp.maximum(albedo, 0.05)

    # ---- LF: 1/3-res field, long gradient-clamped history, wide filter
    lf_cur = _down3(demod)
    depth_l = _down3(depth)
    a_l = jnp.maximum(LF_ALPHA, _down3(alpha_map))
    lf_len = jnp.minimum(state.lf_len + 1.0,
                         1.0 / jnp.maximum(a_l, 1e-3))
    a_eff = jnp.maximum(a_l, 1.0 / jnp.maximum(lf_len, 1.0))
    lf_t = jnp.where((state.lf_len > 0)[..., None],
                     state.lf_hist + a_eff[..., None]
                     * (lf_cur - state.lf_hist), lf_cur)
    lf_f = _lf_atrous(lf_t, depth_l)
    lf_full = _up3(lf_f, H, W)

    # ---- HF: full-res residual through the variance-guided SVGF chain
    hf = (demod - lf_full) * jnp.maximum(albedo, 0.05)
    hf_f, new_svgf = svgf_denoise(hf, albedo, normal, depth, state.svgf,
                                  alpha_map=alpha_map, motion=motion)
    out = jnp.maximum(lf_full * jnp.maximum(albedo, 0.05) + hf_f, 0.0)
    if emissive is not None:
        out = out + emissive
    return out, new_svgf, lf_t, lf_len


def asvgf_step(scene, cam, cfg: RenderConfig, state: ASVGFState,
               sample_id):
    """Render + full ASVGF denoise. Returns (denoised, new_state, aux)."""
    H, W = cfg.height, cfg.width
    sid = jnp.asarray(sample_id, jnp.uint32)
    pixel = jnp.arange(H * W, dtype=jnp.uint32)
    rad, st = render_sample_with_stats(scene, cam, cfg, pixel, sid)
    img = rad.reshape(H, W, 3)
    albedo = st["albedo"].reshape(H, W, 3)
    normal = st["normal"].reshape(H, W, 3)
    depth = st["depth"].reshape(H, W)

    alpha_map, grad_full, cur_lum, sid = asvgf_gradient(
        scene, cam, cfg, state, sid, rad)
    out, new_svgf, lf_hist, lf_len = asvgf_filter(
        img, albedo, normal, depth, state, alpha_map,
        emissive=st["emitted0"].reshape(H, W, 3))
    new_state = ASVGFState(svgf=new_svgf, prev_lum=cur_lum, prev_sid=sid,
                           lf_hist=lf_hist, lf_len=lf_len)
    return out, new_state, {"gradient": grad_full, "alpha": alpha_map}


def restir_asvgf_step(scene, cam, cfg: RenderConfig, restir_state,
                      state, sample_id, prev_cam=None):
    """ReSTIR-ASVGF: the ASVGF filter driven by the gradients the ReSTIR
    temporal validation already produces, instead of a separate replay
    stratum (reference ReSTIRASVGF.compute — same pipeline, no Reproject
    pass; gradients written by ReSTIRGI.compute:159-192).

    `state` may be an ASVGFState (full LF/HF pipeline) or a bare
    SVGFState (legacy; HF-only filtering). Returns
    (denoised [H,W,3], new_restir_state, new_state, aux)."""
    from truetrace_tpu.integrate.restir import restir_gi_step

    H, W = cfg.height, cfg.width
    img, new_restir, aux = restir_gi_step(scene, cam, cfg, restir_state,
                                          sample_id, prev_cam=prev_cam)
    alpha_map, gf = gradient_alpha(aux["gradient"], H, W)
    if isinstance(state, ASVGFState):
        out, new_svgf, lf_hist, lf_len = asvgf_filter(
            img, aux["albedo"], aux["normal"], aux["depth"], state,
            alpha_map, emissive=aux.get("emitted0"))
        new_state = ASVGFState(svgf=new_svgf, prev_lum=state.prev_lum,
                               prev_sid=jnp.asarray(sample_id, jnp.uint32),
                               lf_hist=lf_hist, lf_len=lf_len)
    else:
        out, new_state = svgf_denoise(
            img, aux["albedo"], aux["normal"], aux["depth"], state,
            alpha_map=alpha_map)
    return out, new_restir, new_state, {"gradient": gf, "alpha": alpha_map}
