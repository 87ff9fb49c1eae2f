"""ASVGF: adaptive SVGF driven by sparse temporal gradient samples.

Counterpart of the reference's ASVGF chain (PostProcess/ASVGF.compute:
`Reproject` forward-projects 1-in-9 pixels' previous-frame RNG so the new
frame re-traces the *same* random decisions; `Gradient_Img` +
`Gradient_Atrous` estimate a temporal gradient that drives the history
clamp in `Temporal`; wrapper PostProcess/ASVGF.cs:181-232).

TPU realization is cleaner than the reference's: our RNG is a pure counter
stream, so "re-tracing last frame's decisions" is literally rendering a
pixel stratum with the previous sample id — no RNG buffer shuffling. Where
the luminance of that replay differs from what last frame actually saw,
something changed (lighting, geometry, materials): the gradient
discounts the temporal history exactly there, while static regions keep
their long history.
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


class ASVGFState(NamedTuple):
    svgf: SVGFState
    prev_lum: jnp.ndarray       # [Hs,Ws] luminance seen last frame at the
                                # gradient stratum (with last frame's sid)
    prev_sid: jnp.ndarray       # [] uint32

    @staticmethod
    def create(h: int, w: int) -> "ASVGFState":
        return ASVGFState(svgf=SVGFState.create(h, w),
                          prev_lum=jnp.zeros((h // STRATUM, w // STRATUM),
                                             jnp.float32),
                          prev_sid=jnp.uint32(0))


def _stratum_pixels(h: int, w: int):
    ys = jnp.arange(h // STRATUM) * STRATUM + 1
    xs = jnp.arange(w // STRATUM) * STRATUM + 1
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")
    return (Y * w + X).reshape(-1).astype(jnp.uint32)


def asvgf_gradient(scene, cam, cfg: RenderConfig, state: ASVGFState,
                   sample_id, rad_flat):
    """Replay-gradient estimation only (no denoise): re-trace the 1-in-9
    stratum with last frame's sample id and compare against the luminance
    the previous frame actually saw there. Returns (alpha_map [H,W],
    grad_full [H,W], new_prev_lum, sid) — lets a composed frame reuse its
    main trace (renderer.step) instead of re-rendering."""
    H, W = cfg.height, cfg.width
    sid = jnp.asarray(sample_id, jnp.uint32)
    strat = _stratum_pixels(H, W)
    Hs, Ws = H // STRATUM, W // STRATUM
    replay, _ = render_sample_with_stats(scene, cam, cfg, strat,
                                         state.prev_sid)
    lum_replay = luminance(replay).reshape(Hs, Ws)
    # temporal gradient: replayed luminance vs what the previous frame saw
    denom = jnp.maximum(jnp.maximum(lum_replay, state.prev_lum), 1e-4)
    grad_s = jnp.abs(lum_replay - state.prev_lum) / denom
    # 3x3 max-dilate then upsample to full res
    g = grad_s
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            g = jnp.maximum(g, jnp.roll(jnp.roll(grad_s, dy, 0), dx, 1))
    grad_full = jnp.repeat(jnp.repeat(g, STRATUM, 0), STRATUM, 1)[:H, :W]
    alpha_map = jnp.clip(ALPHA_MIN + grad_full * (ALPHA_MAX - ALPHA_MIN),
                         ALPHA_MIN, ALPHA_MAX)
    cur_lum = luminance(rad_flat[strat.astype(jnp.int32)]).reshape(Hs, Ws)
    return alpha_map, grad_full, cur_lum, sid


def asvgf_step(scene, cam, cfg: RenderConfig, state: ASVGFState,
               sample_id):
    """Render + denoise one frame. Returns (denoised, new_state, aux)."""
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
    out, svgf_state = svgf_denoise(img, albedo, normal, depth, state.svgf,
                                   alpha_map=alpha_map)
    new_state = ASVGFState(svgf=svgf_state, prev_lum=cur_lum, prev_sid=sid)
    return out, new_state, {"gradient": grad_full, "alpha": alpha_map}


def restir_asvgf_step(scene, cam, cfg: RenderConfig, restir_state,
                      svgf_state: SVGFState, sample_id, prev_cam=None):
    """ReSTIR-ASVGF: the ASVGF filter driven by the gradients the ReSTIR
    temporal validation already produces, instead of a separate replay
    stratum (reference ReSTIRASVGF.compute — same pipeline, no Reproject
    pass; gradients written by ReSTIRGI.compute:159-192).

    Returns (denoised [H,W,3], new_restir_state, new_svgf_state, aux)."""
    from truetrace_tpu.integrate.restir import restir_gi_step

    H, W = cfg.height, cfg.width
    img, new_restir, aux = restir_gi_step(scene, cam, cfg, restir_state,
                                          sample_id, prev_cam=prev_cam)
    # dilate the sparse validation gradient like the reference's
    # Gradient_Atrous, then map to a history-clamp alpha
    g = aux["gradient"]
    gd = g
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            gd = jnp.maximum(gd, jnp.roll(jnp.roll(g, dy, 0), dx, 1))
    alpha_map = jnp.clip(ALPHA_MIN + gd * (ALPHA_MAX - ALPHA_MIN),
                         ALPHA_MIN, ALPHA_MAX)

    # G-buffer for the edge-stopping filter: the ReSTIR pass already
    # produced it (aux carries albedo/normal/depth) — no extra trace
    out, new_svgf = svgf_denoise(
        img, aux["albedo"], aux["normal"], aux["depth"],
        svgf_state, alpha_map=alpha_map)
    return out, new_restir, new_svgf, {"gradient": gd, "alpha": alpha_map}
