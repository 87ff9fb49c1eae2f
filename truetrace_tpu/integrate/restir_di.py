"""ReSTIR DI: reservoir-based spatiotemporal reuse of direct-light samples.

The reference's direct lighting picks RIS candidates per shade
(`SelectLightMeshSmart` / RIS count setting, CommonData.cginc:861-1006) and
its ReSTIR GI pipeline reuses indirect samples; this module completes the
family with streaming RIS + temporal + spatial reuse over LIGHT samples
(Bitterli et al. 2020), the natural extension the reference's RIS path
points at.

Sample representation: a point on an emissive triangle (position, normal,
radiance), stored in AREA measure — spatial reuse between receivers then
needs no Jacobian (the sample is fixed on the light; only the target
function is re-evaluated). Target p_hat = luminance(Le) * G(x1 <-> y)
(BSDF-free, like the GI pipeline; the full BSDF multiplies once at final
shading, exactly the reference's deferred-evaluation trick).

All reservoirs are image-shaped pytrees; randomness is the same counter
RNG as the tracer, so replays/multi-chip runs are deterministic.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from truetrace_tpu.core import rng
from truetrace_tpu.core.math import dot, luminance, safe_div
from truetrace_tpu.integrate.pathtrace import (
    RenderConfig, _occluded, gather_material, get_bsdf,
    render_sample_with_stats)
from truetrace_tpu.scene.ir import Camera, Scene

M_CAP = 32.0
SPATIAL_TAPS = ((2, 1), (-1, 2), (-2, -1), (1, -2))
DEPTH_GATE = 0.1
NORMAL_GATE = 0.9


class ReSTIRDIState(NamedTuple):
    pos: jnp.ndarray     # [H,W,3] point on light
    ln: jnp.ndarray      # [H,W,3] light normal
    rad: jnp.ndarray     # [H,W,3] emitted radiance
    M: jnp.ndarray       # [H,W]
    W: jnp.ndarray       # [H,W] unbiased contribution weight (area measure)
    normal: jnp.ndarray  # [H,W,3] receiver G-buffer of last frame
    depth: jnp.ndarray   # [H,W]

    @staticmethod
    def create(h: int, w: int) -> "ReSTIRDIState":
        z3 = jnp.zeros((h, w, 3), jnp.float32)
        z1 = jnp.zeros((h, w), jnp.float32)
        return ReSTIRDIState(pos=z3, ln=z3, rad=z3, M=z1, W=z1,
                             normal=z3, depth=z1)


def _p_hat(x1, n1, pos, ln, rad):
    """Target: luminance(Le) * G = lum * cos1 * cos_l / d^2 (area
    measure, unshadowed)."""
    d = pos - x1
    d2 = jnp.maximum(dot(d, d), 1e-8)
    inv = jax.lax.rsqrt(d2)
    wi = d * inv[..., None]
    cos1 = jnp.maximum(dot(wi, n1), 0.0)
    cos_l = jnp.maximum(-dot(wi, ln), 0.0)
    return luminance(rad) * cos1 * cos_l / d2


def restir_di_reservoirs(scene: Scene, cam: Camera, cfg: RenderConfig,
                         state: ReSTIRDIState, sample_id,
                         x1, n1, depth,
                         n_candidates: int = 8, n_spatial: int = 1,
                         prev_cam: Optional[Camera] = None, motion=None):
    """RIS + temporal + spatial reservoir reuse over light samples.

    x1/n1/depth: this frame's primary G-buffer images [H,W(,3)]. Returns
    (di_sample dict {pos, ln, rad [R,3], W [R]} flattened for
    pathtrace.trace_rays, new_state). Final shading (BSDF + visibility)
    happens inside the path tracer's bounce-0 NEE, which consumes
    di_sample — like the reference's RIS feeding NEE
    (CommonData.cginc:861)."""
    H, W = cfg.height, cfg.width
    pixel = jnp.arange(H * W, dtype=jnp.uint32)
    sid = jnp.asarray(sample_id, jnp.uint32)
    has_surf = depth > 0

    lt = scene.light_tris
    L = lt.tri_index.shape[0]
    pix2 = pixel.reshape(H, W)

    def u1(dim):
        return rng.uniform1(pix2, sid, jnp.uint32(dim)).astype(jnp.float32)

    def u2(dim):
        return rng.uniform2(pix2, sid, jnp.uint32(dim))

    # ---- streaming RIS over n_candidates fresh light samples
    r_pos = jnp.zeros((H, W, 3), jnp.float32)
    r_ln = jnp.zeros((H, W, 3), jnp.float32)
    r_rad = jnp.zeros((H, W, 3), jnp.float32)
    wsum = jnp.zeros((H, W), jnp.float32)
    for k in range(n_candidates):
        us = u1(300 + 3 * k)
        uv = u2(301 + 3 * k)
        idx = jnp.clip(jnp.searchsorted(lt.cdf, us), 0, L - 1)
        pmf = lt.pmf[idx]
        tid = lt.tri_index[idx]
        p0 = scene.tri_p0[tid]
        e1 = scene.tri_e1[tid]
        e2 = scene.tri_e2[tid]
        su = jnp.sqrt(uv[..., 0])
        b1 = 1.0 - su
        b2 = uv[..., 1] * su
        pos = p0 + e1 * b1[..., None] + e2 * b2[..., None]
        gn = jnp.cross(e1, e2)
        area2 = jnp.linalg.norm(gn, axis=-1)
        ln = gn / jnp.maximum(area2, 1e-20)[..., None]
        area = 0.5 * area2
        rad = scene.materials.emission[scene.tri_mat[tid]]
        pdf_area = safe_div(pmf, jnp.maximum(area, 1e-12))
        ph = _p_hat(x1, n1, pos, ln, rad)
        w = jnp.where(has_surf & (pdf_area > 0),
                      safe_div(ph, pdf_area), 0.0)
        new_wsum = wsum + w
        take = (u1(302 + 3 * k) * jnp.maximum(new_wsum, 1e-20)) < w
        r_pos = jnp.where(take[..., None], pos, r_pos)
        r_ln = jnp.where(take[..., None], ln, r_ln)
        r_rad = jnp.where(take[..., None], rad, r_rad)
        wsum = new_wsum
    M = jnp.full((H, W), float(n_candidates), jnp.float32)

    # ---- temporal reuse (motion-reprojected)
    prev = state
    if prev_cam is not None or motion is not None:
        if motion is None:
            from truetrace_tpu.post.motion import motion_vectors
            mv = motion_vectors(prev_cam, cam, depth)
        else:
            mv = motion
        ys = jnp.clip(jnp.round(jnp.arange(H)[:, None] - mv[..., 1]).astype(jnp.int32),
                      0, H - 1)
        xs = jnp.clip(jnp.round(jnp.arange(W)[None, :] - mv[..., 0]).astype(jnp.int32),
                      0, W - 1)
        inb = ((jnp.arange(H)[:, None] - mv[..., 1] >= 0)
               & (jnp.arange(H)[:, None] - mv[..., 1] < H)
               & (jnp.arange(W)[None, :] - mv[..., 0] >= 0)
               & (jnp.arange(W)[None, :] - mv[..., 0] < W))
        prev = ReSTIRDIState(
            pos=state.pos[ys, xs], ln=state.ln[ys, xs],
            rad=state.rad[ys, xs],
            M=jnp.where(inb, state.M[ys, xs], 0.0), W=state.W[ys, xs],
            normal=state.normal[ys, xs], depth=state.depth[ys, xs])
    hist_ok = (jnp.sum(n1 * prev.normal, axis=-1) > NORMAL_GATE) \
        & (jnp.abs(depth - prev.depth)
           < DEPTH_GATE * jnp.maximum(depth, 1e-3)) & (prev.M > 0)
    M_prev = jnp.where(hist_ok, jnp.minimum(prev.M, M_CAP), 0.0)
    ph_prev = _p_hat(x1, n1, prev.pos, prev.ln, prev.rad)
    w_prev = prev.W * M_prev * ph_prev
    new_wsum = wsum + w_prev
    take = (u1(340) * jnp.maximum(new_wsum, 1e-20)) < w_prev
    r_pos = jnp.where(take[..., None], prev.pos, r_pos)
    r_ln = jnp.where(take[..., None], prev.ln, r_ln)
    r_rad = jnp.where(take[..., None], prev.rad, r_rad)
    wsum = new_wsum
    M = M + M_prev
    ph_sel = _p_hat(x1, n1, r_pos, r_ln, r_rad)
    Wout = jnp.where(ph_sel > 1e-12,
                     safe_div(wsum, M * jnp.maximum(ph_sel, 1e-12)), 0.0)

    # ---- spatial reuse (no Jacobian: samples live in area measure)
    for sp in range(n_spatial):
        wsum = Wout * M * _p_hat(x1, n1, r_pos, r_ln, r_rad)
        acc_M = M
        for k, (dy0, dx0) in enumerate(SPATIAL_TAPS):
            dy, dx = dy0 * (sp + 1), dx0 * (sp + 1)
            nb = lambda a: jnp.roll(jnp.roll(a, dy, 0), dx, 1)
            # roll wraps at image borders; gate out taps whose source
            # coordinate falls outside the frame (edge reservoirs must not
            # merge with the opposite edge)
            ys = jnp.arange(H)[:, None] - dy
            xs = jnp.arange(W)[None, :] - dx
            inb = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
            ok = inb & (jnp.sum(n1 * nb(n1), axis=-1) > NORMAL_GATE) \
                & (jnp.abs(depth - nb(depth))
                   < DEPTH_GATE * jnp.maximum(depth, 1e-3)) \
                & (nb(M) > 0) & (nb(Wout) > 0)
            ph_n = _p_hat(x1, n1, nb(r_pos), nb(r_ln), nb(r_rad))
            M_n = jnp.where(ok, jnp.minimum(nb(M), M_CAP), 0.0)
            w_n = jnp.where(ok, nb(Wout) * M_n * ph_n, 0.0)
            new_wsum = wsum + w_n
            take = (u1(350 + sp * 8 + k)
                    * jnp.maximum(new_wsum, 1e-20)) < w_n
            r_pos = jnp.where(take[..., None], nb(r_pos), r_pos)
            r_ln = jnp.where(take[..., None], nb(r_ln), r_ln)
            r_rad = jnp.where(take[..., None], nb(r_rad), r_rad)
            wsum = new_wsum
            acc_M = acc_M + M_n
        M = acc_M
        ph_sel = _p_hat(x1, n1, r_pos, r_ln, r_rad)
        Wout = jnp.where(ph_sel > 1e-12,
                         safe_div(wsum, M * jnp.maximum(ph_sel, 1e-12)),
                         0.0)

    new_state = ReSTIRDIState(pos=r_pos, ln=r_ln, rad=r_rad, M=M, W=Wout,
                              normal=n1, depth=depth)
    flat = lambda a, c=None: a.reshape((-1,) if c is None else (-1, c))
    di_sample = {
        "pos": flat(r_pos, 3), "ln": flat(r_ln, 3), "rad": flat(r_rad, 3),
        "W": flat(jnp.where(has_surf, Wout, 0.0)),
    }
    return di_sample, new_state


def restir_di_step(scene: Scene, cam: Camera, cfg: RenderConfig,
                   state: ReSTIRDIState, sample_id,
                   n_candidates: int = 8, n_spatial: int = 1,
                   prev_cam: Optional[Camera] = None):
    """One standalone ReSTIR-DI frame: a 1-bounce G-buffer prepass feeds
    reservoir reuse, then the FULL path trace (cfg.bounces) runs with the
    reservoir samples driving its bounce-0 mesh-light NEE — so indirect
    illumination is included, unlike a direct-only preview. Returns
    (image [H,W,3], new_state, aux)."""
    H, W = cfg.height, cfg.width
    pixel = jnp.arange(H * W, dtype=jnp.uint32)
    sid = jnp.asarray(sample_id, jnp.uint32)
    gcfg = cfg.replace(bounces=1, use_nee=False, restir_capture=True)
    emitted, st = render_sample_with_stats(scene, cam, gcfg, pixel, sid)

    def im(x, c=None):
        return x.reshape((H, W) if c is None else (H, W, c))

    di_sample, new_state = restir_di_reservoirs(
        scene, cam, cfg, state, sid, im(st["x1"], 3), im(st["normal"], 3),
        im(st["depth"]), n_candidates=n_candidates, n_spatial=n_spatial,
        prev_cam=prev_cam)
    rad, _ = render_sample_with_stats(scene, cam, cfg, pixel, sid,
                                      di_sample=di_sample)
    img = jnp.nan_to_num(im(rad, 3), nan=0.0, posinf=0.0)
    return img, new_state, {"emitted": im(emitted, 3)}
