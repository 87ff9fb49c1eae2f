"""ReSTIR GI: reservoir-based spatiotemporal sample reuse for indirect light.

Counterpart of the reference's ReSTIR GI pipeline (ReSTIRGI.compute:
temporal kernel :120-250 with reservoir merge `UpdateReservoir` :94-102 and
M-cap; spatial kernel :253-389 with vogel-disk taps and geometric
similarity gates; candidate generation via the shade kernel's path trace).
TPU redesign: reservoirs are image-shaped pytree arrays, every pass is a
pure function image -> image (`jnp.roll` neighbor taps instead of scattered
texture fetches), randomness is the same counter-based stream as the
tracer.

Sample representation ("reconnection shift"): a reservoir pixel stores the
second path vertex x2 (position + normal) and the outgoing radiance L of
that vertex toward the receiver. Reuse at a different receiver x1'
re-evaluates the BSDF toward x2 and applies the solid-angle Jacobian
|cos(theta2')/d'^2| / |cos(theta2)/d^2| — the same re-evaluation trick the
reference implements as ReconstructDisney (Materials.cginc:934-981).

Target function p_hat = luminance(L) * max(0, cos(theta1)): cheap, BSDF-free
(the full BSDF re-eval happens once at shading time, like the reference's
final spatial pass).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from truetrace_tpu.core import rng
from truetrace_tpu.core.math import dot, luminance, normalize, safe_div
from truetrace_tpu.integrate.pathtrace import (
    RenderConfig, _occluded, gather_material, get_bsdf,
    render_sample_with_stats)
from truetrace_tpu.scene.ir import Camera, Scene

M_CAP = 20.0
SPATIAL_TAPS = ((3, 1), (-2, 3), (-3, -2), (2, -3))
DEPTH_GATE = 0.1
NORMAL_GATE = 0.9


class ReSTIRState(NamedTuple):
    x2: jnp.ndarray      # [H,W,3] sample point
    n2: jnp.ndarray      # [H,W,3] sample normal
    rad: jnp.ndarray     # [H,W,3] outgoing radiance of x2 toward receiver
    M: jnp.ndarray       # [H,W]
    W: jnp.ndarray       # [H,W] unbiased contribution weight
    normal: jnp.ndarray  # [H,W,3] receiver G-buffer of last frame
    depth: jnp.ndarray   # [H,W]

    @staticmethod
    def create(h: int, w: int) -> "ReSTIRState":
        z3 = jnp.zeros((h, w, 3), jnp.float32)
        z1 = jnp.zeros((h, w), jnp.float32)
        return ReSTIRState(x2=z3, n2=z3, rad=z3, M=z1, W=z1,
                           normal=z3, depth=z1)


def _p_hat(x1, n1, x2, rad):
    """Target function at receiver (x1, n1) for sample (x2, rad)."""
    to_s = x2 - x1
    d2 = jnp.maximum(dot(to_s, to_s), 1e-8)
    wi = to_s * jax.lax.rsqrt(d2)[..., None]
    cos1 = jnp.maximum(dot(wi, n1), 0.0)
    return luminance(rad) * cos1


def _jacobian(x1_from, x1_to, x2, n2):
    """Solid-angle reconnection Jacobian when moving a sample created at
    receiver x1_from to receiver x1_to."""
    def geom(x1):
        d = x1 - x2
        d2 = jnp.maximum(dot(d, d), 1e-8)
        cos2 = jnp.abs(dot(d * jax.lax.rsqrt(d2)[..., None], n2))
        return cos2 / d2
    return jnp.clip(safe_div(geom(x1_to), geom(x1_from)), 0.0, 10.0)


def restir_gi_step(scene: Scene, cam: Camera, cfg: RenderConfig,
                   state: ReSTIRState, sample_id, n_spatial: int = 2,
                   prev_cam: Camera = None, motion=None):
    """One ReSTIR GI frame. Returns (image [H,W,3], new_state, aux).

    image = direct lighting (path-traced, bounce 0) + reservoir-shaded
    indirect. cfg.restir_capture must be True. prev_cam: last frame's
    camera — enables motion-vector history reprojection (post/motion.py);
    None = static camera."""
    pixel = jnp.arange(cfg.height * cfg.width, dtype=jnp.uint32)
    sid = jnp.asarray(sample_id, jnp.uint32)
    _, st = render_sample_with_stats(scene, cam, cfg, pixel, sid)
    return restir_gi_from_stats(scene, cam, cfg, state, sid, st,
                                n_spatial=n_spatial, prev_cam=prev_cam,
                                motion=motion)


def restir_gi_from_stats(scene: Scene, cam: Camera, cfg: RenderConfig,
                         state: ReSTIRState, sample_id, st,
                         n_spatial: int = 2, prev_cam: Camera = None,
                         motion=None):
    """Reservoir update + final shade from an already-traced frame's
    capture dict `st` (render_sample_with_stats with restir_capture=True).
    Lets a composed frame (renderer.step) share ONE wavefront trace
    between the integrator, ReSTIR GI and the denoisers — the reference
    does the same: one bounce loop feeds reservoirs and denoiser inputs
    (RayTracingMaster.cs:954-1131)."""
    H, W = cfg.height, cfg.width
    pixel = jnp.arange(H * W, dtype=jnp.uint32)
    sid = jnp.asarray(sample_id, jnp.uint32)

    def im(x, c=None):
        return x.reshape((H, W) if c is None else (H, W, c))

    direct = im(st["direct"], 3)
    x1 = im(st["x1"], 3)
    n1 = im(st["normal"], 3)
    depth = im(st["depth"])
    mat1 = im(st["mat1"])
    # candidate: incoming radiance from the x2 direction (indirect /
    # first-bounce throughput), valid where the path reached a 2nd vertex
    tp1 = im(st["tp1"], 3)
    L_cand = safe_div(im(st["indirect"], 3),
                      jnp.maximum(tp1, 1e-6))
    x2_c = im(st["x2"], 3)
    n2_c = im(st["n2"], 3)
    pdf1 = im(st["pdf1"])
    cand_ok = im(st["cand_valid"]).astype(bool) & (pdf1 > 1e-9) \
        & (depth > 0)

    # ---- RIS weight of the fresh candidate: w = p_hat / p
    p_hat_c = _p_hat(x1, n1, x2_c, L_cand)
    w_c = jnp.where(cand_ok, safe_div(p_hat_c, pdf1), 0.0)

    pix2 = pixel.reshape(H, W)

    def u(dim):
        return rng.uniform1(pix2, sid, jnp.uint32(dim)).astype(jnp.float32)

    # ---- history reprojection (motion vectors from the camera pair —
    # the reference's per-pixel motion reprojection, ReSTIRGI.compute:
    # 120-160; static camera = identity)
    prev = state
    if prev_cam is not None or motion is not None:
        # motion: externally supplied per-pixel vectors (renderer.step
        # passes per-OBJECT motion for instanced scenes); fallback =
        # camera-only analytic vectors
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
        prev = ReSTIRState(
            x2=state.x2[ys, xs], n2=state.n2[ys, xs],
            rad=state.rad[ys, xs],
            M=jnp.where(inb, state.M[ys, xs], 0.0),
            W=state.W[ys, xs],
            normal=state.normal[ys, xs], depth=state.depth[ys, xs])

    # ---- temporal merge, gated on the reprojected receiver G-buffer
    hist_ok = (jnp.sum(n1 * prev.normal, axis=-1) > NORMAL_GATE) \
        & (jnp.abs(depth - prev.depth)
           < DEPTH_GATE * jnp.maximum(depth, 1e-3)) \
        & (prev.M > 0)
    M_prev = jnp.where(hist_ok, jnp.minimum(prev.M, M_CAP), 0.0)

    # ---- temporal validation (the reference's ExtraSampleValidation +
    # gradient write, ReSTIRGI.compute:161-192): where this frame's fresh
    # path re-found the SAME second vertex, a large luminance change means
    # the stored radiance is stale -> drop the history and report a
    # gradient for the denoiser's history clamp
    same_x2 = (jnp.linalg.norm(x2_c - prev.x2, axis=-1)
               < 0.02 * jnp.maximum(depth, 1.0)) & cand_ok & hist_ok
    lum_old = luminance(prev.rad)
    lum_new = luminance(L_cand)
    denom = jnp.maximum(jnp.maximum(lum_old, lum_new), 1e-4)
    gradient = jnp.where(same_x2,
                         jnp.abs(lum_new - lum_old) / denom, 0.0)
    stale = same_x2 & (gradient > 0.5)
    M_prev = jnp.where(stale, 0.0, M_prev)

    p_hat_prev = _p_hat(x1, n1, prev.x2, prev.rad)
    wsum_prev = prev.W * M_prev * p_hat_prev
    wsum = wsum_prev + w_c
    take_c = (u(101) * jnp.maximum(wsum, 1e-20)) < w_c
    take_c = take_c | (M_prev <= 0)
    res_x2 = jnp.where(take_c[..., None], x2_c, prev.x2)
    res_n2 = jnp.where(take_c[..., None], n2_c, prev.n2)
    res_rad = jnp.where(take_c[..., None], L_cand, prev.rad)
    res_M = M_prev + 1.0
    p_hat_sel = _p_hat(x1, n1, res_x2, res_rad)
    res_W = safe_div(wsum, res_M * jnp.maximum(p_hat_sel, 1e-9))
    res_W = jnp.where(p_hat_sel > 1e-9, res_W, 0.0)

    # ---- spatial passes
    for sp in range(n_spatial):
        wsum = res_W * res_M * _p_hat(x1, n1, res_x2, res_rad)
        acc_M = res_M
        cur = (res_x2, res_n2, res_rad)
        for k, (dy0, dx0) in enumerate(SPATIAL_TAPS):
            dy = dy0 * (sp + 1)
            dx = dx0 * (sp + 1)
            nb = lambda a: jnp.roll(jnp.roll(a, dy, 0), dx, 1)
            # in-bounds gate (roll wraps at borders) + same-material gate
            # (the reference gates neighbor merges on material identity
            # too, ReSTIRGI.compute:319 — reservoirs must not bleed
            # across material boundaries)
            ys = jnp.arange(H)[:, None] - dy
            xs = jnp.arange(W)[None, :] - dx
            inb = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
            ok = inb & (nb(mat1) == mat1) \
                & (jnp.sum(n1 * nb(n1), axis=-1) > NORMAL_GATE) \
                & (jnp.abs(depth - nb(depth))
                   < DEPTH_GATE * jnp.maximum(depth, 1e-3)) \
                & (nb(res_M) > 0) & (nb(res_W) > 0)
            x2_n = nb(res_x2)
            n2_n = nb(res_n2)
            rad_n = nb(res_rad)
            jac = _jacobian(nb(x1), x1, x2_n, n2_n)
            p_hat_n = _p_hat(x1, n1, x2_n, rad_n) * jac
            M_n = jnp.where(ok, jnp.minimum(nb(res_M), M_CAP), 0.0)
            w_n = jnp.where(ok, nb(res_W) * M_n * p_hat_n, 0.0)
            new_wsum = wsum + w_n
            take = (u(110 + sp * 8 + k) * jnp.maximum(new_wsum, 1e-20)) < w_n
            cur = tuple(jnp.where(take[..., None], new, old)
                        for new, old in zip((x2_n, n2_n, rad_n), cur))
            wsum = new_wsum
            acc_M = acc_M + M_n
        res_x2, res_n2, res_rad = cur
        res_M = acc_M
        p_hat_sel = _p_hat(x1, n1, res_x2, res_rad)
        res_W = safe_div(wsum, res_M * jnp.maximum(p_hat_sel, 1e-9))
        res_W = jnp.where(p_hat_sel > 1e-9, res_W, 0.0)

    # ---- final shade: BSDF re-eval toward the chosen x2 + visibility
    flat = lambda a, c=None: a.reshape((-1,) if c is None else (-1, c))
    to_s = res_x2 - x1
    d2 = jnp.maximum(dot(to_s, to_s), 1e-8)
    dist = jnp.sqrt(d2)
    wi = to_s / dist[..., None]
    _, bsdf_eval = get_bsdf(cfg.bsdf)
    mat = gather_material(scene.materials, flat(mat1).astype(jnp.int32))
    # view dir: from camera to x1
    cam_pos = cam.c2w[3, :3]
    wo = normalize(cam_pos - x1)
    f, _ = bsdf_eval(mat, flat(n1, 3), flat(wo, 3), flat(wi, 3))
    cos1 = jnp.maximum(dot(flat(wi, 3), flat(n1, 3)), 0.0)
    blocked = _occluded(scene, flat(x1 + n1 * 1e-4, 3), flat(wi, 3),
                        flat(dist) - 2e-4, cfg)
    contrib = f * flat(res_rad, 3) * (cos1 * flat(res_W)
                                      * (~blocked))[..., None]
    indirect = jnp.where((flat(res_M) > 0)[..., None], contrib, 0.0)
    indirect_img = jnp.nan_to_num(indirect.reshape(H, W, 3),
                                  nan=0.0, posinf=0.0)
    img = direct + indirect_img

    new_state = ReSTIRState(x2=res_x2, n2=res_n2, rad=res_rad, M=res_M,
                            W=res_W, normal=n1, depth=depth)
    aux = {"direct": direct, "indirect": indirect_img,
           "gradient": gradient,
           # primary G-buffer rides along so downstream denoisers don't
           # re-trace it (ReSTIR-ASVGF consumes these directly)
           "albedo": im(st["albedo"], 3), "normal": n1, "depth": depth,
           "emitted0": im(st["emitted0"], 3)}
    return img, new_state, aux
