"""Analytic light sampling: point / directional / spot / quad / disk.

Counterpart of the reference's Unity-light NEE path (`SelectUnityLight`,
CommonData.cginc:1806; LightData layout RayTracingLights.cs). Delta lights
(point/dir/spot) return `is_delta=True` — no BSDF-side MIS counterpart.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from truetrace_tpu.core.math import dot, normalize, onb
from truetrace_tpu.scene.ir import AnalyticLights

LIGHT_POINT, LIGHT_DIR, LIGHT_SPOT, LIGHT_QUAD, LIGHT_DISK = range(5)


class AnalyticSample(NamedTuple):
    wi: jnp.ndarray        # [R,3]
    dist: jnp.ndarray      # [R] distance to light (1e30 for directional)
    radiance: jnp.ndarray  # [R,3] incident radiance / (delta: intensity/d^2)
    pdf_sa: jnp.ndarray    # [R] solid-angle pdf (1 for delta lights)
    pmf: jnp.ndarray       # [R] light-selection probability
    is_delta: jnp.ndarray  # [R] bool
    valid: jnp.ndarray     # [R] bool


def _empty_sample(R):
    z = jnp.zeros((R,), jnp.float32)
    return AnalyticSample(wi=jnp.zeros((R, 3)), dist=z,
                          radiance=jnp.zeros((R, 3)),
                          pdf_sa=z, pmf=z, is_delta=jnp.zeros((R,), bool),
                          valid=jnp.zeros((R,), bool))


def sample_analytic(lights: AnalyticLights, p, u_sel, u2) -> AnalyticSample:
    """Uniformly select one analytic light and sample it from point p."""
    K = lights.position.shape[0]
    R = p.shape[0]
    if K == 0:
        return _empty_sample(R)
    idx = jnp.clip((u_sel * K).astype(jnp.int32), 0, K - 1)
    pmf = jnp.full((R,), 1.0 / K, jnp.float32)
    return sample_analytic_idx(lights, idx, pmf, p, u2)


def sample_analytic_idx(lights: AnalyticLights, idx, pmf, p,
                        u2) -> AnalyticSample:
    """Sample the given per-lane light index (pmf = its selection
    probability, already resolved by the caller: uniform or RIS)."""
    R = p.shape[0]
    lt = lights.ltype[idx]
    lpos = lights.position[idx]
    ldir = normalize(lights.direction[idx])
    lrad = lights.radiance[idx]
    ext = lights.extent[idx]
    soft = lights.softness[idx]
    zr = lights.z_rot[idx] if lights.z_rot is not None \
        else jnp.zeros_like(soft)

    # --- soft shadows for delta lights (reference Softness,
    # RayTracingShader.compute:361-375): point/spot positions jitter
    # inside a ball of radius softness*0.1 — artistically biased
    # penumbra exactly like the reference (no pdf term)
    u_mag = (u2[..., 0] * 7919.0) % 1.0     # decorrelated magnitude
    phi_s = 2.0 * jnp.pi * u2[..., 0]
    ct_s = 2.0 * u2[..., 1] - 1.0
    st_s = jnp.sqrt(jnp.maximum(1.0 - ct_s * ct_s, 0.0))
    sphere = jnp.stack([st_s * jnp.cos(phi_s), st_s * jnp.sin(phi_s),
                        ct_s], -1)
    is_soft_pt = ((lt == LIGHT_POINT) | (lt == LIGHT_SPOT)) & (soft > 0.0)
    lpos = jnp.where(is_soft_pt[..., None],
                     lpos + sphere * (u_mag * soft * 0.1)[..., None], lpos)

    # --- point / spot: direction to position, inverse-square falloff
    to_l = lpos - p
    d2 = jnp.maximum(dot(to_l, to_l), 1e-8)
    dist_p = jnp.sqrt(d2)
    wi_p = to_l / dist_p[..., None]
    rad_point = lrad / d2[..., None]
    # spot cone falloff
    cos_spot = -dot(wi_p, ldir)
    inner = lights.spot_cos[idx, 0]
    outer = lights.spot_cos[idx, 1]
    spot_w = jnp.clip((cos_spot - outer)
                      / jnp.maximum(inner - outer, 1e-6), 0.0, 1.0)
    rad_spot = rad_point * (spot_w * spot_w)[..., None]

    # --- directional: constant direction, "infinite" distance; softness
    # tilts the direction inside a disk of angular radius softness*0.01
    # (reference RayTracingShader.compute:366-370)
    t_ax, b_ax = onb(ldir)
    r_sun = jnp.sqrt(u2[..., 0]) * soft * 0.01
    phi_d = 2.0 * jnp.pi * u2[..., 1]
    wi_d = normalize(-ldir + (r_sun * jnp.cos(phi_d))[..., None] * t_ax
                     + (r_sun * jnp.sin(phi_d))[..., None] * b_ax)
    dist_d = jnp.full((R,), 1e30, jnp.float32)

    # --- quad area light: sample the rectangle (center lpos, axes from
    # ldir, rotated in-plane by z_rot — reference ZAxisRotation,
    # CommonData.cginc:1826)
    cz, sz = jnp.cos(zr), jnp.sin(zr)
    ou = (u2[..., 0] - 0.5) * 2.0 * ext[:, 0]
    ov = (u2[..., 1] - 0.5) * 2.0 * ext[:, 1]
    ou, ov = cz * ou - sz * ov, sz * ou + cz * ov
    off = ou[..., None] * t_ax + ov[..., None] * b_ax
    qpos = lpos + off
    to_q = qpos - p
    d2q = jnp.maximum(dot(to_q, to_q), 1e-8)
    dist_q = jnp.sqrt(d2q)
    wi_q = to_q / dist_q[..., None]
    cos_q = -dot(wi_q, ldir)
    area_q = jnp.maximum(4.0 * ext[:, 0] * ext[:, 1], 1e-8)
    pdf_q = d2q / jnp.maximum(cos_q * area_q, 1e-8)

    # --- disk area light: radius ext[:,0]
    r_d = jnp.sqrt(u2[..., 0]) * ext[:, 0]
    phi = 2.0 * jnp.pi * u2[..., 1]
    dpos = lpos + (r_d * jnp.cos(phi))[..., None] * t_ax \
        + (r_d * jnp.sin(phi))[..., None] * b_ax
    to_dk = dpos - p
    d2d = jnp.maximum(dot(to_dk, to_dk), 1e-8)
    dist_dk = jnp.sqrt(d2d)
    wi_dk = to_dk / dist_dk[..., None]
    cos_dk = -dot(wi_dk, ldir)
    area_d = jnp.maximum(jnp.pi * ext[:, 0] * ext[:, 0], 1e-8)
    pdf_d = d2d / jnp.maximum(cos_dk * area_d, 1e-8)

    is_quad = lt == LIGHT_QUAD
    is_disk = lt == LIGHT_DISK
    is_dir = lt == LIGHT_DIR
    is_spot = lt == LIGHT_SPOT
    is_area = is_quad | is_disk
    wi = jnp.where(is_dir[..., None], wi_d,
         jnp.where(is_quad[..., None], wi_q,
         jnp.where(is_disk[..., None], wi_dk, wi_p)))
    dist = jnp.where(is_dir, dist_d,
           jnp.where(is_quad, dist_q,
           jnp.where(is_disk, dist_dk, dist_p)))
    radiance = jnp.where(is_dir[..., None], lrad,
               jnp.where(is_spot[..., None], rad_spot,
               jnp.where(is_area[..., None], lrad, rad_point)))
    pdf_sa = jnp.where(is_quad, pdf_q,
             jnp.where(is_disk, pdf_d, 1.0))
    valid = jnp.where(is_quad, cos_q > 1e-6,
            jnp.where(is_disk, cos_dk > 1e-6,
            jnp.where(is_spot, spot_w > 0.0, jnp.ones((R,), bool))))
    return AnalyticSample(wi=wi, dist=dist, radiance=radiance,
                          pdf_sa=jnp.maximum(pdf_sa, 1e-12), pmf=pmf,
                          is_delta=~is_area, valid=valid)


# ---------------------------------------------------------------------------
# Streaming RIS light selection (reference SelectUnityLight,
# CommonData.cginc:1806 + the RIS-count setting): at dozens-to-hundreds
# of analytic lights, uniform selection is noisy — draw N uniform
# candidates, weight each by a cheap unshadowed-contribution estimate,
# keep one by reservoir sampling, and return the unbiased RIS weight as
# an effective pmf.
# ---------------------------------------------------------------------------

def analytic_target_weight(lights: AnalyticLights, idx, p):
    """Cheap positive target weight ~ unshadowed contribution of light
    `idx` seen from `p` (luminance; light sampled at its center). A small
    positivity floor keeps every emitting light selectable — the target
    need not match the true contribution for unbiasedness, but it must
    not be 0 where the contribution can be > 0 (soft-jittered spots,
    edge-on area lights)."""
    lt = lights.ltype[idx]
    lpos = lights.position[idx]
    ldir = normalize(lights.direction[idx])
    lum = (0.2126 * lights.radiance[idx, 0]
           + 0.7152 * lights.radiance[idx, 1]
           + 0.0722 * lights.radiance[idx, 2])
    ext = lights.extent[idx]
    to_l = lpos - p
    d2 = jnp.maximum(dot(to_l, to_l), 1e-8)
    wi = to_l / jnp.sqrt(d2)[..., None]
    w_point = lum / d2
    cos_spot = -dot(wi, ldir)
    inner = lights.spot_cos[idx, 0]
    outer = lights.spot_cos[idx, 1]
    spot_w = jnp.clip((cos_spot - outer)
                      / jnp.maximum(inner - outer, 1e-6), 0.0, 1.0)
    w_spot = w_point * spot_w * spot_w
    area = jnp.where(lt == LIGHT_DISK,
                     jnp.pi * ext[:, 0] * ext[:, 0],
                     4.0 * ext[:, 0] * ext[:, 1])
    w_area = lum * area * jnp.maximum(-dot(wi, ldir), 0.0) / d2
    w = jnp.where(lt == LIGHT_DIR, lum,
        jnp.where(lt == LIGHT_SPOT, w_spot,
        jnp.where((lt == LIGHT_QUAD) | (lt == LIGHT_DISK), w_area,
                  w_point)))
    # positivity floor: any light with power stays selectable
    return w + 1e-4 * lum / (1.0 + d2)


def sample_analytic_ris(lights: AnalyticLights, p, u_cands, u_keep,
                        u2) -> AnalyticSample:
    """Streaming RIS over N = u_cands.shape[1] uniform candidates.

    u_cands/u_keep: [R,N] uniforms (candidate pick / reservoir keep).
    Unbiased: the selected light's effective pmf is 1/W with
    W = (sum_c w_c) / (N * w_sel), w_c = K * target(c) — the standard
    RIS estimator, so contribution * W integrates to the sum over
    lights exactly (test_analytic_ris.py unbiasedness gate)."""
    K = lights.position.shape[0]
    R = p.shape[0]
    if K == 0:
        return _empty_sample(R)
    N = u_cands.shape[1]
    wsum = jnp.zeros((R,), jnp.float32)
    sel_idx = jnp.zeros((R,), jnp.int32)
    sel_tw = jnp.zeros((R,), jnp.float32)
    for c in range(N):
        idx_c = jnp.clip((u_cands[:, c] * K).astype(jnp.int32), 0, K - 1)
        tw = analytic_target_weight(lights, idx_c, p)
        w_c = tw * K                       # target / (1/K) proposal
        wsum = wsum + w_c
        take = u_keep[:, c] * jnp.maximum(wsum, 1e-20) < w_c
        sel_idx = jnp.where(take, idx_c, sel_idx)
        sel_tw = jnp.where(take, tw, sel_tw)
    W = wsum / jnp.maximum(N * sel_tw, 1e-20)
    pmf_eff = 1.0 / jnp.maximum(W, 1e-20)
    s = sample_analytic_idx(lights, sel_idx, pmf_eff, p, u2)
    return s._replace(valid=s.valid & (wsum > 0.0))
