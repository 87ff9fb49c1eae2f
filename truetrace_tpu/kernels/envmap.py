"""Equirect environment map: eval, importance sample, pdf (pure JAX).

Counterpart of the reference's env sampling (SampleLI + FindInterval binary
CDF inversion, CommonData.cginc:1423-1464; equirect eval in the shade
kernel). `searchsorted` replaces the hand-written FindInterval; everything
is batched over the wavefront.

Direction convention: y-up; theta = polar from +y, phi = atan2(z, x).
u = phi/2pi (+ rotation), v = theta/pi.
"""
from __future__ import annotations

import jax.numpy as jnp

from truetrace_tpu.scene.ir import EnvMap


def env_eval(env: EnvMap, d):
    """Radiance [R,3] for directions d [R,3], bilinear (wrapping in
    azimuth) — nearest-texel fetch bands visibly on low-res baked skies
    (atmosphere twilight gradients). env_sample/env_pdf use the
    piecewise-constant pdf of the SAME table, which is nonzero wherever
    this bilinear signal is (one-texel support growth is covered by the
    BSDF MIS side), so the pair stays unbiased."""
    H, W = env.image.shape[0], env.image.shape[1]
    if H == 1 and W == 1:
        return jnp.broadcast_to(env.image[0, 0] * env.intensity,
                                d.shape[:-1] + (3,))
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0]) - env.rotation
    u = (phi / (2.0 * jnp.pi)) % 1.0
    v = jnp.clip(theta / jnp.pi, 0.0, 1.0 - 1e-6)
    fx = u * W - 0.5
    fy = v * H - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0w = x0 % W                                   # azimuth wraps
    x1w = (x0 + 1) % W
    y0c = jnp.clip(y0, 0, H - 1)                   # poles clamp
    y1c = jnp.clip(y0 + 1, 0, H - 1)
    img = env.image
    top = img[y0c, x0w] * (1 - tx) + img[y0c, x1w] * tx
    bot = img[y1c, x0w] * (1 - tx) + img[y1c, x1w] * tx
    return (top * (1 - ty) + bot * ty) * env.intensity


def env_sample(env: EnvMap, u2):
    """Importance sample a direction: returns (d [R,3], pdf_sa [R],
    radiance [R,3]).

    CONTINUOUS within-texel sampling (PBRT's piecewise-constant 2D
    distribution): the CDF inversion remainders place the sample
    uniformly inside the selected texel, so the sampler's density over
    directions is the piecewise-constant pdf that `env_pdf` evaluates —
    and both MIS strategies integrate the same bilinear env_eval signal
    unbiasedly. (Texel-CENTER sampling with this pdf double-counted the
    bilinear-smeared sun rim on the BSDF side: measured +19% on a
    sun-lit plane, tests/test_env_nee.py.)"""
    H, W = env.image.shape[0], env.image.shape[1]
    u0, u1 = u2[..., 0], u2[..., 1]
    y = jnp.clip(jnp.searchsorted(env.cdf_y, u0), 0, H - 1)
    cy_hi = env.cdf_y[y]
    cy_lo = jnp.where(y > 0, env.cdf_y[jnp.maximum(y - 1, 0)], 0.0)
    uy = jnp.clip((u0 - cy_lo) / jnp.maximum(cy_hi - cy_lo, 1e-12),
                  0.0, 1.0 - 1e-6)
    row_cdf = env.cdf_x[y]                       # [R,W]
    x = jnp.clip(_rowwise_searchsorted(row_cdf, u1), 0, W - 1)
    cx_hi = jnp.take_along_axis(row_cdf, x[..., None], axis=-1)[..., 0]
    cx_lo = jnp.where(
        x > 0,
        jnp.take_along_axis(row_cdf, jnp.maximum(x - 1, 0)[..., None],
                            axis=-1)[..., 0], 0.0)
    ux = jnp.clip((u1 - cx_lo) / jnp.maximum(cx_hi - cx_lo, 1e-12),
                  0.0, 1.0 - 1e-6)
    theta = jnp.pi * (y.astype(jnp.float32) + uy) / H
    phi = (2.0 * jnp.pi * (x.astype(jnp.float32) + ux) / W + env.rotation)
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta),
                   sin_t * jnp.sin(phi)], axis=-1)
    rad = env_eval(env, d)
    texel = env.image[y, x]
    lum = (0.2126 * texel[..., 0] + 0.7152 * texel[..., 1]
           + 0.0722 * texel[..., 2])
    # pdf over solid angle: the CDF tables weight texels by sin(theta) at
    # the ROW CENTER; the in-texel uniform (u,v) density maps to solid
    # angle through 1/sin(theta_actual)
    sin_c = jnp.sin(jnp.pi * (y.astype(jnp.float32) + 0.5) / H)
    pdf = (lum / jnp.maximum(env.total, 1e-20)
           * sin_c / jnp.maximum(sin_t, 1e-6))
    return d, pdf, rad


def _rowwise_searchsorted(rows, u):
    """searchsorted along axis -1 for per-lane rows. rows [R,W], u [R]."""
    # vectorized binary search via comparisons: count entries < u
    return jnp.sum((rows < u[..., None]).astype(jnp.int32), axis=-1)


def env_pdf(env: EnvMap, d):
    """Solid-angle pdf that env_sample would generate direction d — the MIS
    counterpart used when a BSDF ray escapes to the sky."""
    H, W = env.image.shape[0], env.image.shape[1]
    if H == 1 and W == 1:
        return jnp.zeros(d.shape[:-1], jnp.float32)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0]) - env.rotation
    u = (phi / (2.0 * jnp.pi)) % 1.0
    v = jnp.clip(theta / jnp.pi, 0.0, 1.0 - 1e-6)
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    img = env.image[y, x]
    lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
           + 0.0722 * img[..., 2])
    # piecewise-constant image pdf -> solid angle: row-center sin from
    # the CDF weighting over the actual sin(theta) (matches env_sample)
    sin_c = jnp.sin(jnp.pi * (y.astype(jnp.float32) + 0.5) / H)
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    return lum / jnp.maximum(env.total, 1e-20) * sin_c / sin_t
