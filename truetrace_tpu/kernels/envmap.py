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
    (atmosphere twilight gradients). At texel centers bilinear equals the
    texel itself, so `env_sample` (which returns texel-center directions
    and radiances) stays exactly consistent with this eval."""
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
    radiance [R,3])."""
    H, W = env.image.shape[0], env.image.shape[1]
    y = jnp.clip(jnp.searchsorted(env.cdf_y, u2[..., 0]), 0, H - 1)
    row_cdf = env.cdf_x[y]                       # [R,W]
    x = jnp.clip(_rowwise_searchsorted(row_cdf, u2[..., 1]), 0, W - 1)
    theta = jnp.pi * (y.astype(jnp.float32) + 0.5) / H
    phi = 2.0 * jnp.pi * (x.astype(jnp.float32) + 0.5) / W + env.rotation
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta),
                   sin_t * jnp.sin(phi)], axis=-1)
    # radiance through env_eval so NEE and BSDF-hit strategies integrate
    # EXACTLY the same (bilinear) signal; the pdf stays texel-based — it
    # must match the CDF the sample was drawn from
    rad = env_eval(env, d)
    texel = env.image[y, x]
    lum = (0.2126 * texel[..., 0] + 0.7152 * texel[..., 1]
           + 0.0722 * texel[..., 2])
    pdf = lum / jnp.maximum(env.total, 1e-20)
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
    # p(texel) = lum*sin_t*Delta / total; texel solid angle = sin_t*Delta
    # -> pdf_sa = lum / total  (the sin_t cancels)
    return lum / jnp.maximum(env.total, 1e-20)
