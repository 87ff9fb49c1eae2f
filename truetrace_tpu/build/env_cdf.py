"""Environment-map importance-sampling tables.

Counterpart of the reference's CDFCreator.compute (Utility/CDFCreator.compute:
26-169: groupshared prefix-scan building per-row conditional CDFs, a
sin-theta-weighted marginal CDF, and the total) — on TPU this is just two
`cumsum`s, fused by XLA; no hand-written scan needed.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from truetrace_tpu.scene.ir import EnvMap


def build_env_cdf(image: np.ndarray, rotation: float = 0.0,
                  intensity: float = 1.0) -> EnvMap:
    """image: [H,W,3] equirect radiance -> EnvMap with CDF tables."""
    img = np.asarray(image, np.float32)
    H, W = img.shape[:2]
    lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
           + 0.0722 * img[..., 2])
    # sin(theta) weight per row (theta = pi*(y+0.5)/H)
    sin_t = np.sin(np.pi * (np.arange(H) + 0.5) / H).astype(np.float32)
    w = lum * sin_t[:, None]

    row_sum = w.sum(axis=1)
    cdf_x = np.cumsum(w, axis=1)
    cdf_x = cdf_x / np.maximum(row_sum[:, None], 1e-20)
    cdf_y = np.cumsum(row_sum)
    total = max(float(cdf_y[-1]), 1e-20)
    cdf_y = cdf_y / total

    return EnvMap(image=jnp.asarray(img),
                  cdf_x=jnp.asarray(cdf_x.astype(np.float32)),
                  cdf_y=jnp.asarray(cdf_y.astype(np.float32)),
                  total=jnp.float32(total * (np.pi / H) * (2 * np.pi / W)),
                  rotation=jnp.float32(rotation),
                  intensity=jnp.float32(intensity))


def procedural_sky(h: int = 128, w: int = 256, sun_dir=(0.3, 0.6, 0.2),
                   sun_intensity: float = 500.0, sun_angle_deg: float = 1.5,
                   sky_tint=(0.35, 0.5, 0.85), ground=(0.25, 0.2, 0.15),
                   ) -> np.ndarray:
    """Simple analytic sky + sun disk for tests/benchmarks (stand-in for the
    reference's Bruneton atmosphere LUTs until post/atmosphere lands)."""
    sd = np.asarray(sun_dir, np.float64)
    sd /= np.linalg.norm(sd)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    theta = np.pi * (ys + 0.5) / h
    phi = 2 * np.pi * (xs + 0.5) / w
    d = np.stack([np.sin(theta) * np.cos(phi), np.cos(theta),
                  np.sin(theta) * np.sin(phi)], axis=-1)
    cos_sun = d @ sd
    horizon = np.clip(d[..., 1], -1, 1)
    sky = (np.asarray(sky_tint)[None, None] *
           (0.35 + 0.65 * np.clip(horizon, 0, 1))[..., None])
    grad = np.clip(1 - np.abs(horizon) * 4, 0, 1)[..., None] \
        * np.array([0.25, 0.2, 0.12])[None, None]
    img = np.where(horizon[..., None] > 0, sky + grad,
                   np.asarray(ground)[None, None] * 0.4 + grad)
    sun_cos = np.cos(np.deg2rad(sun_angle_deg))
    img = img + (cos_sun > sun_cos)[..., None] * np.asarray(
        [sun_intensity, sun_intensity * 0.95, sun_intensity * 0.85])
    return img.astype(np.float32)


def star_field(h: int = 128, w: int = 256, density: float = 0.004,
               brightness: float = 40.0, seed: int = 7) -> np.ndarray:
    """Procedural star field (counterpart of the reference's hash-based
    star helpers in its procedural night sky, CommonData.cginc:1228-1382):
    a sparse set of texels becomes stars with a power-law brightness
    distribution and slight blue/yellow temperature variation, weighted by
    sin(theta) so star DENSITY is uniform on the sphere (equirect texels
    shrink toward the poles). Deterministic per seed."""
    rng = np.random.default_rng(seed)
    ys = (np.arange(h) + 0.5) / h
    sin_t = np.sin(np.pi * ys)[:, None]                  # [h,1]
    u = rng.random((h, w))
    is_star = u < density * sin_t
    mag = rng.random((h, w)) ** 8.0                      # few bright stars
    temp = rng.random((h, w))                            # color variation
    r = 0.8 + 0.4 * temp
    b = 1.2 - 0.4 * temp
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = is_star * mag * r * brightness
    img[..., 1] = is_star * mag * brightness
    img[..., 2] = is_star * mag * b * brightness
    return img
