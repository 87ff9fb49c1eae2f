"""Physically-based atmosphere: precomputed LUTs + sky radiance evaluation.

Counterpart of the reference's Bruneton implementation
(Utility/Atmosphere/AtmosphereGenerator.cs building transmittance /
scattering / irradiance LUTs once at startup; runtime sampling via
GetSkyRadiance, AtmosphereSampling.cginc). This is the Hillaire-2020-style
formulation: a transmittance LUT integrated with a jitted quadrature, plus
analytic Rayleigh/Mie single scattering with an isotropic multi-scattering
gain — the modern production form of the same pipeline, and a natural fit
for JAX (every LUT build is one vectorized jit).

Output plugs into the env-map system: `bake_sky_env` renders an equirect
EnvMap (with CDFs) for any sun direction, so the path tracer's env NEE and
MIS machinery work unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Earth-like constants (km)
R_GROUND = 6360.0
R_TOP = 6460.0
H_RAYLEIGH = 8.0
H_MIE = 1.2
BETA_R = jnp.asarray([5.802e-3, 13.558e-3, 33.1e-3])   # /km
BETA_M_SCAT = 3.996e-3
BETA_M_ABS = 4.4e-3
BETA_OZONE = jnp.asarray([0.650e-3, 1.881e-3, 0.085e-3])
MIE_G = 0.8

T_W, T_H = 256, 64          # transmittance LUT resolution
N_STEPS = 40


class AtmosphereLUTs(NamedTuple):
    transmittance: jnp.ndarray   # [T_H, T_W, 3]


def _densities(h):
    """(rayleigh, mie, ozone) density profiles at altitude h (km)."""
    rho_r = jnp.exp(-jnp.maximum(h, 0.0) / H_RAYLEIGH)
    rho_m = jnp.exp(-jnp.maximum(h, 0.0) / H_MIE)
    rho_o = jnp.maximum(0.0, 1.0 - jnp.abs(h - 25.0) / 15.0)
    return rho_r, rho_m, rho_o


def _extinction(h):
    rho_r, rho_m, rho_o = _densities(h)
    return (BETA_R * rho_r[..., None]
            + (BETA_M_SCAT + BETA_M_ABS) * rho_m[..., None]
            + BETA_OZONE * rho_o[..., None])


def _dist_to_top(r, mu):
    """Distance along (r, mu) to the atmosphere top."""
    disc = r * r * (mu * mu - 1.0) + R_TOP * R_TOP
    return jnp.maximum(-r * mu + jnp.sqrt(jnp.maximum(disc, 0.0)), 0.0)


def _uv_to_rmu(u, v):
    """Bruneton-style parameterization of the transmittance LUT."""
    h_atm = jnp.sqrt(R_TOP ** 2 - R_GROUND ** 2)
    rho = v * h_atm
    r = jnp.sqrt(rho * rho + R_GROUND * R_GROUND)
    d_min = R_TOP - r
    d_max = rho + h_atm
    d = d_min + u * (d_max - d_min)
    mu = jnp.where(d > 1e-6,
                   (h_atm * h_atm - rho * rho - d * d)
                   / jnp.maximum(2.0 * r * d, 1e-9), 1.0)
    return r, jnp.clip(mu, -1.0, 1.0)


def _rmu_to_uv(r, mu):
    h_atm = jnp.sqrt(R_TOP ** 2 - R_GROUND ** 2)
    rho = jnp.sqrt(jnp.maximum(r * r - R_GROUND * R_GROUND, 0.0))
    d = _dist_to_top(r, mu)
    d_min = R_TOP - r
    d_max = rho + h_atm
    u = jnp.clip((d - d_min) / jnp.maximum(d_max - d_min, 1e-9), 0.0, 1.0)
    v = jnp.clip(rho / h_atm, 0.0, 1.0)
    return u, v


@jax.jit
def build_transmittance() -> jnp.ndarray:
    """[T_H, T_W, 3] transmittance to the top of the atmosphere."""
    vs, us = jnp.meshgrid((jnp.arange(T_H) + 0.5) / T_H,
                          (jnp.arange(T_W) + 0.5) / T_W, indexing="ij")
    r, mu = _uv_to_rmu(us, vs)
    d_top = _dist_to_top(r, mu)

    def integrate(r, mu, d):
        ts = (jnp.arange(N_STEPS) + 0.5) / N_STEPS
        od = jnp.zeros((*r.shape, 3))
        for i in range(N_STEPS):
            t = ts[i] * d
            rad = jnp.sqrt(r * r + t * t + 2.0 * r * mu * t)
            od = od + _extinction(rad - R_GROUND) * (d / N_STEPS)[..., None]
        return jnp.exp(-od)

    return integrate(r, mu, d_top)


def sample_transmittance(lut, r, mu):
    u, v = _rmu_to_uv(r, mu)
    x = jnp.clip((u * T_W).astype(jnp.int32), 0, T_W - 1)
    y = jnp.clip((v * T_H).astype(jnp.int32), 0, T_H - 1)
    return lut[y, x]


def _phase_rayleigh(c):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def _phase_mie(c, g=MIE_G):
    g2 = g * g
    return (3.0 / (8.0 * jnp.pi) * (1.0 - g2) * (1.0 + c * c)
            / ((2.0 + g2) * jnp.power(1.0 + g2 - 2.0 * g * c, 1.5)))


def sky_radiance(luts: AtmosphereLUTs, view_dir, sun_dir,
                 altitude_km: float = 0.2, sun_irradiance: float = 20.0,
                 ms_gain: float = 0.4, n_steps: int = 24):
    """Single-scattered (+ isotropic multi-scatter boost) sky radiance for
    view directions [R,3] (y-up world; y maps to zenith)."""
    r0 = R_GROUND + altitude_km
    mu = view_dir[..., 1]
    d = _dist_to_top(r0, mu)
    cos_vs = jnp.sum(view_dir * sun_dir, axis=-1)
    ph_r = _phase_rayleigh(cos_vs)
    ph_m = _phase_mie(cos_vs)
    mu_s0 = sun_dir[1]

    ts = (jnp.arange(n_steps) + 0.5) / n_steps
    L = jnp.zeros((*mu.shape, 3))
    od = jnp.zeros((*mu.shape, 3))
    for i in range(n_steps):
        t = ts[i] * d
        dt = d / n_steps
        rad = jnp.sqrt(r0 * r0 + t * t + 2.0 * r0 * mu * t)
        h = rad - R_GROUND
        rho_r, rho_m, _ = _densities(h)
        # transmittance view->sample (running optical depth)
        od = od + _extinction(h) * dt[..., None]
        t_view = jnp.exp(-od)
        # transmittance sample->sun via LUT (local sun zenith cosine)
        mu_s = jnp.clip((r0 * mu_s0 + t * sun_dir[1] * 0.0 + 0.0)
                        / rad, -1.0, 1.0)
        mu_s = jnp.clip(mu_s0 + 0.0 * t, -1.0, 1.0)  # flat-sun approx
        t_sun = sample_transmittance(luts.transmittance, rad, mu_s)
        # earth shadow
        lit = mu_s > -jnp.sqrt(jnp.maximum(
            1.0 - (R_GROUND / rad) ** 2, 0.0))
        scat = (BETA_R * (ph_r * rho_r)[..., None]
                + BETA_M_SCAT * (ph_m * rho_m)[..., None])
        scat_ms = (BETA_R * rho_r[..., None]
                   + BETA_M_SCAT * rho_m[..., None]) \
            * (ms_gain / (4.0 * jnp.pi))
        L = L + t_view * (scat * lit[..., None] + scat_ms) \
            * t_sun * dt[..., None]
    return L * sun_irradiance


def bake_sky_env(sun_dir=(0.3, 0.4, 0.2), h: int = 64, w: int = 128,
                 sun_irradiance: float = 20.0,
                 sun_disk_intensity: float = 5e3,
                 sun_cos: float = 0.9999):
    """Bake an equirect EnvMap (with importance CDFs) from the atmosphere.
    Returns truetrace_tpu.scene.ir.EnvMap."""
    from truetrace_tpu.build.env_cdf import build_env_cdf
    sd = np.asarray(sun_dir, np.float64)
    sd /= np.linalg.norm(sd)
    sd_j = jnp.asarray(sd, jnp.float32)

    ys, xs = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                          (jnp.arange(w) + 0.5) / w, indexing="ij")
    theta = jnp.pi * ys
    phi = 2.0 * jnp.pi * xs
    d = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                   jnp.sin(theta) * jnp.sin(phi)], axis=-1).reshape(-1, 3)

    luts = AtmosphereLUTs(transmittance=build_transmittance())
    L = sky_radiance(luts, d, sd_j, sun_irradiance=sun_irradiance)
    # sun disk with transmittance-attenuated radiance
    cos_sun = jnp.sum(d * sd_j, axis=-1)
    t_sun = sample_transmittance(
        luts.transmittance,
        jnp.full(d.shape[:1], R_GROUND + 0.2), cos_sun * 0 + float(sd[1]))
    L = L + (cos_sun > sun_cos)[..., None] * t_sun * sun_disk_intensity
    img = np.asarray(L.reshape(h, w, 3))
    img = np.maximum(img, 0.0)
    return build_env_cdf(img)
