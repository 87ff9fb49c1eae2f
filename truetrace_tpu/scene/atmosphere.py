"""Physically-based atmosphere: precomputed LUTs + sky radiance evaluation.

Counterpart of the reference's Bruneton implementation
(Utility/Atmosphere/AtmosphereGenerator.cs driving
AtmosphereLUTGenerator.compute:53-907 — transmittance, single scattering,
N multiple-scattering orders and ground irradiance LUTs baked once at
startup; runtime sampling via GetSkyRadiance, AtmosphereSampling.cginc).

TPU design: the Hillaire-2020 formulation of the same physics — the
infinite multiple-scattering series is captured by a 2D LUT
Psi_ms(altitude, sun angle) built from a sphere-integrated second order
plus the geometric-series transfer factor 1/(1-f_ms), equivalent to
Bruneton's order-by-order bake in the isotropic-MS approximation and one
vectorized jit per LUT instead of 7 compute passes. Ground irradiance
(direct + multi-scattered ambient) is a third LUT, used both for terrain
shading of baked skies and for the ground term of below-horizon rays.

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
GROUND_ALBEDO = 0.3          # reference ground_albedo (AtmosphereGenerator)

T_W, T_H = 256, 64          # transmittance LUT resolution
N_STEPS = 40
MS_N = 32                   # multi-scatter LUT resolution (mu_s x altitude)
MS_DIRS = 64                # sphere directions per MS entry
MS_STEPS = 20
IR_W = 64                   # irradiance LUT: mu_s resolution


class AtmosphereLUTs(NamedTuple):
    transmittance: jnp.ndarray       # [T_H, T_W, 3]
    multiscatter: jnp.ndarray = None  # [MS_N, MS_N, 3] Psi_ms(r, mu_s)
    irradiance: jnp.ndarray = None    # [IR_W, 3] ground E(mu_s) / E_sun


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


def _scattering(h):
    """3-channel scattering coefficient (Rayleigh + Mie) at altitude h."""
    rho_r, rho_m, _ = _densities(h)
    return BETA_R * rho_r[..., None] + BETA_M_SCAT * rho_m[..., None]


def _dist_to_top(r, mu):
    """Distance along (r, mu) to the atmosphere top."""
    disc = r * r * (mu * mu - 1.0) + R_TOP * R_TOP
    return jnp.maximum(-r * mu + jnp.sqrt(jnp.maximum(disc, 0.0)), 0.0)


def _dist_to_ground(r, mu):
    """Distance to the ground, +inf where the ray misses it."""
    disc = r * r * (mu * mu - 1.0) + R_GROUND * R_GROUND
    hit = (disc >= 0.0) & (mu < 0.0)
    d = -r * mu - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(hit & (d > 0.0), d, jnp.inf)


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
    """[T_H, T_W, 3] transmittance to the top of the atmosphere
    (reference ComputeTransmittance, AtmosphereLUTGenerator.compute:53)."""
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


def _earth_lit(rad, mu_s):
    """1 where the sun is not occluded by the planet at radius rad."""
    return (mu_s > -jnp.sqrt(jnp.maximum(
        1.0 - (R_GROUND / rad) ** 2, 0.0))).astype(jnp.float32)


def _fibonacci_sphere(n: int) -> jnp.ndarray:
    """[n,3] near-uniform directions (golden-angle spiral)."""
    i = np.arange(n) + 0.5
    phi = np.pi * (1.0 + 5.0 ** 0.5) * i
    y = 1.0 - 2.0 * i / n
    s = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    return jnp.asarray(np.stack([s * np.cos(phi), y, s * np.sin(phi)],
                                axis=-1).astype(np.float32))


@jax.jit
def build_multiscatter(tlut) -> jnp.ndarray:
    """[MS_N, MS_N, 3] Psi_ms(r, mu_s): radiance added per unit scattering
    coefficient by ALL scattering orders >= 2 (isotropic approximation).

    Hillaire 2020 eq. 5-10: second-order in-scatter L2 and transfer factor
    f_ms are integrated over the sphere with the uniform phase 1/4pi
    (including the ground-albedo bounce); the full series is the geometric
    sum L2 / (1 - f_ms). Equivalent to the reference's order-by-order
    ComputeScatteringDensity/ComputeMultipleScattering ladder
    (AtmosphereLUTGenerator.compute:404-907) collapsed by the isotropy
    assumption. Grid: v -> altitude, u -> mu_s."""
    g = (jnp.arange(MS_N) + 0.5) / MS_N
    mu_s = 2.0 * g - 1.0                               # [MS_N]
    r0 = R_GROUND + g * (R_TOP - R_GROUND) * 0.99 + 0.05
    r, mu_s = jnp.meshgrid(r0, mu_s, indexing="ij")    # [MS_N, MS_N]
    r = r.reshape(-1)                                   # [G]
    mu_s = mu_s.reshape(-1)
    G = r.shape[0]

    dirs = _fibonacci_sphere(MS_DIRS)                  # [D,3]
    mu_v = dirs[:, 1]                                  # [D]
    # sun in the y-z plane: s = (0, mu_s, sqrt(1-mu_s^2))
    sin_s = jnp.sqrt(jnp.maximum(1.0 - mu_s * mu_s, 0.0))
    cos_vs = (mu_s[:, None] * mu_v[None, :]
              + sin_s[:, None] * dirs[None, :, 2])     # [G,D]

    rg = r[:, None]                                    # [G,1]
    d_g = _dist_to_ground(rg, mu_v[None, :])
    d_t = _dist_to_top(rg, mu_v[None, :])
    hits_ground = jnp.isfinite(d_g)
    t_end = jnp.where(hits_ground, d_g, d_t)           # [G,D]

    dt = t_end / MS_STEPS
    od = jnp.zeros((G, MS_DIRS, 3))
    L2 = jnp.zeros((G, MS_DIRS, 3))
    fms = jnp.zeros((G, MS_DIRS, 3))
    p_u = 1.0 / (4.0 * jnp.pi)
    for i in range(MS_STEPS):
        t = (i + 0.5) / MS_STEPS * t_end               # [G,D]
        rad = jnp.sqrt(rg * rg + t * t + 2.0 * rg * mu_v[None, :] * t)
        h = rad - R_GROUND
        od = od + _extinction(h) * dt[..., None]
        t_view = jnp.exp(-od)
        sig_s = _scattering(h)                         # [G,D,3]
        mu_sx = jnp.clip((rg * mu_s[:, None] + t * cos_vs) / rad, -1., 1.)
        t_sun = sample_transmittance(tlut, rad, mu_sx)
        lit = _earth_lit(rad, mu_sx)
        L2 = L2 + t_view * sig_s * p_u \
            * t_sun * lit[..., None] * dt[..., None]
        fms = fms + t_view * sig_s * dt[..., None]
    # ground bounce at the ray end (Lambertian, reference ground term)
    rad_g = jnp.full_like(t_end, R_GROUND)
    mu_sg = jnp.clip((rg * mu_s[:, None] + t_end * cos_vs) / rad_g,
                     -1.0, 1.0)
    t_sun_g = sample_transmittance(tlut, rad_g, mu_sg)
    L2 = L2 + jnp.where(
        hits_ground[..., None],
        jnp.exp(-od) * (GROUND_ALBEDO / jnp.pi)
        * jnp.maximum(mu_sg, 0.0)[..., None] * t_sun_g,
        0.0)

    L2 = L2.mean(axis=1)                               # [G,3] sphere avg
    fms = fms.mean(axis=1)
    psi = L2 / jnp.maximum(1.0 - fms, 1e-3)
    return psi.reshape(MS_N, MS_N, 3)


def sample_multiscatter(ms_lut, r, mu_s):
    """Bilinear Psi_ms lookup at radius r, local sun cosine mu_s."""
    u = jnp.clip((mu_s * 0.5 + 0.5) * MS_N - 0.5, 0.0, MS_N - 1.0)
    v = jnp.clip((r - R_GROUND) / (R_TOP - R_GROUND) * MS_N - 0.5,
                 0.0, MS_N - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, MS_N - 1)
    v1 = jnp.minimum(v0 + 1, MS_N - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    a = ms_lut[v0, u0] * (1 - fu) + ms_lut[v0, u1] * fu
    b = ms_lut[v1, u0] * (1 - fu) + ms_lut[v1, u1] * fu
    return a * (1 - fv) + b * fv


@jax.jit
def build_irradiance(tlut, ms_lut) -> jnp.ndarray:
    """[IR_W, 3] ground irradiance per unit sun irradiance vs mu_s:
    direct transmitted sun + hemisphere-integrated sky (single + multi
    scattering), the reference's DirectIrradiance + IndirectIrradiance
    LUTs (AtmosphereLUTGenerator.compute:250-400) collapsed to the ground
    shell."""
    mu_s = 2.0 * (jnp.arange(IR_W) + 0.5) / IR_W - 1.0
    r = jnp.full((IR_W,), R_GROUND + 0.01)
    direct = sample_transmittance(tlut, r, jnp.maximum(mu_s, 0.0)) \
        * jnp.maximum(mu_s, 0.0)[..., None]

    # cosine-weighted hemisphere integral of the sky: E = pi * avg(L)
    # over cosine-distributed dirs (16x8 stratified grid)
    nth, nph = 8, 16
    u1 = (jnp.arange(nth) + 0.5) / nth
    u2 = (jnp.arange(nph) + 0.5) / nph
    ct = jnp.sqrt(u1)                                   # cos-weighted
    st = jnp.sqrt(1.0 - u1)
    phi = 2.0 * jnp.pi * u2
    dirs = jnp.stack(jnp.broadcast_arrays(
        st[:, None] * jnp.cos(phi)[None, :],
        ct[:, None] * jnp.ones((1, nph)),
        st[:, None] * jnp.sin(phi)[None, :]), axis=-1).reshape(-1, 3)
    luts = AtmosphereLUTs(transmittance=tlut, multiscatter=ms_lut)

    def sky_for(mu):
        sun = jnp.stack([0.0 * mu, mu,
                         jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))])
        L = _sky_march(luts, dirs, sun, R_GROUND + 0.01, n_steps=12,
                       ground_albedo=0.0)
        return jnp.pi * L.mean(axis=0)

    indirect = jax.vmap(sky_for)(mu_s)
    return direct + indirect


def sample_irradiance(ir_lut, mu_s):
    x = jnp.clip(((mu_s * 0.5 + 0.5) * IR_W).astype(jnp.int32), 0, IR_W - 1)
    return ir_lut[x]


def build_luts() -> AtmosphereLUTs:
    """Full LUT bake: transmittance -> multi-scatter -> irradiance
    (the reference's Atmosphere() startup chain, AtmosphereGenerator.cs)."""
    t = build_transmittance()
    ms = build_multiscatter(t)
    ir = build_irradiance(t, ms)
    return AtmosphereLUTs(transmittance=t, multiscatter=ms, irradiance=ir)


def _phase_rayleigh(c):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def _phase_mie(c, g=MIE_G):
    g2 = g * g
    return (3.0 / (8.0 * jnp.pi) * (1.0 - g2) * (1.0 + c * c)
            / ((2.0 + g2) * jnp.power(1.0 + g2 - 2.0 * g * c, 1.5)))


def _sky_march(luts: AtmosphereLUTs, view_dir, sun_dir, r0,
               n_steps: int = 24, ground_albedo: float = GROUND_ALBEDO):
    """Per-unit-sun-irradiance sky radiance for view dirs [R,3] from
    radius r0 (y-up; y maps to zenith): single scattering with the real
    phases + Psi_ms multiple scattering per step + the transmitted
    ground-bounce for rays that hit the planet (reference GetSkyRadiance /
    GetSkyRadianceToPoint, AtmosphereSampling.cginc)."""
    mu = view_dir[..., 1]
    cos_vs = jnp.sum(view_dir * sun_dir, axis=-1)
    mu_s0 = sun_dir[1]

    d_g = _dist_to_ground(r0, mu)
    hits_ground = jnp.isfinite(d_g)
    d = jnp.where(hits_ground, d_g, _dist_to_top(r0, mu))

    ph_r = _phase_rayleigh(cos_vs)
    ph_m = _phase_mie(cos_vs)
    has_ms = luts.multiscatter is not None

    L = jnp.zeros((*mu.shape, 3))
    od = jnp.zeros((*mu.shape, 3))
    dt = d / n_steps
    for i in range(n_steps):
        t = (i + 0.5) / n_steps * d
        rad = jnp.sqrt(r0 * r0 + t * t + 2.0 * r0 * mu * t)
        h = rad - R_GROUND
        rho_r, rho_m, _ = _densities(h)
        od = od + _extinction(h) * dt[..., None]
        t_view = jnp.exp(-od)
        # LOCAL sun zenith cosine at the sample (spherical geometry)
        mu_s = jnp.clip((r0 * mu_s0 + t * cos_vs) / rad, -1.0, 1.0)
        t_sun = sample_transmittance(luts.transmittance, rad, mu_s)
        lit = _earth_lit(rad, mu_s)
        scat = (BETA_R * (ph_r * rho_r)[..., None]
                + BETA_M_SCAT * (ph_m * rho_m)[..., None])
        step_L = scat * lit[..., None] * t_sun
        if has_ms:
            psi = sample_multiscatter(luts.multiscatter, rad, mu_s)
            step_L = step_L + _scattering(h) * psi
        L = L + t_view * step_L * dt[..., None]

    if ground_albedo > 0.0:
        # transmitted Lambertian ground at the ray end
        mu_sg = jnp.clip((r0 * mu_s0 + d * cos_vs) / R_GROUND, -1.0, 1.0)
        if luts.irradiance is not None:
            e_g = sample_irradiance(luts.irradiance, mu_sg)
        else:
            e_g = sample_transmittance(
                luts.transmittance, jnp.full_like(mu_sg, R_GROUND + 0.01),
                mu_sg) * jnp.maximum(mu_sg, 0.0)[..., None]
        L = L + jnp.where(hits_ground[..., None],
                          jnp.exp(-od) * (ground_albedo / jnp.pi) * e_g,
                          0.0)
    return L


def sky_radiance(luts: AtmosphereLUTs, view_dir, sun_dir,
                 altitude_km: float = 0.2, sun_irradiance: float = 20.0,
                 n_steps: int = 24,
                 ground_albedo: float = GROUND_ALBEDO):
    """Sky radiance for view directions [R,3]. With `luts.multiscatter`
    set, includes ALL scattering orders (Psi_ms); otherwise single
    scattering only."""
    return _sky_march(luts, view_dir, sun_dir, R_GROUND + altitude_km,
                      n_steps=n_steps,
                      ground_albedo=ground_albedo) * sun_irradiance


def bake_sky_env(sun_dir=(0.3, 0.4, 0.2), h: int = 64, w: int = 128,
                 sun_irradiance: float = 20.0,
                 sun_disk_intensity: float = 5e3,
                 sun_cos: float = 0.9999,
                 luts: AtmosphereLUTs = None,
                 stars: float = 0.0):
    """Bake an equirect EnvMap (with importance CDFs) from the atmosphere.
    Returns truetrace_tpu.scene.ir.EnvMap. Pass `luts` to reuse a bake
    across sun positions (time-of-day sweeps). stars > 0 adds the
    procedural star field (reference night-sky helpers,
    CommonData.cginc:1228-1382), faded in as the sun sets and occluded
    below the horizon."""
    from truetrace_tpu.build.env_cdf import build_env_cdf, star_field
    sd = np.asarray(sun_dir, np.float64)
    sd /= np.linalg.norm(sd)
    sd_j = jnp.asarray(sd, jnp.float32)

    ys, xs = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                          (jnp.arange(w) + 0.5) / w, indexing="ij")
    theta = jnp.pi * ys
    phi = 2.0 * jnp.pi * xs
    d = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                   jnp.sin(theta) * jnp.sin(phi)], axis=-1).reshape(-1, 3)

    if luts is None:
        luts = build_luts()
    L = sky_radiance(luts, d, sd_j, sun_irradiance=sun_irradiance)
    # sun disk with transmittance-attenuated radiance
    cos_sun = jnp.sum(d * sd_j, axis=-1)
    t_sun = sample_transmittance(
        luts.transmittance,
        jnp.full(d.shape[:1], R_GROUND + 0.2), cos_sun * 0 + float(sd[1]))
    above = d[:, 1] > 0.0
    L = L + ((cos_sun > sun_cos) & above)[..., None] * t_sun \
        * sun_disk_intensity
    img = np.asarray(L.reshape(h, w, 3))
    if stars > 0.0:
        # stars fade in over the last ~5 degrees of sun elevation and are
        # attenuated by the sky's own brightness (daylight washes them out)
        fade = float(np.clip(0.5 - sd[1] / 0.17, 0.0, 1.0))
        above = (np.asarray(d[:, 1]).reshape(h, w) > 0.0)[..., None]
        img = img + star_field(h, w, brightness=stars) * fade * above
    img = np.maximum(img, 0.0)
    return build_env_cdf(img)
