"""Atmosphere LUTs + sky radiance sanity."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.scene.atmosphere import (
    AtmosphereLUTs, bake_sky_env, build_transmittance, sample_transmittance,
    sky_radiance, R_GROUND)


def test_transmittance_lut_properties():
    lut = np.asarray(build_transmittance())
    assert lut.shape == (64, 256, 3)
    assert np.isfinite(lut).all()
    assert (lut >= 0).all() and (lut <= 1.0 + 1e-6).all()
    # zenith transmits more than horizon (for a ground-level observer)
    r = jnp.full((2,), R_GROUND + 0.2)
    mu = jnp.asarray([1.0, 0.02])
    t = np.asarray(sample_transmittance(jnp.asarray(lut), r, mu))
    assert t[0].mean() > t[1].mean()
    # blue scatters out more than red along long paths (horizon reddening)
    assert t[1][0] > t[1][2]


def test_sky_radiance_blue_and_bright_near_sun():
    luts = AtmosphereLUTs(transmittance=build_transmittance())
    sun = jnp.asarray([0.0, 0.5, 0.866])
    sun = sun / jnp.linalg.norm(sun)
    dirs = jnp.asarray([
        [0.0, 1.0, 0.0],                     # zenith
        [0.0, 0.45, 0.893],                  # near sun
        [0.0, 0.45, -0.893],                 # opposite azimuth
    ])
    L = np.asarray(sky_radiance(luts, dirs, sun))
    assert np.isfinite(L).all() and (L >= 0).all()
    # zenith sky is blue-dominant
    assert L[0, 2] > L[0, 0]
    # forward scattering: near-sun direction brighter than opposite
    assert L[1].sum() > L[2].sum()


def test_bake_sky_env():
    env = bake_sky_env(sun_dir=(0.4, 0.45, 0.1), h=32, w=64)
    img = np.asarray(env.image)
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all() and img.min() >= 0
    assert float(env.total) > 0
    # sun disk present (very bright texels)
    assert img.max() > 100.0
    # upper hemisphere brighter than below-horizon
    assert img[:14].mean() > img[18:].mean()


def test_multiscatter_lut():
    """Psi_ms LUT: finite, non-negative, and actually adds energy —
    reference multi-scatter orders (AtmosphereLUTGenerator.compute:404)."""
    from truetrace_tpu.scene.atmosphere import (build_multiscatter,
                                                sample_multiscatter)
    t = build_transmittance()
    ms = np.asarray(build_multiscatter(t))
    assert ms.shape == (32, 32, 3)
    assert np.isfinite(ms).all() and (ms >= 0).all()
    # high sun yields more multiple scattering at ground level than a sun
    # well below the horizon
    lo = np.asarray(sample_multiscatter(jnp.asarray(ms),
                                        jnp.full((1,), R_GROUND + 0.1),
                                        jnp.asarray([-0.6])))
    hi = np.asarray(sample_multiscatter(jnp.asarray(ms),
                                        jnp.full((1,), R_GROUND + 0.1),
                                        jnp.asarray([0.9])))
    assert hi.sum() > lo.sum()


def test_multiscatter_brightens_sky_and_fills_twilight():
    from truetrace_tpu.scene.atmosphere import build_luts
    luts = build_luts()
    single = AtmosphereLUTs(transmittance=luts.transmittance)
    dirs = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.3, 0.954]])
    sun = jnp.asarray([0.0, 0.5, 0.866])
    sun = sun / jnp.linalg.norm(sun)
    L_ms = np.asarray(sky_radiance(luts, dirs, sun, ground_albedo=0.0))
    L_ss = np.asarray(sky_radiance(single, dirs, sun, ground_albedo=0.0))
    assert (L_ms > L_ss).all(), "multi-scatter must add energy everywhere"
    # twilight: sun 5 deg below horizon -> single scattering nearly dead
    # at the zenith, multi-scatter keeps the sky visibly lit
    sun_lo = jnp.asarray([0.0, -0.087, 0.996])
    zen = jnp.asarray([[0.0, 1.0, 0.0]])
    ms = np.asarray(sky_radiance(luts, zen, sun_lo, ground_albedo=0.0))
    ss = np.asarray(sky_radiance(single, zen, sun_lo, ground_albedo=0.0))
    assert ms.sum() > 1.5 * ss.sum(), (ms.sum(), ss.sum())


def test_irradiance_lut():
    from truetrace_tpu.scene.atmosphere import (build_luts,
                                                sample_irradiance)
    luts = build_luts()
    ir = np.asarray(luts.irradiance)
    assert np.isfinite(ir).all() and (ir >= 0).all()
    e = np.asarray(sample_irradiance(luts.irradiance,
                                     jnp.asarray([-0.5, 0.05, 0.9])))
    # monotone in sun elevation; nonzero a hair above the horizon
    assert e[2].sum() > e[1].sum() > e[0].sum()
    assert e[1].sum() > 0.0


def test_local_sun_angle_used():
    """The in-march sun angle must follow spherical geometry, not the
    flat-sun approximation: for a near-horizon view ray toward a rising
    sun, samples far along the ray see a HIGHER local sun -> more light
    than the flat-sun version would give. We check the asymmetry between
    looking toward vs away from a low sun at equal view elevation, which
    vanishes (except for phase) under flat-sun + isotropic comparison."""
    luts = AtmosphereLUTs(transmittance=build_transmittance())
    sun = jnp.asarray([0.0, 0.035, 0.999])
    sun = sun / jnp.linalg.norm(sun)
    toward = jnp.asarray([[0.0, 0.02, 0.9998]])
    away = jnp.asarray([[0.0, 0.02, -0.9998]])
    Lt = np.asarray(sky_radiance(luts, toward, sun, ground_albedo=0.0))
    La = np.asarray(sky_radiance(luts, away, sun, ground_albedo=0.0))
    # toward the sun: local sun elevation rises along the ray (lit sooner,
    # brighter even beyond the phase asymmetry) — require a LARGE margin
    assert Lt.sum() > 3.0 * La.sum(), (Lt.sum(), La.sum())


def test_star_field_and_night_bake():
    """Procedural stars (reference night-sky helpers,
    CommonData.cginc:1228-1382): sparse, deterministic, uniform density on
    the sphere; baked skies show them only at twilight/night."""
    from truetrace_tpu.build.env_cdf import star_field
    from truetrace_tpu.scene.atmosphere import build_luts

    sf = star_field(128, 256, density=0.004, seed=7)
    assert (sf >= 0).all() and np.isfinite(sf).all()
    n_stars = int((sf.sum(-1) > 0).sum())
    assert 30 < n_stars < 400, n_stars
    np.testing.assert_array_equal(sf, star_field(128, 256, density=0.004,
                                                 seed=7))
    # uniform on the sphere: poles (texel-dense) hold FEWER star texels
    mid = (sf[48:80].sum(-1) > 0).mean()
    pole = (sf[:16].sum(-1) > 0).mean()
    assert mid > pole

    luts = build_luts()
    env_day = bake_sky_env(sun_dir=(0.3, 0.6, 0.2), h=128, w=256,
                           luts=luts, stars=40.0)
    env_night = bake_sky_env(sun_dir=(0.3, -0.4, 0.2), h=128, w=256,
                             luts=luts, stars=40.0, sun_disk_intensity=0.0)
    day = np.asarray(env_day.image)
    night = np.asarray(env_night.image)
    # daytime: no visible stars (fade = 0); night: upper hemisphere has
    # bright isolated texels against a dark sky
    assert day[:56].max() < 1e4     # only the sun disk is brighter
    top = night[:56]
    assert top.max() > 20.0 * max(float(np.median(top)), 1e-6)
