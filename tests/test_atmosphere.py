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
