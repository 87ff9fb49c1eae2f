"""Disney BSDF correctness: pdf/sample consistency, energy conservation.

Mirrors the test strategy in SURVEY.md section 4 (white furnace + pdf/sample
histogram consistency for the reference's Materials.cginc equivalents).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.core import rng
from truetrace_tpu.core.math import dot, sample_uniform_sphere
from truetrace_tpu.kernels.disney import disney_eval, disney_sample
from truetrace_tpu.scene.mesh import HostMaterial, material_table
from truetrace_tpu.integrate.pathtrace import gather_material

N_UP = jnp.asarray([0.0, 0.0, 1.0])


def _mat(n_rays, **kw):
    table = material_table([HostMaterial(**kw)])
    return gather_material(table, jnp.zeros((n_rays,), jnp.int32))


def _wo(n_rays, theta_deg=30.0):
    th = np.deg2rad(theta_deg)
    v = jnp.asarray([np.sin(th), 0.0, np.cos(th)], dtype=jnp.float32)
    return jnp.broadcast_to(v, (n_rays, 3))


MATS = {
    "diffuse": dict(base_color=(0.8, 0.4, 0.2), roughness=0.9),
    "rough_metal": dict(base_color=(0.9, 0.7, 0.3), metallic=1.0,
                        roughness=0.5),
    "glossy": dict(base_color=(0.5, 0.5, 0.9), roughness=0.3, metallic=0.3,
                   clearcoat=0.5),
    "glass": dict(base_color=(0.95, 0.95, 0.95), roughness=0.4,
                  spec_trans=1.0, ior=1.5),
    "aniso": dict(base_color=(0.6, 0.6, 0.6), roughness=0.4, metallic=1.0,
                  anisotropic=0.7),
}


@pytest.mark.parametrize("name", list(MATS))
def test_sample_eval_pdf_consistency(name):
    """pdf and f returned by sample must match eval at the same wi."""
    R = 4096
    mat = _mat(R, **MATS[name])
    wo = _wo(R)
    n = jnp.broadcast_to(N_UP, (R, 3))
    pix = jnp.arange(R, dtype=jnp.uint32)
    u1 = rng.uniform1(pix, jnp.uint32(7), jnp.uint32(1))
    u2 = rng.uniform2(pix, jnp.uint32(7), jnp.uint32(2))
    wi, f_s, pdf_s, lobe = disney_sample(mat, n, wo, u1, u2)
    f_e, pdf_e = disney_eval(mat, n, wo, wi)
    ok = np.asarray(pdf_s) > 1e-5
    np.testing.assert_allclose(np.asarray(pdf_s)[ok], np.asarray(pdf_e)[ok],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f_s)[ok], np.asarray(f_e)[ok],
                               rtol=1e-4, atol=1e-6)
    assert np.isfinite(np.asarray(f_s)).all()
    assert np.isfinite(np.asarray(pdf_s)).all()


@pytest.mark.parametrize("name", ["diffuse", "rough_metal", "glossy"])
def test_pdf_is_proper_subprobability(name):
    """The reported pdf must integrate to <= 1 over directions with f > 0
    (VNDF reflections below the horizon are rejected — they carry the
    missing mass), and must equal the fraction of valid samples."""
    R = 1 << 18
    mat = _mat(R, **MATS[name])
    wo = _wo(R)
    n = jnp.broadcast_to(N_UP, (R, 3))
    pix = jnp.arange(R, dtype=jnp.uint32)
    u = rng.uniform2(pix, jnp.uint32(3), jnp.uint32(5))
    wi = sample_uniform_sphere(u)
    _, pdf = disney_eval(mat, n, wo, wi)
    est = float(jnp.mean(pdf) * 4.0 * jnp.pi)
    assert est <= 1.02, f"pdf integral {est:.3f} > 1"

    # fraction of sampled directions that are valid (pdf>0) must match est
    u1 = rng.uniform1(pix, jnp.uint32(5), jnp.uint32(1))
    u2 = rng.uniform2(pix, jnp.uint32(5), jnp.uint32(2))
    _, _, pdf_s, _ = disney_sample(mat, n, wo, u1, u2)
    valid_frac = float(jnp.mean((pdf_s > 1e-7).astype(jnp.float32)))
    assert abs(est - valid_frac) < 0.05, (est, valid_frac)


@pytest.mark.parametrize("name", ["diffuse", "rough_metal", "glossy"])
def test_sampling_matches_integral(name):
    """E_sample[f cos / pdf] must equal the uniform-sphere MC integral of
    f cos — catches any pdf/sample mismatch."""
    R = 1 << 18
    mat = _mat(R, **MATS[name])
    wo = _wo(R)
    n = jnp.broadcast_to(N_UP, (R, 3))
    pix = jnp.arange(R, dtype=jnp.uint32)

    # importance-sampled estimate
    u1 = rng.uniform1(pix, jnp.uint32(11), jnp.uint32(1))
    u2 = rng.uniform2(pix, jnp.uint32(11), jnp.uint32(2))
    wi, f, pdf, _ = disney_sample(mat, n, wo, u1, u2)
    w = jnp.where(pdf[..., None] > 1e-7,
                  f * jnp.abs(dot(wi, n))[..., None]
                  / jnp.maximum(pdf, 1e-7)[..., None], 0.0)
    est_is = np.asarray(jnp.mean(w, axis=0))

    # uniform-sphere estimate
    u = rng.uniform2(pix, jnp.uint32(13), jnp.uint32(3))
    wi_u = sample_uniform_sphere(u)
    f_u, _ = disney_eval(mat, n, wo, wi_u)
    w_u = f_u * jnp.abs(dot(wi_u, n))[..., None] * (4.0 * jnp.pi)
    est_mc = np.asarray(jnp.mean(w_u, axis=0))

    np.testing.assert_allclose(est_is, est_mc, rtol=0.08, atol=5e-3)


def test_white_furnace_bound():
    """Energy conservation: reflected energy <= 1 (no gain)."""
    R = 1 << 17
    for kw in (dict(base_color=(1.0, 1.0, 1.0), roughness=1.0),
               dict(base_color=(1.0, 1.0, 1.0), metallic=1.0, roughness=0.7)):
        mat = _mat(R, **kw)
        wo = _wo(R, 40.0)
        n = jnp.broadcast_to(N_UP, (R, 3))
        pix = jnp.arange(R, dtype=jnp.uint32)
        u1 = rng.uniform1(pix, jnp.uint32(17), jnp.uint32(1))
        u2 = rng.uniform2(pix, jnp.uint32(17), jnp.uint32(2))
        wi, f, pdf, _ = disney_sample(mat, n, wo, u1, u2)
        w = jnp.where(pdf > 1e-7,
                      jnp.max(f, axis=-1) * jnp.abs(dot(wi, n))
                      / jnp.maximum(pdf, 1e-7), 0.0)
        e = float(jnp.mean(w))
        assert e <= 1.10, f"energy gain: {e}"   # Burley retro-reflection legitimately peaks a few % over 1 at grazing
        assert e >= 0.5, f"too lossy: {e}"


def test_glass_refracts():
    """A smooth glass panel must transmit a meaningful fraction of rays."""
    R = 8192
    mat = _mat(R, base_color=(1.0, 1.0, 1.0), roughness=0.05,
               spec_trans=1.0, ior=1.5)
    wo = _wo(R, 20.0)
    n = jnp.broadcast_to(N_UP, (R, 3))
    pix = jnp.arange(R, dtype=jnp.uint32)
    u1 = rng.uniform1(pix, jnp.uint32(23), jnp.uint32(1))
    u2 = rng.uniform2(pix, jnp.uint32(23), jnp.uint32(2))
    wi, f, pdf, lobe = disney_sample(mat, n, wo, u1, u2)
    below = np.asarray(dot(wi, n)) < 0.0
    frac = below.mean()
    assert 0.5 < frac < 1.0, f"transmitted fraction {frac}"
