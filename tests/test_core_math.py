import jax.numpy as jnp
import numpy as np

from truetrace_tpu.core import math as m
from truetrace_tpu.core import rng


def _rand_unit(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_octahedral_roundtrip():
    n = _rand_unit(4096)
    dec = np.asarray(m.octahedral_decode(m.octahedral_encode(jnp.asarray(n))))
    assert np.max(np.abs(dec - n)) < 1e-5


def test_octahedral_pack32_roundtrip():
    n = _rand_unit(4096, seed=1)
    dec = np.asarray(m.octahedral_unpack32(m.octahedral_pack32(jnp.asarray(n))))
    # 16-bit quantization: ~1e-4 angular error budget
    assert np.max(np.abs(dec - n)) < 3e-4
    assert np.allclose(np.linalg.norm(dec, axis=-1), 1.0, atol=1e-5)


def test_rgbe_roundtrip():
    r = np.random.default_rng(2)
    rgb = (r.uniform(size=(2048, 3)) ** 4 * 1e4).astype(np.float32)
    dec = np.asarray(m.rgbe_unpack(m.rgbe_pack(jnp.asarray(rgb))))
    mx = rgb.max(axis=-1, keepdims=True)
    assert np.max(np.abs(dec - rgb) / np.maximum(mx, 1e-9)) < 1.5 / 255.0
    # zero maps to zero
    assert np.all(np.asarray(m.rgbe_unpack(m.rgbe_pack(jnp.zeros((1, 3))))) == 0)


def test_onb_orthonormal():
    n = jnp.asarray(_rand_unit(1024, seed=3))
    t, b = m.onb(n)
    tn = np.asarray(m.dot(t, n))
    bn = np.asarray(m.dot(b, n))
    tb = np.asarray(m.dot(t, b))
    assert np.max(np.abs(tn)) < 1e-5
    assert np.max(np.abs(bn)) < 1e-5
    assert np.max(np.abs(tb)) < 1e-5
    assert np.allclose(np.asarray(m.length(t)), 1.0, atol=1e-5)
    # right-handed: t x b == n
    assert np.max(np.abs(np.asarray(m.cross(t, b)) - np.asarray(n))) < 1e-5


def test_to_world_to_local_roundtrip():
    n = jnp.asarray(_rand_unit(256, seed=4))
    v = jnp.asarray(_rand_unit(256, seed=5))
    rt = m.to_world(n, m.to_local(n, v))
    assert np.max(np.abs(np.asarray(rt) - np.asarray(v))) < 1e-5


def test_power_heuristic_sums_to_one():
    a = jnp.asarray([0.5, 1.0, 10.0, 1e-3])
    b = jnp.asarray([0.5, 2.0, 0.1, 5.0])
    s = m.power_heuristic(a, b) + m.power_heuristic(b, a)
    assert np.allclose(np.asarray(s), 1.0, atol=1e-5)


def test_cosine_hemisphere_mean():
    u = rng.uniform2(jnp.arange(1 << 16, dtype=jnp.uint32),
                     jnp.uint32(0), jnp.uint32(7))
    d = np.asarray(m.sample_cosine_hemisphere(u))
    assert np.all(d[:, 2] >= 0)
    # E[cos theta] = 2/3 for pdf cos/pi
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3


def test_rng_uniform_and_decorrelated():
    pix = jnp.arange(1 << 16, dtype=jnp.uint32)
    a = np.asarray(rng.uniform1(pix, jnp.uint32(0), jnp.uint32(0)))
    b = np.asarray(rng.uniform1(pix, jnp.uint32(0), jnp.uint32(1)))
    assert 0.0 <= a.min() and a.max() < 1.0
    assert abs(a.mean() - 0.5) < 5e-3
    assert abs(np.corrcoef(a, b)[0, 1]) < 2e-2


def test_ray_tri_basic():
    p0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    ro = jnp.asarray([[0.2, 0.2, -1.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    hit, t, u, v = m.ray_tri(ro, rd, p0, e1, e2, jnp.float32(1e30))
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-6
    assert abs(float(u[0]) - 0.2) < 1e-6 and abs(float(v[0]) - 0.2) < 1e-6
    # miss outside
    ro2 = jnp.asarray([[0.9, 0.9, -1.0]])
    hit2, *_ = m.ray_tri(ro2, rd, p0, e1, e2, jnp.float32(1e30))
    assert not bool(hit2[0])


def test_refract_tir():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = m.normalize(jnp.asarray([[0.9, 0.0, -0.1]]))  # grazing, from dense side
    _, tir = m.refract(v, n, jnp.asarray([1.5]))
    assert bool(tir[0])
