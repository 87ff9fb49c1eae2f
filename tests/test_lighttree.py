"""Light-BVH (PBRT-4 SAOH) build + descent correctness."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.build.lightbvh import _cone_union, build_light_bvh
from truetrace_tpu.build.lightbvh import build_pairs
from truetrace_tpu.kernels.lighttree import light_tree_pdf, sample_light_tree


def _scene(n_lights=24, seed=0):
    r = np.random.default_rng(seed)
    p0 = (r.uniform(-1, 1, (n_lights, 3)) * 8).astype(np.float32)
    e1 = (r.normal(size=(n_lights, 3)) * 0.4).astype(np.float32)
    e2 = (r.normal(size=(n_lights, 3)) * 0.4).astype(np.float32)
    tris = dict(p0=p0, e1=e1, e2=e2)
    power = r.uniform(0.5, 20.0, n_lights).astype(np.float32)
    return tris, power


def test_cone_union_contains_inputs():
    r = np.random.default_rng(1)
    for _ in range(200):
        a = r.normal(size=3)
        a /= np.linalg.norm(a)
        b = r.normal(size=3)
        b /= np.linalg.norm(b)
        ca = np.cos(r.uniform(0, np.pi / 2))
        cb = np.cos(r.uniform(0, np.pi / 2))
        axis, cu = _cone_union(a, ca, b, cb)
        tu = np.arccos(np.clip(cu, -1, 1))
        # both input cones inside the union (slack for fp)
        assert np.arccos(np.clip(np.dot(axis, a), -1, 1)) \
            + np.arccos(ca) <= tu + 1e-4 or cu <= -1.0 + 1e-6
        assert np.arccos(np.clip(np.dot(axis, b), -1, 1)) \
            + np.arccos(cb) <= tu + 1e-4 or cu <= -1.0 + 1e-6


def test_build_structure():
    tris, power = _scene(32)
    lb = build_light_bvh(tris, np.arange(32), power)
    assert np.array_equal(np.sort(lb.prim), np.arange(32))
    # info invariants
    for i in range(lb.nodes.shape[0]):
        a, b = lb.info[i]
        if b > 0:
            assert 0 <= a < 32
        else:
            assert 0 < a < lb.nodes.shape[0]
            assert 0 < -b < lb.nodes.shape[0]
    # root phi = total power
    assert np.isclose(lb.nodes[0, 11], power.sum(), rtol=1e-5)


def test_sample_pdf_consistency():
    """Histogram of tree samples == analytic pmf == pdf eval; pmfs sum to 1."""
    tris, power = _scene(24, seed=2)
    lb = build_light_bvh(tris, np.arange(24), power)
    pairs_np, _ = build_pairs(lb.nodes, lb.info)
    pairs = jnp.asarray(pairs_np)
    prim = jnp.asarray(lb.prim)
    trail = jnp.asarray(lb.trail)

    R = 100_000
    p = jnp.broadcast_to(jnp.asarray([0.0, -2.0, 0.0]), (R, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    u = jnp.asarray(np.random.default_rng(3).uniform(size=R)
                    .astype(np.float32))
    light, pmf, _ = sample_light_tree(pairs, prim, p, n, u)
    light = np.asarray(light)
    pmf = np.asarray(pmf)

    L = 24
    pl = jnp.broadcast_to(jnp.asarray([0.0, -2.0, 0.0]), (L, 3))
    nl = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (L, 3))
    pmf_eval = np.asarray(light_tree_pdf(pairs, trail,
                                         jnp.arange(L), pl, nl))
    assert abs(pmf_eval.sum() - 1.0) < 1e-4
    # sampled pmf must match the pdf eval for the same light exactly
    np.testing.assert_allclose(pmf, pmf_eval[light], rtol=1e-5)
    hist = np.bincount(light, minlength=L) / R
    assert np.abs(hist - pmf_eval).max() < 0.01


def test_importance_prefers_near_bright():
    """A bright close light must be sampled more often than a dim far one."""
    tris = dict(
        p0=np.array([[0, 2, 0], [50, 2, 0]], np.float32),
        e1=np.array([[1, 0, 0], [1, 0, 0]], np.float32),
        e2=np.array([[0, 0, 1], [0, 0, 1]], np.float32))
    power = np.array([10.0, 10.0], np.float32)
    lb = build_light_bvh(tris, np.arange(2), power)
    R = 20_000
    p = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (R, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    u = jnp.asarray(np.random.default_rng(4).uniform(size=R)
                    .astype(np.float32))
    pairs2, _ = build_pairs(lb.nodes, lb.info)
    light, _, _ = sample_light_tree(
        jnp.asarray(pairs2), jnp.asarray(lb.prim), p, n, u)
    frac_near = float((np.asarray(light) == 0).mean())
    assert frac_near > 0.95


@pytest.mark.parametrize("max_cut", [8, 64])
def test_cut_sample_pdf_consistency(max_cut):
    """Cut sampler: histogram == sampled pmf == pdf_cut eval; pmfs sum
    to 1 — with a cut smaller than the light count (residual descent
    exercised) and one that covers every leaf (dense-only)."""
    from truetrace_tpu.build.lightbvh import build_cut
    from truetrace_tpu.kernels.lighttree import (light_tree_pdf_cut,
                                                 sample_light_tree_cut)
    tris, power = _scene(24, seed=5)
    lb = build_light_bvh(tris, np.arange(24), power)
    pairs_np, _ = build_pairs(lb.nodes, lb.info)
    cut = build_cut(lb, max_cut=max_cut)
    assert cut.bounds.shape[0] <= max_cut
    pairs = jnp.asarray(pairs_np)
    prim = jnp.asarray(lb.prim)
    trail = jnp.asarray(lb.trail)
    cb = jnp.asarray(cut.bounds)
    cl = jnp.asarray(cut.link)
    col = jnp.asarray(cut.of_light)
    csk = jnp.asarray(cut.skip)

    R = 100_000
    p = jnp.broadcast_to(jnp.asarray([0.0, -2.0, 0.0]), (R, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    u = jnp.asarray(np.random.default_rng(6).uniform(size=R)
                    .astype(np.float32))
    light, pmf, _ = sample_light_tree_cut(pairs, prim, cb, cl, p, n, u)
    light = np.asarray(light)
    pmf = np.asarray(pmf)

    L = 24
    pl = jnp.broadcast_to(jnp.asarray([0.0, -2.0, 0.0]), (L, 3))
    nl = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (L, 3))
    pmf_eval = np.asarray(light_tree_pdf_cut(
        pairs, trail, cb, cl, col, csk, jnp.arange(L), pl, nl))
    assert abs(pmf_eval.sum() - 1.0) < 1e-4, pmf_eval.sum()
    np.testing.assert_allclose(pmf, pmf_eval[light], rtol=2e-4)
    hist = np.bincount(light, minlength=L) / R
    assert np.abs(hist - pmf_eval).max() < 0.01
