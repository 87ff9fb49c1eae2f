import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2, sah_cost
from truetrace_tpu.core import aabb
from truetrace_tpu.kernels.traverse_ref import (
    any_hit_bvh2, brute_force_closest, closest_hit_bvh2)


def random_tris(n, seed=0, spread=10.0, size=0.5):
    r = np.random.default_rng(seed)
    p0 = (r.uniform(-1, 1, size=(n, 3)) * spread).astype(np.float32)
    e1 = (r.normal(size=(n, 3)) * size).astype(np.float32)
    e2 = (r.normal(size=(n, 3)) * size).astype(np.float32)
    return p0, e1, e2


def test_build_invariants():
    p0, e1, e2 = random_tris(5000)
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box)
    # every primitive appears exactly once
    assert np.array_equal(np.sort(bvh.order), np.arange(5000))
    leaf = bvh.count > 0
    internal = ~leaf
    # leaf ranges cover [0, T) disjointly
    starts = bvh.left[leaf]
    counts = bvh.count[leaf]
    seen = np.zeros(5000, bool)
    for s, c in zip(starts, counts):
        assert not seen[s:s + c].any()
        seen[s:s + c] = True
    assert seen.all()
    # children fit inside parents
    li = bvh.left[internal]
    parent_box = bvh.box[internal]
    for child in (li, li + 1):
        assert aabb.contains(parent_box, bvh.box[child]).all()
    # SAH cost is sane (for random tri soup, just check finite positive)
    c = sah_cost(bvh)
    assert 0 < c < 1e5


def test_traversal_matches_brute_force():
    p0, e1, e2 = random_tris(800, seed=1)
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box)
    perm = bvh.order
    p0j = jnp.asarray(p0[perm])
    e1j = jnp.asarray(e1[perm])
    e2j = jnp.asarray(e2[perm])

    r = np.random.default_rng(2)
    R = 512
    ro = jnp.asarray(r.uniform(-15, 15, size=(R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    hit = closest_hit_bvh2(jnp.asarray(bvh.box), jnp.asarray(bvh.left),
                           jnp.asarray(bvh.count), p0j, e1j, e2j,
                           ro, rd, jnp.float32(1e30))
    ref = brute_force_closest(p0j, e1j, e2j, ro, rd, 1e30)

    t_a = np.asarray(hit.t)
    t_b = np.asarray(ref.t)
    hit_a = np.asarray(hit.tri) >= 0
    hit_b = np.asarray(ref.tri) >= 0
    assert np.array_equal(hit_a, hit_b)
    assert np.allclose(t_a[hit_a], t_b[hit_b], rtol=1e-4, atol=1e-5)


def test_any_hit_consistent_with_closest():
    p0, e1, e2 = random_tris(500, seed=3)
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box)
    perm = bvh.order
    args = (jnp.asarray(bvh.box), jnp.asarray(bvh.left),
            jnp.asarray(bvh.count), jnp.asarray(p0[perm]),
            jnp.asarray(e1[perm]), jnp.asarray(e2[perm]))

    r = np.random.default_rng(4)
    R = 256
    ro = jnp.asarray(r.uniform(-15, 15, size=(R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    closest = closest_hit_bvh2(*args, ro, rd, jnp.float32(1e30))
    occ = any_hit_bvh2(*args, ro, rd, jnp.float32(1e30))
    assert np.array_equal(np.asarray(occ), np.asarray(closest.tri) >= 0)


def test_single_tri_and_tiny_trees():
    for n in (1, 2, 3, 5):
        p0, e1, e2 = random_tris(n, seed=10 + n)
        box = aabb.from_tris(p0, p0 + e1, p0 + e2)
        bvh = build_bvh2(box)
        assert np.array_equal(np.sort(bvh.order), np.arange(n))
