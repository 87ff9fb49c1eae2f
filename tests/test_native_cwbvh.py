"""Native C++ CWBVH collapse must match the Python collapse bit-for-bit
(build/native/cwbvh.cpp vs build/cwbvh.py; reference counterpart
Builders/BVH8Builder.cs)."""
import numpy as np
import pytest

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.build.native import build_cwbvh_native, native_available


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_matches_python():
    rng = np.random.default_rng(7)
    T = 3000
    c = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (T, 3)).astype(np.float32)
    prim_box = np.stack([c - h, c + h], axis=1)
    bvh = build_bvh2(prim_box, max_leaf=3, sah_leaf_cap=3, use_native=False)
    pb = prim_box[bvh.order]

    py = build_cwbvh(bvh, pb, use_native=False)
    out = build_cwbvh_native(bvh.box, bvh.left, bvh.count)
    assert out is not None
    (nodes, tri_index, leaf_start, depth, node_depth,
     slot_child, slot_tri_base, slot_tri_count) = out
    assert np.array_equal(nodes, py.nodes)
    assert np.array_equal(tri_index, py.tri_index)
    assert np.array_equal(leaf_start, py.leaf_start)
    assert depth == py.depth
    assert np.array_equal(node_depth, py.node_depth)
    assert np.array_equal(slot_child, py.slot_child)
    assert np.array_equal(slot_tri_base, py.slot_tri_base)
    assert np.array_equal(slot_tri_count, py.slot_tri_count)


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_traversal_correct():
    """Traversal over a native-built tree matches brute-force hits."""
    import jax.numpy as jnp
    from truetrace_tpu.kernels.cwbvh_wavefront import (
        closest_hit_wavefront, pack_leaf_rows)

    rng = np.random.default_rng(3)
    T = 25000     # above the native-dispatch threshold in build_cwbvh
    p0 = rng.uniform(-5, 5, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p0 + e1), p0 + e2)
    hi = np.maximum(np.maximum(p0, p0 + e1), p0 + e2)
    bvh = build_bvh2(np.stack([lo, hi], 1), max_leaf=3, sah_leaf_cap=3)
    cw = build_cwbvh(bvh, np.stack([lo, hi], 1)[bvh.order], use_native=True)
    order = bvh.order[cw.tri_index]
    p0o, e1o, e2o = p0[order], e1[order], e2[order]
    nodes_l, rows = pack_leaf_rows(cw.nodes, cw.slot_tri_base,
                                   cw.slot_tri_count, p0o, e1o, e2o)
    trip = jnp.asarray(rows)

    R = 512
    ro = jnp.asarray(rng.uniform(-6, 6, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = jnp.asarray(d)
    hit = closest_hit_wavefront(jnp.asarray(nodes_l), trip, ro, rd,
                                jnp.float32(1e30))
    # brute force reference on a subsample
    from truetrace_tpu.kernels.tri_mxu import intersect_brute, pack_woop
    woop = jnp.asarray(pack_woop(p0o, e1o, e2o))
    ref = intersect_brute(woop, ro, rd, jnp.float32(1e30))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-3, atol=1e-3)
