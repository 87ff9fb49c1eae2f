import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.core import aabb
from truetrace_tpu.kernels.cwbvh_ref import (
    any_hit_cwbvh, closest_hit_cwbvh, decode_node)
from truetrace_tpu.kernels.traverse_ref import brute_force_closest

from tests.test_bvh2 import random_tris


def _build(n, seed):
    p0, e1, e2 = random_tris(n, seed=seed)
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box, max_leaf=3, sah_leaf_cap=3)
    perm = bvh.order
    cw = build_cwbvh(bvh, box[perm])
    # final order: bvh2-leaf order then cwbvh emit order
    p0f = p0[perm][cw.tri_index]
    e1f = e1[perm][cw.tri_index]
    e2f = e2[perm][cw.tri_index]
    return bvh, cw, (p0f, e1f, e2f), (p0, e1, e2), perm


def test_cwbvh_structure():
    bvh, cw, _, _, perm = _build(3000, seed=0)
    # every triangle appears exactly once in emit order
    assert np.array_equal(np.sort(cw.tri_index), np.arange(3000))
    # decoded child boxes conservatively contain the true child boxes:
    # walk every node, check quantized slab bounds vs exact bvh2 boxes is
    # implied by traversal equivalence test below; here check encoding sanity
    nodes = jnp.asarray(cw.nodes)
    nd = decode_node(nodes, jnp.arange(cw.n_nodes))
    meta = np.asarray(nd["meta"])
    imask = np.asarray(nd["imask"])
    for i in range(cw.n_nodes):
        for s in range(8):
            m = meta[i, s]
            internal_bit = (imask[i] >> s) & 1
            if m == 0:
                assert internal_bit == 0
            elif internal_bit:
                assert m == (0b0010_0000 | s)
            else:
                count = bin(m >> 5).count("1")
                assert 1 <= count <= 3
    # all internal child pointers in range
    base_child = np.asarray(nd["base_child"])
    n_int = np.array([bin(int(x)).count("1") for x in imask])
    assert np.all(base_child + n_int <= cw.n_nodes)


def test_cwbvh_closest_matches_brute_force():
    _, cw, (p0f, e1f, e2f), _, _ = _build(1500, seed=1)
    r = np.random.default_rng(2)
    R = 512
    ro = jnp.asarray(r.uniform(-15, 15, size=(R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    nodes = jnp.asarray(cw.nodes)
    p0j, e1j, e2j = map(jnp.asarray, (p0f, e1f, e2f))
    hit = closest_hit_cwbvh(nodes, p0j, e1j, e2j, ro, rd, jnp.float32(1e30))
    ref = brute_force_closest(p0j, e1j, e2j, ro, rd, 1e30)

    hit_a = np.asarray(hit.tri) >= 0
    hit_b = np.asarray(ref.tri) >= 0
    assert np.array_equal(hit_a, hit_b)
    assert np.allclose(np.asarray(hit.t)[hit_a], np.asarray(ref.t)[hit_b],
                       rtol=1e-4, atol=1e-5)


def test_cwbvh_any_hit():
    _, cw, (p0f, e1f, e2f), _, _ = _build(800, seed=3)
    r = np.random.default_rng(4)
    R = 256
    ro = jnp.asarray(r.uniform(-15, 15, size=(R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    nodes = jnp.asarray(cw.nodes)
    p0j, e1j, e2j = map(jnp.asarray, (p0f, e1f, e2f))
    occ = any_hit_cwbvh(nodes, p0j, e1j, e2j, ro, rd, jnp.float32(1e30))
    ref = brute_force_closest(p0j, e1j, e2j, ro, rd, 1e30)
    assert np.array_equal(np.asarray(occ), np.asarray(ref.tri) >= 0)


def test_bvh2_leaf_remap_consistent():
    """After CWBVH build, remapped BVH2 leaves must cover all tris once."""
    bvh, cw, _, _, _ = _build(2000, seed=5)
    leaf = bvh.count > 0
    starts = cw.leaf_start[leaf]
    counts = bvh.count[leaf]
    assert np.all(starts >= 0)
    seen = np.zeros(2000, bool)
    for s, c in zip(starts, counts):
        assert not seen[s:s + c].any()
        seen[s:s + c] = True
    assert seen.all()


def test_wavefront_matches_brute_force():
    """Scatter-free wavefront traversal (kernels/cwbvh_wavefront.py) must
    agree with brute force on closest and any-hit, including same-iteration
    pop+push paths (deep trees)."""
    from truetrace_tpu.kernels.cwbvh_wavefront import (
        any_hit_wavefront, closest_hit_wavefront, pack_leaf_rows)
    _, cw, (p0f, e1f, e2f), _, _ = _build(2000, seed=7)
    nodes_l, rows = pack_leaf_rows(cw.nodes, cw.slot_tri_base,
                                   cw.slot_tri_count, p0f, e1f, e2f)
    trip = jnp.asarray(rows)
    nodes = jnp.asarray(nodes_l)
    r = np.random.default_rng(8)
    R = 512
    ro = jnp.asarray(r.uniform(-15, 15, size=(R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    wf = closest_hit_wavefront(nodes, trip, ro, rd, jnp.float32(1e30))
    bf = brute_force_closest(jnp.asarray(p0f), jnp.asarray(e1f),
                             jnp.asarray(e2f), ro, rd, 1e30)
    hm = np.asarray(wf.tri) >= 0
    bm = np.asarray(bf.tri) >= 0
    assert np.array_equal(hm, bm)
    assert np.allclose(np.asarray(wf.t)[hm], np.asarray(bf.t)[bm],
                       rtol=1e-4, atol=1e-4)
    assert np.array_equal(np.asarray(wf.tri)[hm], np.asarray(bf.tri)[bm])

    tmax = jnp.asarray(r.uniform(1.0, 30.0, R).astype(np.float32))
    occ = np.asarray(any_hit_wavefront(nodes, trip, ro, rd, tmax))
    ref_occ = np.asarray(bf.t) < np.asarray(tmax)
    assert np.array_equal(occ, ref_occ)


def test_brute_mxu_matches_reference():
    """Woop-transform MXU brute force == Moller brute force."""
    from truetrace_tpu.kernels.tri_mxu import intersect_brute, pack_woop
    p0, e1, e2 = random_tris(1000, seed=11)
    woop = jnp.asarray(pack_woop(p0, e1, e2))
    r = np.random.default_rng(12)
    R = 512
    ro = jnp.asarray(r.uniform(-15, 15, (R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    h = intersect_brute(woop, ro, rd, jnp.float32(1e30))
    ref = brute_force_closest(jnp.asarray(p0), jnp.asarray(e1),
                              jnp.asarray(e2), ro, rd, 1e30)
    hm = np.asarray(h.tri) >= 0
    bm = np.asarray(ref.tri) >= 0
    assert (hm == bm).mean() > 0.995     # unit-space vs Moller epsilons
    both = hm & bm
    assert np.allclose(np.asarray(h.t)[both], np.asarray(ref.t)[both],
                       rtol=2e-3, atol=2e-4)


def test_mixed_dispatch_matches_split_dispatches():
    """mixed_hit_wavefront: one heterogeneous batch (closest + any-hit
    lanes) must equal the two homogeneous dispatches — the kernel that
    lets an integrator flush shadow rays inside the next bounce's trace
    (reference runs separate kernel_trace/kernel_shadow indirect
    dispatches, RayTracingMaster.cs:968,996)."""
    import jax.numpy as jnp

    from truetrace_tpu.core import rng
    from truetrace_tpu.kernels.cwbvh_wavefront import (
        any_hit_wavefront, closest_hit_wavefront, mixed_hit_wavefront)
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.ir import camera_rays
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats, with_cwbvh=True)
    R = 8192
    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro, rd = camera_rays(cam, 128, 64, pix.astype(jnp.int32), jit2)
    is_any = (pix % 2 == 1)
    t_max = jnp.full((R,), 1e30)

    hit_m = mixed_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                ro, rd, t_max, is_any)
    hit_c = closest_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                  ro, rd, t_max)
    blocked = any_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                ro, rd, t_max)

    m_tri = np.asarray(hit_m.tri)
    sel = np.asarray(is_any)
    # closest lanes: full closest-hit record matches
    np.testing.assert_array_equal(m_tri[~sel], np.asarray(hit_c.tri)[~sel])
    np.testing.assert_allclose(np.asarray(hit_m.t)[~sel],
                               np.asarray(hit_c.t)[~sel])
    # any-hit lanes: found-ness matches the any-hit dispatch
    np.testing.assert_array_equal(m_tri[sel] >= 0, np.asarray(blocked)[sel])
