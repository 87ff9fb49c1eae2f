"""Fat leaf rows (K=6 tris/row, 60-word rows) vs the default K=3 build.

The HBM-resident dependent gather has a flat mode at W>=60 (~same ns/row
as W=30 — BASELINE.md round-3 width map), so K=6 rows halve leaf
iterations on big scenes for free. These tests pin exact agreement of
closest-hit / any-hit / transmittance between the two builds on the same
geometry (reference counterpart: leaf size is a build-time constant,
TrueTrace BVH8Builder.cs:229 collapse cost — here it is a measured
per-scene knob)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.core import aabb
from truetrace_tpu.kernels.cwbvh_wavefront import (
    any_hit_wavefront, closest_hit_wavefront, pack_leaf_rows,
    pack_leaf_rows_jax, transmit_wavefront)

from tests.test_bvh2 import random_tris


def _build_k(p0, e1, e2, k, use_native=False):
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box, max_leaf=k, sah_leaf_cap=k)
    perm = bvh.order
    cw = build_cwbvh(bvh, box[perm], p_max=k, use_native=use_native)
    p0f, e1f, e2f = (a[perm][cw.tri_index] for a in (p0, e1, e2))
    nodes, rows = pack_leaf_rows(cw.nodes, cw.slot_tri_base,
                                 cw.slot_tri_count, p0f, e1f, e2f, k=k)
    # CWBVH-order tri id -> input tri id
    to_input = perm[cw.tri_index]
    return (jnp.asarray(nodes), jnp.asarray(rows), to_input,
            int(cw.depth) + 1, cw)


def _rays(n, seed):
    r = np.random.default_rng(seed)
    ro = jnp.asarray(r.uniform(-12, 12, size=(n, 3)).astype(np.float32))
    rd = r.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, jnp.asarray(rd.astype(np.float32))


def test_fat_build_structure():
    p0, e1, e2 = random_tris(4000, seed=3)
    nodes, rows, to_input, _, cw = _build_k(p0, e1, e2, 6)
    assert rows.shape[1] == 60
    assert np.array_equal(np.sort(cw.tri_index), np.arange(4000))
    # slot metadata honors the fat cap and feeds >3-tri slots
    cnt = cw.slot_tri_count
    assert cnt.max() <= 6
    assert (cnt > 3).any(), "fat build never made a >3-tri slot"
    # every row's ids are either -1 or a valid consecutive run
    ids = np.asarray(rows[:, 54:60]).view(np.int32)
    valid = ids >= 0
    assert (ids[valid] < 4000).all()


def test_fat_closest_matches_k3():
    p0, e1, e2 = random_tris(3000, seed=4)
    n3, r3, m3, s3, _ = _build_k(p0, e1, e2, 3)
    ro, rd = _rays(2048, seed=5)
    h3 = closest_hit_wavefront(n3, r3, ro, rd, 1e30, max_stack=s3)
    t3 = np.where(np.asarray(h3.tri) >= 0, m3[np.asarray(h3.tri)], -1)
    for k in (6, 12):
        nk, rk, mk, sk, _ = _build_k(p0, e1, e2, k)
        hk = closest_hit_wavefront(nk, rk, ro, rd, 1e30, max_stack=sk)
        np.testing.assert_allclose(np.asarray(h3.t), np.asarray(hk.t),
                                   rtol=1e-5, atol=1e-5)
        tk = np.where(np.asarray(hk.tri) >= 0, mk[np.asarray(hk.tri)], -1)
        assert (t3 == tk).mean() > 0.999  # exact-tie hits may differ
        np.testing.assert_allclose(np.asarray(h3.u)[t3 == tk],
                                   np.asarray(hk.u)[t3 == tk], atol=1e-5)


def test_fat_any_hit_matches_k3():
    p0, e1, e2 = random_tris(2500, seed=6)
    n3, r3, _, s3, _ = _build_k(p0, e1, e2, 3)
    n6, r6, _, s6, _ = _build_k(p0, e1, e2, 6)
    ro, rd = _rays(2048, seed=7)
    tm = jnp.full((2048,), 14.0, jnp.float32)
    a3 = np.asarray(any_hit_wavefront(n3, r3, ro, rd, tm, max_stack=s3))
    a6 = np.asarray(any_hit_wavefront(n6, r6, ro, rd, tm, max_stack=s6))
    assert np.array_equal(a3, a6)


def test_fat_transmit_matches_k3():
    p0, e1, e2 = random_tris(1500, seed=8)
    rng = np.random.default_rng(9)
    tint_in = rng.uniform(0.2, 1.0, size=(1500, 3)).astype(np.float32)
    n3, r3, m3, s3, _ = _build_k(p0, e1, e2, 3)
    n6, r6, m6, s6, _ = _build_k(p0, e1, e2, 6)
    ro, rd = _rays(1024, seed=10)
    tm = jnp.full((1024,), 18.0, jnp.float32)
    tp3 = transmit_wavefront(n3, r3, jnp.asarray(tint_in[m3]), ro, rd, tm,
                             max_stack=s3)
    tp6 = transmit_wavefront(n6, r6, jnp.asarray(tint_in[m6]), ro, rd, tm,
                             max_stack=s6)
    np.testing.assert_allclose(np.asarray(tp3), np.asarray(tp6),
                               rtol=1e-4, atol=1e-4)


def test_fat_pack_jax_matches_host():
    p0, e1, e2 = random_tris(2000, seed=11)
    _, rows, _, _, cw = _build_k(p0, e1, e2, 6)
    mask = cw.slot_tri_count > 0
    perm = build_bvh2(aabb.from_tris(p0, p0 + e1, p0 + e2),
                      max_leaf=6, sah_leaf_cap=6).order
    p0f, e1f, e2f = (jnp.asarray(a[perm][cw.tri_index])
                     for a in (p0, e1, e2))
    rows_j = pack_leaf_rows_jax(cw.slot_tri_base[mask],
                                cw.slot_tri_count[mask],
                                p0f, e1f, e2f, k=6)
    np.testing.assert_allclose(np.asarray(rows_j), np.asarray(rows),
                               atol=0)


def test_fat_native_matches_python():
    p0, e1, e2 = random_tris(25000, seed=12)  # above the native threshold
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box, max_leaf=6, sah_leaf_cap=6)
    cw_py = build_cwbvh(bvh, box[bvh.order], p_max=6, use_native=False)
    cw_na = build_cwbvh(bvh, box[bvh.order], p_max=6, use_native=True)
    if cw_na.nodes.shape == cw_py.nodes.shape and np.array_equal(
            cw_na.nodes, cw_py.nodes):
        assert np.array_equal(cw_na.tri_index, cw_py.tri_index)
        assert np.array_equal(cw_na.slot_tri_base, cw_py.slot_tri_base)
        assert np.array_equal(cw_na.slot_tri_count, cw_py.slot_tri_count)
    else:  # native lib unavailable -> both py (still equal) or mismatch
        raise AssertionError("native fat build differs from python build")


def test_fat_tlas_matches_k3():
    """Instanced TLAS traversal with fat (k=6) BLAS rows == k=3 rows."""
    from truetrace_tpu.kernels.cwbvh_tlas import closest_hit_tlas
    from truetrace_tpu.scene.instances import build_instanced
    from truetrace_tpu.scene.mesh import HostMesh

    rng = np.random.default_rng(14)
    p0, e1, e2 = random_tris(400, seed=14, spread=2.0, size=0.4)
    verts = np.concatenate([p0, p0 + e1, p0 + e2], axis=0)
    idx = np.arange(1200, dtype=np.int32).reshape(3, 400).T
    src = HostMesh(verts.astype(np.float32), idx,
                   np.zeros(400, np.int32))
    insts = []
    for i in range(6):
        m = np.eye(4, dtype=np.float32)
        m[3, :3] = rng.uniform(-4, 4, 3)
        insts.append((0, m))
    ro, rd = _rays(1024, seed=15)
    hits = {}
    insts_out = {}
    for k in (3, 6):
        isc = build_instanced([src], insts, leaf_k=k)
        h, inst = closest_hit_tlas(jnp.asarray(isc.cw_nodes),
                                   jnp.asarray(isc.leaf_rows),
                                   jnp.asarray(isc.inst_rows), ro, rd, 1e30)
        hits[k] = h
        insts_out[k] = inst
    np.testing.assert_allclose(np.asarray(hits[3].t),
                               np.asarray(hits[6].t), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(insts_out[3]),
                                  np.asarray(insts_out[6]))


def test_compile_scene_fat_renders_same():
    """compile_scene(leaf_k=6) traces the same image as leaf_k=3."""
    from truetrace_tpu.scene.cornell import make
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, _ = make()
    s3 = compile_scene(meshes, mats, with_cwbvh=True, leaf_k=3)
    s6 = compile_scene(meshes, mats, with_cwbvh=True, leaf_k=6)
    assert s6.cw_leaf_rows.shape[1] == 60
    ro, rd = _rays(1024, seed=13)
    h3 = closest_hit_wavefront(s3.cw_nodes, s3.cw_leaf_rows, ro, rd, 1e30,
                               max_stack=s3.cw_stack)
    h6 = closest_hit_wavefront(s6.cw_nodes, s6.cw_leaf_rows, ro, rd, 1e30,
                               max_stack=s6.cw_stack)
    np.testing.assert_allclose(np.asarray(h3.t), np.asarray(h6.t),
                               rtol=1e-5, atol=1e-5)


def test_hot_order_bitwise_identical():
    """compile_scene(hot_order=True) permutes leaf-row groups by heat
    and rewrites node word 5 — the traced image must be BITWISE
    identical (rows embed their own tri data + global ids)."""
    import jax.numpy as jnp
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam = cornell.make()
    s0 = compile_scene(meshes, mats, with_cwbvh=True)
    s1 = compile_scene(meshes, mats, with_cwbvh=True, hot_order=True)
    assert not np.array_equal(np.asarray(s0.cw_leaf_rows),
                              np.asarray(s1.cw_leaf_rows)) \
        or s0.cw_leaf_rows.shape[0] <= 1
    # row multiset preserved
    assert np.array_equal(
        np.sort(np.asarray(s0.cw_leaf_rows).view(np.int32), axis=0),
        np.sort(np.asarray(s1.cw_leaf_rows).view(np.int32), axis=0))
    cfg = RenderConfig(width=24, height=24, bounces=2, bsdf="lambert",
                       traversal="wavefront")
    np.testing.assert_array_equal(
        np.asarray(render(s0, cam, cfg, spp=2)),
        np.asarray(render(s1, cam, cfg, spp=2)))


def test_cascade_stage_knobs_bitwise():
    """stages/floor only change WHEN compaction happens, never results:
    hits must be bitwise identical across knob settings."""
    from truetrace_tpu.kernels.cwbvh_wavefront import _traverse_cascade
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.core import rng as _rng
    from truetrace_tpu.scene.ir import camera_rays

    meshes, mats, cam = cornell.make()
    sc = compile_scene(meshes, mats, with_cwbvh=True)
    R = 1 << 14
    pix = jnp.arange(R, dtype=jnp.uint32)
    jit2 = _rng.uniform2(pix, jnp.uint32(0), jnp.uint32(0))
    ro, rd = camera_rays(cam, 128, R // 128, pix.astype(jnp.int32), jit2)
    tm = jnp.full((R,), 1e30, jnp.float32)

    base = None
    for stages, floor in ((8, 512), (4, 512), (8, 4096), (12, 128)):
        h = _traverse_cascade(sc.cw_nodes, sc.cw_leaf_rows, ro, rd, tm,
                              False, sc.cw_stack, stages=stages,
                              floor=floor)
        if base is None:
            base = h
        else:
            for a, b in zip(base, h):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))
