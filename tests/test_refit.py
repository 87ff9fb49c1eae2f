"""CWBVH refit: deformed geometry must traverse exactly like a rebuild."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.build.refit import (
    deform_tris, level_worklists, refit_cwbvh)
from truetrace_tpu.core import aabb
from truetrace_tpu.kernels.cwbvh_wavefront import (
    closest_hit_wavefront, pack_leaf_rows)
from truetrace_tpu.kernels.traverse_ref import brute_force_closest

from tests.test_bvh2 import random_tris


def _build(n=1200, seed=0):
    p0, e1, e2 = random_tris(n, seed=seed)
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box, max_leaf=3, sah_leaf_cap=3)
    cw = build_cwbvh(bvh, box[bvh.order])
    perm = bvh.order[cw.tri_index]
    return cw, p0[perm], e1[perm], e2[perm]


def test_refit_identity_preserves_traversal():
    """Refitting with unchanged geometry must keep traversal exact."""
    cw, p0, e1, e2 = _build()
    levels = level_worklists(cw)
    nodes_l, rows = pack_leaf_rows(cw.nodes, cw.slot_tri_base,
                                   cw.slot_tri_count, p0, e1, e2)
    nodes2, root = refit_cwbvh(
        jnp.asarray(nodes_l), jnp.asarray(p0), jnp.asarray(e1),
        jnp.asarray(e2), jnp.asarray(cw.slot_child),
        jnp.asarray(cw.slot_tri_base), jnp.asarray(cw.slot_tri_count),
        levels)
    trip = jnp.asarray(rows)
    r = np.random.default_rng(1)
    R = 256
    ro = jnp.asarray(r.uniform(-15, 15, (R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    h_old = closest_hit_wavefront(jnp.asarray(nodes_l), trip, ro, rd,
                                  jnp.float32(1e30))
    h_new = closest_hit_wavefront(nodes2, trip, ro, rd, jnp.float32(1e30))
    assert np.array_equal(np.asarray(h_old.tri), np.asarray(h_new.tri))
    # root aabb contains all tris
    lo = np.minimum(np.minimum(p0, p0 + e1), p0 + e2).min(0)
    hi = np.maximum(np.maximum(p0, p0 + e1), p0 + e2).max(0)
    assert np.all(np.asarray(root[0]) <= lo + 1e-4)
    assert np.all(np.asarray(root[1]) >= hi - 1e-4)


def test_refit_after_deformation_matches_brute_force():
    """Deform (twist + translate), refit, traverse: must equal brute force
    on the deformed triangles — the conservative-quantization guarantee."""
    cw, p0, e1, e2 = _build(seed=2)
    levels = level_worklists(cw)

    def twist(v):
        ang = 0.08 * v[:, 1]
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        x = c * v[:, 0] - s * v[:, 2]
        z = s * v[:, 0] + c * v[:, 2]
        return jnp.stack([x + 0.5, v[:, 1] * 1.1, z - 0.25], axis=-1)

    np0, ne1, ne2 = deform_tris(jnp.asarray(p0), jnp.asarray(e1),
                                jnp.asarray(e2), twist)
    nodes_l, rows = pack_leaf_rows(
        cw.nodes, cw.slot_tri_base, cw.slot_tri_count,
        np.asarray(np0), np.asarray(ne1), np.asarray(ne2))
    nodes2, _ = refit_cwbvh(
        jnp.asarray(nodes_l), np0, ne1, ne2,
        jnp.asarray(cw.slot_child), jnp.asarray(cw.slot_tri_base),
        jnp.asarray(cw.slot_tri_count), levels)

    trip = jnp.asarray(rows)
    r = np.random.default_rng(3)
    R = 384
    ro = jnp.asarray(r.uniform(-15, 15, (R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    h = closest_hit_wavefront(nodes2, trip, ro, rd, jnp.float32(1e30))
    bf = brute_force_closest(np0, ne1, ne2, ro, rd, 1e30)
    hm = np.asarray(h.tri) >= 0
    bm = np.asarray(bf.tri) >= 0
    assert np.array_equal(hm, bm)
    assert np.allclose(np.asarray(h.t)[hm], np.asarray(bf.t)[bm],
                       rtol=1e-4, atol=1e-4)
