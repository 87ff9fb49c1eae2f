"""Skinning -> refit -> traverse: the dynamic-scene loop (BASELINE cfg 5)."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.build.refit import level_worklists, refit_cwbvh
from truetrace_tpu.core import aabb
from truetrace_tpu.kernels.cwbvh_wavefront import (
    closest_hit_wavefront, pack_leaf_rows)
from truetrace_tpu.kernels.traverse_ref import brute_force_closest
from truetrace_tpu.scene.skinning import (
    bone_matrix, make_two_bone_cylinder, skin_vertices, skinned_tris)


def test_rest_pose_is_identity():
    mesh = make_two_bone_cylinder()
    bones = jnp.stack([bone_matrix((0, 0, 1), 0.0, (0, 0, 0)),
                       bone_matrix((0, 0, 1), 0.0, (0, 1.0, 0))])
    v = np.asarray(skin_vertices(mesh, bones))
    np.testing.assert_allclose(v, np.asarray(mesh.rest_verts), atol=1e-5)


def test_bend_moves_tip_not_root():
    mesh = make_two_bone_cylinder()
    rest = np.asarray(mesh.rest_verts)
    bones = jnp.stack([bone_matrix((0, 0, 1), 0.0, (0, 0, 0)),
                       bone_matrix((0, 0, 1), 0.7, (0, 1.0, 0))])
    v = np.asarray(skin_vertices(mesh, bones))
    root = rest[:, 1] < 0.2
    tip = rest[:, 1] > 1.8
    assert np.abs(v[root] - rest[root]).max() < 1e-4
    assert np.abs(v[tip] - rest[tip]).max() > 0.3


def test_skinned_refit_traversal_matches_brute_force():
    """Full dynamic loop: build once at rest, bend, refit, traverse."""
    mesh = make_two_bone_cylinder()
    p0, e1, e2 = (np.asarray(x) for x in skinned_tris(
        mesh, jnp.stack([bone_matrix((0, 0, 1), 0.0, (0, 0, 0)),
                         bone_matrix((0, 0, 1), 0.0, (0, 1.0, 0))])))
    box = aabb.from_tris(p0, p0 + e1, p0 + e2)
    bvh = build_bvh2(box, max_leaf=3, sah_leaf_cap=3)
    cw = build_cwbvh(bvh, box[bvh.order])
    perm = bvh.order[cw.tri_index]
    levels = level_worklists(cw)

    # bend pose
    bones = jnp.stack([bone_matrix((0, 0, 1), 0.1, (0, 0, 0)),
                       bone_matrix((1, 0, 0), 0.9, (0, 1.0, 0))])
    np0, ne1, ne2 = skinned_tris(mesh, bones)
    np0, ne1, ne2 = np0[perm], ne1[perm], ne2[perm]
    nodes_l, rows = pack_leaf_rows(
        cw.nodes, cw.slot_tri_base, cw.slot_tri_count,
        np.asarray(np0), np.asarray(ne1), np.asarray(ne2))
    nodes2, root = refit_cwbvh(
        jnp.asarray(nodes_l), np0, ne1, ne2,
        jnp.asarray(cw.slot_child), jnp.asarray(cw.slot_tri_base),
        jnp.asarray(cw.slot_tri_count), levels)

    trip = jnp.asarray(rows)
    r = np.random.default_rng(5)
    R = 256
    ro = jnp.asarray(r.uniform(-4, 4, (R, 3)).astype(np.float32))
    rd = r.normal(size=(R, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    h = closest_hit_wavefront(nodes2, trip, ro, rd, jnp.float32(1e30))
    bf = brute_force_closest(np0, ne1, ne2, ro, rd, 1e30)
    hm = np.asarray(h.tri) >= 0
    assert np.array_equal(hm, np.asarray(bf.tri) >= 0)
    assert np.allclose(np.asarray(h.t)[hm], np.asarray(bf.t)[hm],
                       rtol=1e-4, atol=1e-4)
