"""Instanced scenes: shared BLAS + per-instance transforms (TLAS level).

Counterpart of the reference's instancing stack (InstancedManager.cs /
InstancedObject.cs: instance sources keep one BLAS + material set; each
instance adds a TLAS entry with its own transform, consumed at
AssetManager.cs:1714-1750; MyMeshDataCompacted carries W2L + offsets,
CommonVars.cs:246-255).

TPU round-1 traversal strategy: instances are culled per ray against their
world AABBs (vectorized; the instance table is small) and each instance's
BLAS is traversed with the ray transformed into local space; the global
`t_max` carries across instances so later instances are pruned by earlier
hits. This is exact (same result as an interleaved TLAS descent) and
vector-friendly for moderate instance counts; the interleaved two-level
wavefront is the planned upgrade for large instance counts.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.core import aabb as aabb_ops
from truetrace_tpu.kernels.cwbvh_wavefront import pack_leaf_rows
from truetrace_tpu.kernels.traverse_ref import Hit
from truetrace_tpu.scene.mesh import HostMesh, flatten_meshes


@dataclass
class InstancedScene:
    """Aggregated multi-BLAS geometry + instance table (host-built)."""
    cw_nodes: jnp.ndarray        # [C,20] TLAS nodes then BLAS nodes
    leaf_rows: jnp.ndarray       # [L,30] aggregated packed leaf rows
    tri_p0: jnp.ndarray          # [T,3] (local space)
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_mat: jnp.ndarray         # [T] global material id
    node_offset: jnp.ndarray     # [I] int32 per instance (BLAS root id)
    tri_offset: jnp.ndarray      # [I]
    l2w: jnp.ndarray             # [I,3,4] rows (rotation+translation)
    w2l: jnp.ndarray             # [I,3,4]
    world_aabb: jnp.ndarray      # [I,2,3]
    n_instances: int
    inst_rows: jnp.ndarray = None   # [I,30] instance rows (TLAS leaf order)
    n_tlas_nodes: int = 0


def _mat34(m: np.ndarray) -> np.ndarray:
    """4x4 row-vector-convention matrix -> 3x4 (rot rows + translation)."""
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = m[:3, :3].T      # column-vector rotation
    out[:, 3] = m[3, :3]
    return out


def make_transform(translate=(0, 0, 0), rot_y: float = 0.0,
                   scale: float = 1.0) -> np.ndarray:
    """4x4 local->world (row-vector convention, like Camera.c2w)."""
    c, s = np.cos(rot_y), np.sin(rot_y)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                         np.float32) * scale
    m[3, :3] = translate
    return m


def build_instanced(sources: Sequence[HostMesh],
                    instances: Sequence[Tuple[int, np.ndarray]],
                    ) -> InstancedScene:
    """sources: one HostMesh per unique geometry (local space);
    instances: (source_id, l2w 4x4) pairs."""
    nodes_list, row_list = [], []
    p0l, e1l, e2l, matl = [], [], [], []
    src_tables = []
    n_off = t_off = l_off = 0
    for mesh in sources:
        tris = flatten_meshes([mesh])
        box = aabb_ops.from_tris(tris["p0"], tris["p0"] + tris["e1"],
                                 tris["p0"] + tris["e2"])
        bvh = build_bvh2(box, max_leaf=3, sah_leaf_cap=3)
        cw = build_cwbvh(bvh, box[bvh.order])
        perm = bvh.order[cw.tri_index]
        p0 = tris["p0"][perm]
        e1 = tris["e1"][perm]
        e2 = tris["e2"][perm]
        mat = tris["mat"][perm]
        w, rows = pack_leaf_rows(cw.nodes, cw.slot_tri_base,
                                 cw.slot_tri_count, p0, e1, e2)
        # relocate node child/leaf pointers + global tri ids by the
        # aggregate offsets
        w[:, 4] += n_off
        w[:, 5] += l_off
        idv = rows.view(np.int32)[:, 27:30]
        idv[idv >= 0] += t_off
        nodes_list.append(w)
        row_list.append(rows)
        p0l.append(p0)
        e1l.append(e1)
        e2l.append(e2)
        matl.append(mat)
        src_tables.append((n_off, t_off, box[bvh.order][cw.tri_index]))
        n_off += w.shape[0]
        t_off += p0.shape[0]
        l_off += rows.shape[0]

    l2w_rows, w2l_rows, n_offs, t_offs, aabbs = [], [], [], [], []
    for src_id, m in instances:
        n0, t0, local_boxes = src_tables[src_id]
        n_offs.append(n0)
        t_offs.append(t0)
        l2w_rows.append(_mat34(m))
        w2l_rows.append(_mat34(np.linalg.inv(m)))
        # world AABB: transform the 8 corners of the local root box
        lo = local_boxes[:, 0].min(0)
        hi = local_boxes[:, 1].max(0)
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])], np.float32)
        wc = corners @ m[:3, :3] + m[3, :3]
        aabbs.append(np.stack([wc.min(0), wc.max(0)]))

    # ---- interleaved TLAS (kernels/cwbvh_tlas.py): CWBVH over instance
    # world AABBs, one instance per leaf slot; TLAS nodes go FIRST in the
    # aggregate node buffer, so every BLAS pointer shifts by n_tlas
    from truetrace_tpu.kernels.cwbvh_tlas import pack_instance_rows
    world_aabb_np = np.stack(aabbs).astype(np.float32)
    w2l_np = np.stack(w2l_rows)
    n_off_np = np.asarray(n_offs, np.int32)
    bvh_t = build_bvh2(world_aabb_np, max_leaf=1, sah_leaf_cap=1,
                       use_native=False)
    cw_t = build_cwbvh(bvh_t, world_aabb_np[bvh_t.order], use_native=False)
    inst_perm = bvh_t.order[cw_t.tri_index]      # emit order -> instance id
    mask = cw_t.slot_tri_count > 0
    per_node = mask.sum(axis=1)
    base_row = np.concatenate([[0], np.cumsum(per_node)[:-1]])
    tlas_nodes = cw_t.nodes.copy()
    tlas_nodes[:, 5] = base_row.astype(np.uint32)
    n_tlas = tlas_nodes.shape[0]
    row_inst = inst_perm[cw_t.slot_tri_base[mask]]   # instance per row
    inst_rows = pack_instance_rows(
        w2l_np[row_inst], n_off_np[row_inst] + n_tlas, row_inst)
    blas_nodes = np.concatenate(nodes_list)
    blas_nodes[:, 4] += n_tlas

    return InstancedScene(
        cw_nodes=jnp.asarray(np.concatenate([tlas_nodes, blas_nodes])),
        leaf_rows=jnp.asarray(np.concatenate(row_list)),
        tri_p0=jnp.asarray(np.concatenate(p0l)),
        tri_e1=jnp.asarray(np.concatenate(e1l)),
        tri_e2=jnp.asarray(np.concatenate(e2l)),
        tri_mat=jnp.asarray(np.concatenate(matl)),
        node_offset=jnp.asarray(n_off_np + n_tlas),
        tri_offset=jnp.asarray(np.asarray(t_offs, np.int32)),
        l2w=jnp.asarray(np.stack(l2w_rows)),
        w2l=jnp.asarray(w2l_np),
        world_aabb=jnp.asarray(world_aabb_np),
        n_instances=len(instances),
        inst_rows=jnp.asarray(inst_rows),
        n_tlas_nodes=n_tlas,
    )


def closest_hit_instanced_tlas(sc: InstancedScene, ro, rd, t_max):
    """Interleaved two-level traversal (kernels/cwbvh_tlas.py): one O(log)
    descent instead of the per-instance loop below. Returns (Hit with
    GLOBAL tri ids, instance id per ray)."""
    from truetrace_tpu.kernels.cwbvh_tlas import closest_hit_tlas
    return closest_hit_tlas(sc.cw_nodes, sc.leaf_rows, sc.inst_rows,
                            ro, rd, t_max)


def any_hit_instanced_tlas(sc: InstancedScene, ro, rd, t_max):
    from truetrace_tpu.kernels.cwbvh_tlas import any_hit_tlas
    return any_hit_tlas(sc.cw_nodes, sc.leaf_rows, sc.inst_rows,
                        ro, rd, t_max)


def _xform_point(m34, p):
    return jnp.einsum("ij,...j->...i", m34[:, :3], p) + m34[:, 3]


def _xform_dir(m34, d):
    return jnp.einsum("ij,...j->...i", m34[:, :3], d)


def closest_hit_instanced(sc: InstancedScene, ro, rd, t_max) -> Hit:
    """Two-level closest hit: per-instance AABB cull + local-space BLAS
    traversal, with t_max threaded across instances. Returns Hit with
    GLOBAL triangle ids (aggregate order)."""
    R = ro.shape[0]
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)
                              ).astype(jnp.float32)
    tri_best = jnp.full((R,), -1, jnp.int32)
    u_best = jnp.zeros((R,), jnp.float32)
    v_best = jnp.zeros((R,), jnp.float32)

    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, 1e-12, rd)
    for i in range(sc.n_instances):
        lo = sc.world_aabb[i, 0]
        hi = sc.world_aabb[i, 1]
        t0 = (lo - ro) * inv
        t1 = (hi - ro) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        maybe = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
        # transform into local space (scale-preserving t requires uniform
        # scale; non-uniform handled by re-deriving t from world hit point)
        ro_l = _xform_point(sc.w2l[i], ro)
        rd_l = _xform_dir(sc.w2l[i], rd)
        scale = jnp.linalg.norm(rd_l, axis=-1)
        rd_ln = rd_l / jnp.maximum(scale, 1e-20)[..., None]
        # offset the BLAS root: traversal starts at node_offset[i]
        from truetrace_tpu.kernels import cwbvh_wavefront as wf
        h = wf._traverse(sc.cw_nodes, sc.leaf_rows, ro_l, rd_ln,
                         jnp.where(maybe, t_best * scale, 0.0),
                         any_hit=False, max_stack=wf.MAX_STACK,
                         root=sc.node_offset[i])
        took = h.tri >= 0
        t_w = h.t / jnp.maximum(scale, 1e-20)
        better = took & (t_w < t_best)
        t_best = jnp.where(better, t_w, t_best)
        tri_best = jnp.where(better, h.tri, tri_best)
        u_best = jnp.where(better, h.u, u_best)
        v_best = jnp.where(better, h.v, v_best)
    return Hit(t=t_best, tri=tri_best, u=u_best, v=v_best)


def any_hit_instanced(sc: InstancedScene, ro, rd, t_max):
    from truetrace_tpu.kernels import cwbvh_wavefront as wf
    R = ro.shape[0]
    blocked = jnp.zeros((R,), bool)
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12, 1e-12, rd)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    for i in range(sc.n_instances):
        lo = sc.world_aabb[i, 0]
        hi = sc.world_aabb[i, 1]
        t0 = (lo - ro) * inv
        t1 = (hi - ro) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        maybe = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_max) & ~blocked
        ro_l = _xform_point(sc.w2l[i], ro)
        rd_l = _xform_dir(sc.w2l[i], rd)
        scale = jnp.linalg.norm(rd_l, axis=-1)
        rd_ln = rd_l / jnp.maximum(scale, 1e-20)[..., None]
        h = wf._traverse(sc.cw_nodes, sc.leaf_rows, ro_l, rd_ln,
                         jnp.where(maybe, t_max * scale, 0.0),
                         any_hit=True, max_stack=wf.MAX_STACK,
                         root=sc.node_offset[i])
        blocked = blocked | (h.tri >= 0)
    return blocked
