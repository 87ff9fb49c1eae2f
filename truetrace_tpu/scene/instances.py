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
from typing import List, NamedTuple, Optional, Sequence, Tuple

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
    # full vertex attributes (local space, CWBVH order) + source metadata,
    # populated so compile_scene_instanced can build a shade-able Scene
    tri_n: jnp.ndarray = None       # [T,3,3]
    tri_uv: jnp.ndarray = None      # [T,3,2]
    tri_tan: jnp.ndarray = None     # [T,3]
    src_tri_offset: np.ndarray = None   # [S] int
    src_tri_count: np.ndarray = None    # [S]
    inst_src: np.ndarray = None         # [I] source id per instance
    src_local_aabb: np.ndarray = None   # [S,2,3] local root bounds


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


class SourceBuild(NamedTuple):
    """One source mesh's BLAS build in LOCAL, un-relocated form — the unit
    the AssetManager's background build pool produces (counterpart of the
    reference's per-ParentObject BuildTotal worker task,
    Resources/AssetManager.cs:978 + Objects/ParentObject.cs:973)."""
    nodes: np.ndarray       # [C,20] u32, pointers source-local
    rows: np.ndarray        # [L,30] leaf rows, tri ids source-local
    p0: np.ndarray
    e1: np.ndarray
    e2: np.ndarray
    mat: np.ndarray
    n: np.ndarray
    uv: np.ndarray
    tan: np.ndarray
    local_boxes: np.ndarray  # [T,2,3]


def build_source(mesh: HostMesh, leaf_k: int = 3) -> SourceBuild:
    """BLAS-build one source mesh (BVH2 -> CWBVH -> packed leaf rows) in
    local space. Pure function of the mesh — safe to run on a worker
    thread and cache across rebuilds. leaf_k: tris per leaf row (fat
    rows for big sources — see compile_scene)."""
    tris = flatten_meshes([mesh])
    box = aabb_ops.from_tris(tris["p0"], tris["p0"] + tris["e1"],
                             tris["p0"] + tris["e2"])
    bvh = build_bvh2(box, max_leaf=leaf_k, sah_leaf_cap=leaf_k)
    cw = build_cwbvh(bvh, box[bvh.order], p_max=leaf_k)
    perm = bvh.order[cw.tri_index]
    w, rows = pack_leaf_rows(cw.nodes, cw.slot_tri_base,
                             cw.slot_tri_count, tris["p0"][perm],
                             tris["e1"][perm], tris["e2"][perm],
                             k=leaf_k)
    return SourceBuild(nodes=w, rows=rows, p0=tris["p0"][perm],
                       e1=tris["e1"][perm], e2=tris["e2"][perm],
                       mat=tris["mat"][perm], n=tris["n"][perm],
                       uv=tris["uv"][perm], tan=tris["tan"][perm],
                       local_boxes=box[bvh.order][cw.tri_index])


def _auto_leaf_k(sources: Sequence[HostMesh]) -> int:
    """Same data-driven rule as compile_scene(leaf_k=None): k=6 for
    cache-resident tables (<=~400k tris), k=12 in the HBM regime where
    it wins both ray classes (BASELINE.md round-5 leaf_k tables)."""
    total = sum(int(np.asarray(s.indices).shape[0]) for s in sources)
    return 6 if total <= 400_000 else 12


def build_instanced(sources: Sequence[HostMesh],
                    instances: Sequence[Tuple[int, np.ndarray]],
                    prebuilt: Optional[Sequence[SourceBuild]] = None,
                    leaf_k: Optional[int] = None) -> InstancedScene:
    """sources: one HostMesh per unique geometry (local space);
    instances: (source_id, l2w 4x4) pairs. prebuilt: optional per-source
    BLAS builds (AssetManager background pool) — skips rebuild (they
    must share this leaf_k). leaf_k=None auto-selects (_auto_leaf_k)."""
    if leaf_k is None:
        leaf_k = _auto_leaf_k(sources)
    nodes_list, row_list = [], []
    p0l, e1l, e2l, matl = [], [], [], []
    nl, uvl, tanl = [], [], []
    src_tables = []
    src_off, src_cnt, src_aabb = [], [], []
    n_off = t_off = l_off = 0
    for si, mesh in enumerate(sources):
        sb = (prebuilt[si] if prebuilt is not None and
              prebuilt[si] is not None else build_source(mesh, leaf_k))
        # relocate node child/leaf pointers + global tri ids by the
        # aggregate offsets
        w = sb.nodes.copy()
        rows = sb.rows.copy()
        assert rows.shape[1] == 10 * leaf_k, \
            "prebuilt SourceBuild leaf_k mismatch"
        w[:, 4] += n_off
        w[:, 5] += l_off
        idv = rows.view(np.int32)[:, 9 * leaf_k: 10 * leaf_k]
        idv[idv >= 0] += t_off
        nodes_list.append(w)
        row_list.append(rows)
        p0l.append(sb.p0)
        e1l.append(sb.e1)
        e2l.append(sb.e2)
        matl.append(sb.mat)
        nl.append(sb.n)
        uvl.append(sb.uv)
        tanl.append(sb.tan)
        local_boxes = sb.local_boxes
        src_tables.append((n_off, t_off, local_boxes))
        src_off.append(t_off)
        src_cnt.append(sb.p0.shape[0])
        src_aabb.append(np.stack([local_boxes[:, 0].min(0),
                                  local_boxes[:, 1].max(0)]))
        n_off += w.shape[0]
        t_off += sb.p0.shape[0]
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
        w2l_np[row_inst], n_off_np[row_inst] + n_tlas, row_inst,
        width=10 * leaf_k)
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
        tri_n=jnp.asarray(np.concatenate(nl)),
        tri_uv=jnp.asarray(np.concatenate(uvl)),
        tri_tan=jnp.asarray(np.concatenate(tanl)),
        src_tri_offset=np.asarray(src_off, np.int64),
        src_tri_count=np.asarray(src_cnt, np.int64),
        inst_src=np.asarray([s for s, _ in instances], np.int64),
        src_local_aabb=np.stack(src_aabb).astype(np.float32),
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


def _world_light_tris(isc: InstancedScene, mats, l2w_rows: np.ndarray):
    """Materialize world-space copies of every emissive instance triangle
    (NEE needs world geometry; the shared BLAS rows are local). Returns
    dict of appended arrays + per-local-row emissive rank + per-instance
    light offset."""
    emis = np.array([np.max(m.emission) for m in mats], np.float32)
    mat_np = np.asarray(isc.tri_mat)
    T_local = mat_np.shape[0]
    em_rank = np.full((T_local,), -1, np.int32)
    src_em_ids = []
    for s in range(len(isc.src_tri_offset)):
        o = int(isc.src_tri_offset[s])
        c = int(isc.src_tri_count[s])
        ids = o + np.nonzero(emis[mat_np[o:o + c]] > 0.0)[0]
        em_rank[ids] = np.arange(ids.size, dtype=np.int32)
        src_em_ids.append(ids.astype(np.int64))

    p0 = np.asarray(isc.tri_p0)
    e1 = np.asarray(isc.tri_e1)
    e2 = np.asarray(isc.tri_e2)
    nrm = np.asarray(isc.tri_n)
    uv = np.asarray(isc.tri_uv)
    tan = np.asarray(isc.tri_tan)

    ap = {k: [] for k in ("p0", "e1", "e2", "n", "uv", "tan", "mat")}
    light_offset = np.full((isc.n_instances,), -1, np.int32)
    total = 0
    for i in range(isc.n_instances):
        ids = src_em_ids[int(isc.inst_src[i])]
        if ids.size == 0:
            continue
        m34 = l2w_rows[i]
        rot = m34[:, :3]
        light_offset[i] = total
        total += ids.size
        ap["p0"].append(p0[ids] @ rot.T + m34[:, 3])
        ap["e1"].append(e1[ids] @ rot.T)
        ap["e2"].append(e2[ids] @ rot.T)
        nw = nrm[ids] @ rot.T
        nw /= np.maximum(np.linalg.norm(nw, axis=-1, keepdims=True), 1e-12)
        ap["n"].append(nw)
        ap["uv"].append(uv[ids])
        ap["tan"].append(tan[ids] @ rot.T)
        ap["mat"].append(mat_np[ids])
    if total == 0:
        app = {k: np.zeros((0,) + {
            "p0": (3,), "e1": (3,), "e2": (3,), "n": (3, 3),
            "uv": (3, 2), "tan": (3,), "mat": ()}[k],
            np.int32 if k == "mat" else np.float32)
            for k in ap}
    else:
        app = {k: np.concatenate(v).astype(
            np.int32 if k == "mat" else np.float32) for k, v in ap.items()}
    return app, em_rank, light_offset


def compile_scene_instanced(sources: Sequence[HostMesh], mats,
                            instances: Sequence[Tuple[int, np.ndarray]],
                            env=None, lights=None, atlas=None,
                            atlas_rects=None, atlas_level_y=None,
                            with_light_bvh: bool = False,
                            prebuilt=None,
                            leaf_k: Optional[int] = None):
    """Build a full render-ready Scene for an instanced world: shared
    local-space BLASes + an interleaved TLAS (traversal="tlas"), with
    materials/normals/UVs/NEE all wired through the integrator — the
    counterpart of the reference's instancing consumption
    (AssetManager.cs:1714-1750 + IntersectionKernels.compute:155-252).

    Returns (Scene, InstancedScene). Keep the InstancedScene handle for
    per-frame transform updates (update_instance_transforms)."""
    from truetrace_tpu.scene.ir import (
        AnalyticLights, EnvMap, LightTris, MeshTable, Scene)
    from truetrace_tpu.scene.mesh import material_table

    isc = build_instanced(sources, instances, prebuilt=prebuilt,
                          leaf_k=leaf_k)
    l2w_np = np.asarray(isc.l2w)
    app, em_rank, light_offset = _world_light_tris(isc, mats, l2w_np)
    T_local = int(np.asarray(isc.tri_mat).shape[0])
    A = app["mat"].shape[0]

    tri = {k: np.concatenate([loc, app[k]]) for k, loc in (
        ("p0", np.asarray(isc.tri_p0)), ("e1", np.asarray(isc.tri_e1)),
        ("e2", np.asarray(isc.tri_e2)), ("n", np.asarray(isc.tri_n)),
        ("uv", np.asarray(isc.tri_uv)), ("tan", np.asarray(isc.tri_tan)),
        ("mat", np.asarray(isc.tri_mat)))}

    # light list over the appended world rows
    T = T_local + A
    if A > 0:
        ids = (T_local + np.arange(A)).astype(np.int32)
        area = 0.5 * np.linalg.norm(
            np.cross(tri["e1"][ids], tri["e2"][ids]), axis=-1)
        lum = np.array([0.2126 * m.emission[0] + 0.7152 * m.emission[1]
                        + 0.0722 * m.emission[2] for m in mats], np.float32)
        power = (area * lum[tri["mat"][ids]] * np.pi).astype(np.float32)
        cdf = np.cumsum(power)
        cdf /= max(cdf[-1], 1e-20)
        pmf = np.diff(np.concatenate([[0.0], cdf])).astype(np.float32)
        inv = np.full((T,), -1, np.int32)
        inv[ids] = np.arange(A, dtype=np.int32)
        from truetrace_tpu.scene.mesh import pack_light_rows
        light_tris = LightTris(
            tri_index=jnp.asarray(ids), power=jnp.asarray(power),
            cdf=jnp.asarray(cdf.astype(np.float32)), pmf=jnp.asarray(pmf),
            tri_to_light=jnp.asarray(inv),
            rows=pack_light_rows(jnp.asarray(tri["p0"][ids]),
                                 jnp.asarray(tri["e1"][ids]),
                                 jnp.asarray(tri["e2"][ids]),
                                 jnp.asarray(tri["mat"][ids]),
                                 jnp.asarray(pmf)))
    else:
        light_tris = LightTris(
            tri_index=jnp.zeros((0,), jnp.int32),
            power=jnp.zeros((0,), jnp.float32),
            cdf=jnp.zeros((0,), jnp.float32),
            pmf=jnp.zeros((0,), jnp.float32),
            tri_to_light=jnp.full((T,), -1, jnp.int32),
            rows=jnp.zeros((0, 16), jnp.float32))

    lbvh_nodes = jnp.zeros((0, 12), jnp.float32)
    lbvh_info = jnp.zeros((0, 2), jnp.int32)
    lbvh_prim = jnp.zeros((0,), jnp.int32)
    lbvh_trail = jnp.zeros((0,), jnp.uint32)
    lbvh_pairs = jnp.zeros((0, 26), jnp.float32)
    lbvh_pair_children = jnp.zeros((0, 2), jnp.int32)
    lcut = {}
    if with_light_bvh and A > 1:
        from truetrace_tpu.build.lightbvh import (build_cut, build_light_bvh,
                                                  build_pairs)
        lb = build_light_bvh(tri, np.asarray(light_tris.tri_index),
                             np.asarray(light_tris.power))
        pairs, pair_children = build_pairs(lb.nodes, lb.info)
        lbvh_nodes = jnp.asarray(lb.nodes)
        lbvh_info = jnp.asarray(lb.info)
        lbvh_prim = jnp.asarray(lb.prim)
        lbvh_trail = jnp.asarray(lb.trail)
        lbvh_pairs = jnp.asarray(pairs)
        lbvh_pair_children = jnp.asarray(pair_children)
        cut = build_cut(lb)
        lcut = dict(lcut_bounds=jnp.asarray(cut.bounds),
                    lcut_link=jnp.asarray(cut.link),
                    lcut_node_ids=jnp.asarray(cut.node_ids),
                    lcut_of_light=jnp.asarray(cut.of_light),
                    lcut_skip=jnp.asarray(cut.skip))

    w2l44 = np.zeros((isc.n_instances, 4, 4), np.float32)
    l2w44 = np.zeros((isc.n_instances, 4, 4), np.float32)
    for i, (_, m) in enumerate(instances):
        l2w44[i] = m
        w2l44[i] = np.linalg.inv(m)
    mesh_table = MeshTable(
        w2l=jnp.asarray(w2l44), l2w=jnp.asarray(l2w44),
        node_offset=isc.node_offset, tri_offset=isc.tri_offset,
        light_node_offset=jnp.asarray(light_offset),
        aabb=isc.world_aabb)

    scene = Scene(
        tri_p0=jnp.asarray(tri["p0"]), tri_e1=jnp.asarray(tri["e1"]),
        tri_e2=jnp.asarray(tri["e2"]), tri_n=jnp.asarray(tri["n"]),
        tri_uv=jnp.asarray(tri["uv"]), tri_tan=jnp.asarray(tri["tan"]),
        tri_mat=jnp.asarray(tri["mat"]),
        bvh2_box=jnp.zeros((0, 2, 3), jnp.float32),
        bvh2_left=jnp.zeros((0,), jnp.int32),
        bvh2_count=jnp.zeros((0,), jnp.int32),
        cw_nodes=isc.cw_nodes, cw_tri_index=jnp.zeros((0,), jnp.int32),
        cw_leaf_rows=isc.leaf_rows,
        woop=jnp.zeros((0, 24), jnp.float32),
        atlas=jnp.asarray(atlas, jnp.float32) if atlas is not None
        else jnp.zeros((1, 1, 4), jnp.float32),
        atlas_rects=jnp.asarray(atlas_rects, jnp.int32)
        if atlas_rects is not None else jnp.zeros((0, 4), jnp.int32),
        atlas_level_y=jnp.asarray(atlas_level_y, jnp.int32)
        if atlas_level_y is not None else jnp.zeros((1,), jnp.int32),
        tri_lod=jnp.zeros((T,), jnp.float32),
        materials=material_table(mats), mesh_table=mesh_table,
        light_tris=light_tris,
        lights=lights if lights is not None else AnalyticLights.none(),
        env=env if env is not None else EnvMap.constant((0.0, 0.0, 0.0)),
        lbvh_nodes=lbvh_nodes, lbvh_info=lbvh_info, lbvh_prim=lbvh_prim,
        lbvh_trail=lbvh_trail, lbvh_pairs=lbvh_pairs,
        lbvh_pair_children=lbvh_pair_children,
        inst_rows=isc.inst_rows, inst_l2w=isc.l2w,
        inst_em_rank=jnp.asarray(em_rank),
        inst_light_offset=jnp.asarray(light_offset),
        **lcut,
    )
    from truetrace_tpu.scene.mesh import shadow_tint_table
    scene = scene.replace(
        tri_shadow=shadow_tint_table(mats, tri["mat"]),
        has_media=any(m.spec_trans > 0.0 and m.thin < 0.5 for m in mats))
    return scene, isc


def update_instance_transforms(scene, isc: InstancedScene, mats,
                               instances: Sequence[Tuple[int, np.ndarray]]):
    """Per-frame dynamic-geometry update: new instance transforms ->
    rebuild the (tiny) TLAS over transformed source AABBs on the host,
    refresh instance rows, l2w, world light triangles and the light CDF.
    The shared BLASes are untouched (the reference's per-frame UpdateTLAS
    policy: CPU TLAS rebuild + unchanged BLAS, AssetManager.cs:1610-1845).

    Returns (new_scene, new_isc)."""
    from truetrace_tpu.kernels.cwbvh_tlas import pack_instance_rows
    from truetrace_tpu.scene.ir import LightTris

    n_tlas_old = isc.n_tlas_nodes
    l2w_rows = np.stack([_mat34(m) for _, m in instances])
    w2l_rows = np.stack([_mat34(np.linalg.inv(m)) for _, m in instances])
    n_offs = np.asarray(isc.node_offset)          # already TLAS-shifted
    aabbs = []
    for i, (src_id, m) in enumerate(instances):
        lo, hi = isc.src_local_aabb[src_id]
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])], np.float32)
        wc = corners @ m[:3, :3] + m[3, :3]
        aabbs.append(np.stack([wc.min(0), wc.max(0)]))
    world_aabb = np.stack(aabbs).astype(np.float32)

    bvh_t = build_bvh2(world_aabb, max_leaf=1, sah_leaf_cap=1,
                       use_native=False)
    cw_t = build_cwbvh(bvh_t, world_aabb[bvh_t.order], use_native=False)
    inst_perm = bvh_t.order[cw_t.tri_index]
    mask = cw_t.slot_tri_count > 0
    per_node = mask.sum(axis=1)
    base_row = np.concatenate([[0], np.cumsum(per_node)[:-1]])
    tlas_nodes = cw_t.nodes.copy()
    tlas_nodes[:, 5] = base_row.astype(np.uint32)
    n_tlas = tlas_nodes.shape[0]
    assert n_tlas == n_tlas_old, \
        "TLAS node count changed; rebuild via compile_scene_instanced"
    row_inst = inst_perm[cw_t.slot_tri_base[mask]]
    inst_rows = pack_instance_rows(w2l_rows[row_inst],
                                   np.asarray(n_offs)[row_inst], row_inst,
                                   width=scene.cw_leaf_rows.shape[1])
    # TLAS children stay within rows [0, n_tlas); BLAS pointers in the
    # untouched tail already carry the +n_tlas shift from build time

    nodes = np.asarray(scene.cw_nodes).copy()
    nodes[:n_tlas] = tlas_nodes
    new_isc = InstancedScene(
        **{**isc.__dict__,
           "cw_nodes": jnp.asarray(nodes),
           "l2w": jnp.asarray(l2w_rows), "w2l": jnp.asarray(w2l_rows),
           "world_aabb": jnp.asarray(world_aabb),
           "inst_rows": jnp.asarray(inst_rows)})

    app, em_rank, light_offset = _world_light_tris(new_isc, mats, l2w_rows)
    T_local = int(np.asarray(isc.tri_mat).shape[0])
    A = app["mat"].shape[0]
    upd = dict(
        cw_nodes=new_isc.cw_nodes, inst_rows=new_isc.inst_rows,
        inst_l2w=new_isc.l2w,
        inst_light_offset=jnp.asarray(light_offset))
    if A > 0:
        # refresh the appended world light rows in place (same count —
        # emissive topology is static, only transforms move)
        for key, col in (("p0", "tri_p0"), ("e1", "tri_e1"),
                         ("e2", "tri_e2"), ("n", "tri_n"),
                         ("tan", "tri_tan")):
            full = np.asarray(getattr(scene, col)).copy()
            full[T_local:] = app[key]
            upd[col] = jnp.asarray(full)
        ids = np.asarray(scene.light_tris.tri_index)
        area = 0.5 * np.linalg.norm(
            np.cross(app["e1"], app["e2"]), axis=-1)
        lum = np.array([0.2126 * m.emission[0] + 0.7152 * m.emission[1]
                        + 0.0722 * m.emission[2] for m in mats], np.float32)
        power = (area * lum[app["mat"]] * np.pi).astype(np.float32)
        cdf = np.cumsum(power)
        cdf /= max(cdf[-1], 1e-20)
        pmf = np.diff(np.concatenate([[0.0], cdf])).astype(np.float32)
        from truetrace_tpu.scene.mesh import pack_light_rows
        em_ids = np.asarray(scene.light_tris.tri_index) - T_local
        upd["light_tris"] = LightTris(
            tri_index=scene.light_tris.tri_index,
            power=jnp.asarray(power),
            cdf=jnp.asarray(cdf.astype(np.float32)),
            pmf=jnp.asarray(pmf),
            tri_to_light=scene.light_tris.tri_to_light,
            rows=pack_light_rows(jnp.asarray(app["p0"][em_ids]),
                                 jnp.asarray(app["e1"][em_ids]),
                                 jnp.asarray(app["e2"][em_ids]),
                                 jnp.asarray(app["mat"][em_ids]),
                                 jnp.asarray(pmf)))
        if scene.lbvh_pairs.shape[0] > 0:
            from truetrace_tpu.build.lightbvh import (build_cut,
                                                      build_light_bvh,
                                                      build_pairs)
            tri_full = {k: np.asarray(upd.get(c, getattr(scene, c)))
                        for k, c in (("p0", "tri_p0"), ("e1", "tri_e1"),
                                     ("e2", "tri_e2"))}
            lb = build_light_bvh(tri_full, ids, power)
            pairs, pair_children = build_pairs(lb.nodes, lb.info)
            cut = build_cut(lb)
            upd.update(lbvh_nodes=jnp.asarray(lb.nodes),
                       lbvh_info=jnp.asarray(lb.info),
                       lbvh_prim=jnp.asarray(lb.prim),
                       lbvh_trail=jnp.asarray(lb.trail),
                       lbvh_pairs=jnp.asarray(pairs),
                       lbvh_pair_children=jnp.asarray(pair_children),
                       lcut_bounds=jnp.asarray(cut.bounds),
                       lcut_link=jnp.asarray(cut.link),
                       lcut_node_ids=jnp.asarray(cut.node_ids),
                       lcut_of_light=jnp.asarray(cut.of_light),
                       lcut_skip=jnp.asarray(cut.skip))
    return scene.replace(**upd), new_isc


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
