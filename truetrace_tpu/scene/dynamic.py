"""Dynamic (skinned/deformable) scenes: per-frame pose -> refit -> render.

Counterpart of the reference's skinned-mesh frame loop
(Resources/AssetManager.cs:1473-1606 per-frame RefitMesh dispatches;
Objects/ParentObject.cs:753-950: skinned verts -> Construct kernel ->
RefitLayer level sweeps -> NodeUpdate requantize). TPU design: the CWBVH
topology and refit worklists are built ONCE at rest pose on the host; a
pose update is then a pure jitted device function (skin -> level-sweep
refit -> leaf-row rebuild) so the whole animated frame stays inside one
XLA program chain — no per-frame host rebuild.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.bvh2 import build_bvh2
from truetrace_tpu.build.cwbvh import build_cwbvh
from truetrace_tpu.build.refit import level_worklists, refit_cwbvh
from truetrace_tpu.core import aabb as aabb_ops
from truetrace_tpu.kernels.cwbvh_wavefront import (
    pack_leaf_rows, pack_leaf_rows_jax)
from truetrace_tpu.scene.ir import Scene
from truetrace_tpu.scene.mesh import (
    HostMaterial, HostMesh, compile_scene)
from truetrace_tpu.scene.skinning import SkinnedMesh, skin_vertices


@dataclass
class DynamicScene:
    """Scene + the rest-pose refit metadata needed for per-frame updates."""
    scene: Scene                      # compiled at rest pose
    mesh: SkinnedMesh                 # the deformable region
    skin_tri_ids: np.ndarray          # [Fs] input-order tri ids of the
                                      # skinned mesh within the aggregate
    perm: np.ndarray                  # aggregate input order -> CWBVH order
    inv_perm: np.ndarray
    slot_child: jnp.ndarray           # [C,8] refit metadata (device)
    slot_tri_base: jnp.ndarray
    slot_tri_count: jnp.ndarray
    levels: Tuple[np.ndarray, ...]
    flat_base: jnp.ndarray            # pack_leaf_rows_jax inputs
    flat_count: jnp.ndarray
    rest_p0: jnp.ndarray              # input-order aggregate triangles
    rest_e1: jnp.ndarray
    rest_e2: jnp.ndarray
    skin_idx: jnp.ndarray             # [Fs,3] vertex indices (skinned)


def compile_dynamic_scene(mesh: SkinnedMesh, skin_mat_id: int,
                          mats: List[HostMaterial],
                          static_meshes: Optional[List[HostMesh]] = None,
                          env=None, lights=None,
                          with_light_bvh: bool = False) -> DynamicScene:
    """Build the Scene at rest pose and capture refit metadata.

    The skinned mesh is aggregated with the static meshes into ONE BLAS
    (like the reference's aggregated buffers); only its triangles move.
    Emissive materials must live on the static part (light refit for
    emissive skins lands with build/refit.refit_light_bvh)."""
    static_meshes = list(static_meshes or [])
    rest = np.asarray(mesh.rest_verts, np.float32)
    skin_host = HostMesh(rest, np.asarray(mesh.tri_vidx, np.int64),
                         np.full(mesh.tri_vidx.shape[0], skin_mat_id,
                                 np.int32))
    meshes = static_meshes + [skin_host]

    # replicate compile_scene's build, but keep the CWBVH metadata
    from truetrace_tpu.scene.mesh import flatten_meshes
    tris = flatten_meshes(meshes)
    tri_box = aabb_ops.from_tris(
        tris["p0"], tris["p0"] + tris["e1"], tris["p0"] + tris["e2"])
    bvh = build_bvh2(tri_box, max_leaf=3, sah_leaf_cap=3)
    cw = build_cwbvh(bvh, tri_box[bvh.order])
    perm = bvh.order[cw.tri_index]          # input order -> CWBVH order
    inv_perm = np.argsort(perm)

    # leaf_k pinned to 3: the refit metadata above (slot_*, flat_*) is
    # built from THIS k=3 BVH2/CWBVH — it must match the scene's build
    scene = compile_scene(meshes, mats, env=env, lights=lights,
                          with_cwbvh=True, with_light_bvh=with_light_bvh,
                          leaf_k=3)

    n_static = sum(m.indices.shape[0] for m in static_meshes)
    skin_tri_ids = n_static + np.arange(mesh.tri_vidx.shape[0])

    mask = cw.slot_tri_count > 0
    return DynamicScene(
        scene=scene, mesh=mesh, skin_tri_ids=skin_tri_ids,
        perm=perm, inv_perm=inv_perm,
        slot_child=jnp.asarray(cw.slot_child),
        slot_tri_base=jnp.asarray(cw.slot_tri_base),
        slot_tri_count=jnp.asarray(cw.slot_tri_count),
        levels=level_worklists(cw),
        flat_base=jnp.asarray(cw.slot_tri_base[mask]),
        flat_count=jnp.asarray(cw.slot_tri_count[mask]),
        rest_p0=jnp.asarray(tris["p0"]), rest_e1=jnp.asarray(tris["e1"]),
        rest_e2=jnp.asarray(tris["e2"]),
        skin_idx=jnp.asarray(np.asarray(mesh.tri_vidx, np.int64)),
    )


def pose_scene(dyn: DynamicScene, bones: jnp.ndarray) -> Scene:
    """Pure jitted pose update: skin vertices, refit the CWBVH level by
    level, rebuild the packed leaf rows, refresh shading normals. Returns
    the updated Scene (same pytree structure — safe to feed a compiled
    frame step)."""
    v = skin_vertices(dyn.mesh, bones)                 # [V,3]
    i0, i1, i2 = (dyn.skin_idx[:, k] for k in range(3))
    sp0 = v[i0]
    se1 = v[i1] - v[i0]
    se2 = v[i2] - v[i0]

    # input-order aggregate triangles with the skinned range replaced
    sk = jnp.asarray(dyn.skin_tri_ids)
    p0 = dyn.rest_p0.at[sk].set(sp0)
    e1 = dyn.rest_e1.at[sk].set(se1)
    e2 = dyn.rest_e2.at[sk].set(se2)
    # CWBVH order
    perm = jnp.asarray(dyn.perm)
    p0c, e1c, e2c = p0[perm], e1[perm], e2[perm]

    nodes2, _ = refit_cwbvh(
        dyn.scene.cw_nodes, p0c, e1c, e2c,
        dyn.slot_child, dyn.slot_tri_base, dyn.slot_tri_count, dyn.levels,
        leaf_k=dyn.scene.cw_leaf_rows.shape[1] // 10)
    rows = pack_leaf_rows_jax(dyn.flat_base, dyn.flat_count, p0c, e1c, e2c,
                              k=dyn.scene.cw_leaf_rows.shape[1] // 10)

    # refresh geometric shading normals for the deformed tris (the rest
    # pose used smooth/geometric normals; deformed normals follow faces)
    gn = jnp.cross(e1c, e2c)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                          1e-20)
    sk_cw = jnp.asarray(dyn.inv_perm)[sk]              # skinned rows in CW order
    tri_n = dyn.scene.tri_n.at[sk_cw].set(
        jnp.repeat(gn[sk_cw][:, None, :], 3, axis=1))

    # refresh the packed NEE light rows for deformed emissives (geometry
    # columns only; power/cdf/pmf stay — consistent sampler/pdf pair)
    lt = dyn.scene.light_tris
    if lt.rows is not None and lt.rows.shape[0] > 0:
        from truetrace_tpu.scene.mesh import pack_light_rows
        ids = lt.tri_index
        lt = lt.replace(rows=pack_light_rows(
            p0c[ids], e1c[ids], e2c[ids], lt.rows[:, 14], lt.pmf))

    return dyn.scene.replace(cw_nodes=nodes2, cw_leaf_rows=rows,
                             tri_p0=p0c, tri_e1=e1c, tri_e2=e2c,
                             tri_n=tri_n, light_tris=lt)
