"""Host-side mesh container + scene compilation into the render-ready IR.

This is the role of the reference's AssetManager.BuildCombined /
AccumulateData aggregation pipeline (AssetManager.cs:954-1227): take raw
meshes + materials, build acceleration structures, permute primitives into
leaf order, extract emissive triangles, and emit the aggregated device
arrays. Here it is a pure function: numpy in, `Scene` pytree out.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from truetrace_tpu.core import aabb as aabb_ops
from truetrace_tpu.build.bvh2 import BVH2, build_bvh2
from truetrace_tpu.scene.ir import (
    AnalyticLights, EnvMap, LightTris, MaterialTable, Scene)


@dataclass
class HostMesh:
    """One mesh: positions [V,3], triangle indices [F,3], per-face material."""
    positions: np.ndarray
    indices: np.ndarray
    mat_id: np.ndarray                    # [F] int32 (global material id)
    normals: Optional[np.ndarray] = None  # [V,3] or None -> geometric
    uvs: Optional[np.ndarray] = None      # [V,2] or None -> zeros


@dataclass
class HostMaterial:
    """Host-side Disney material description (defaults = matte gray).
    tex_* fields are atlas texture ids from scene.atlas.AtlasBuilder.add
    (-1 = untextured)."""
    base_color: tuple = (0.8, 0.8, 0.8)
    emission: tuple = (0.0, 0.0, 0.0)
    roughness: float = 0.5
    metallic: float = 0.0
    spec_trans: float = 0.0
    ior: float = 1.5
    specular: float = 0.5
    spec_tint: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.5
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.97
    anisotropic: float = 0.0
    subsurface: float = 0.0
    diff_trans: float = 0.0
    thin: float = 0.0
    alpha: float = 1.0
    # texture adjustments (reference RayTracingShader.compute:630-662)
    hue: float = 0.0                       # hue rotation, degrees
    brightness: float = 1.0
    saturation: float = 1.0
    contrast: float = 1.0
    blend_color: tuple = (0.0, 0.0, 0.0)
    blend_factor: float = 0.0
    rough_remap: tuple = (0.0, 1.0)
    metal_remap: tuple = (0.0, 1.0)
    scatter_dist: float = 0.0              # glass interior scatter distance
    transmit_color: tuple = (-1.0, -1.0, -1.0)  # authored glass interior
                                           # apparent color; negative =
                                           # derive from 1 - base_color
    # per-material UV transform (reference AlbedoTextureScale /
    # SecondaryTextureScale / Rotation, CommonVars.cs:123-136)
    uv_scale: tuple = (1.0, 1.0, 0.0, 0.0)  # (sx, sy, ox, oy)
    uv2_scale: tuple = (1.0, 1.0)          # normal/metal/rough/alpha scale
    uv_rot: float = 0.0                    # radians about uv (0.5, 0.5)
    normal_strength: float = 1.0           # normal-map intensity
    rough_tex_invert: float = 0.0          # roughness tex is smoothness
    tex_albedo: int = -1
    tex_normal: int = -1
    tex_emission: int = -1
    tex_rough_metal: int = -1
    tex_matcap: int = -1
    tex_metallic: int = -1                 # single-channel overrides
    tex_roughness: int = -1
    tex_alpha: int = -1
    tex_matcap_mask: int = -1


def material_table(mats: List[HostMaterial]) -> MaterialTable:
    def col(name):
        return jnp.asarray(np.array([getattr(m, name) for m in mats],
                                    np.float32))

    def icol(name):
        return jnp.asarray(np.array([getattr(m, name) for m in mats],
                                    np.int32))
    n = len(mats)
    return MaterialTable(
        base_color=col("base_color"), emission=col("emission"),
        roughness=col("roughness"), metallic=col("metallic"),
        spec_trans=col("spec_trans"), ior=col("ior"),
        specular=col("specular"), spec_tint=col("spec_tint"),
        sheen=col("sheen"), sheen_tint=col("sheen_tint"),
        clearcoat=col("clearcoat"), clearcoat_gloss=col("clearcoat_gloss"),
        anisotropic=col("anisotropic"), subsurface=col("subsurface"),
        diff_trans=col("diff_trans"), thin=col("thin"), alpha=col("alpha"),
        hue=col("hue"), brightness=col("brightness"),
        saturation=col("saturation"), contrast=col("contrast"),
        blend_color=col("blend_color"), blend_factor=col("blend_factor"),
        rough_remap=col("rough_remap"), metal_remap=col("metal_remap"),
        scatter_dist=col("scatter_dist"),
        transmit_color=col("transmit_color"),
        uv_scale=col("uv_scale"), uv2_scale=col("uv2_scale"),
        uv_rot=col("uv_rot"), normal_strength=col("normal_strength"),
        rough_tex_invert=col("rough_tex_invert"),
        tex_albedo=icol("tex_albedo"), tex_normal=icol("tex_normal"),
        tex_emission=icol("tex_emission"),
        tex_rough_metal=icol("tex_rough_metal"),
        tex_matcap=icol("tex_matcap"),
        tex_metallic=icol("tex_metallic"),
        tex_roughness=icol("tex_roughness"),
        tex_alpha=icol("tex_alpha"),
        tex_matcap_mask=icol("tex_matcap_mask"),
    )


def flatten_meshes(meshes: List[HostMesh]):
    """Concatenate meshes into world-space triangle soup (single-BLAS path).

    Returns dict of numpy arrays: p0,e1,e2 [T,3], n [T,3,3], uv [T,3,2],
    tan [T,3] (UV-aligned tangents for normal mapping), mat [T]."""
    p0l, e1l, e2l, nl, uvl, ml, tanl = [], [], [], [], [], [], []
    for mesh in meshes:
        pos = mesh.positions.astype(np.float32)
        idx = mesh.indices.astype(np.int64)
        v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
        p0l.append(v0)
        e1l.append(v1 - v0)
        e2l.append(v2 - v0)
        if mesh.normals is not None:
            nrm = mesh.normals.astype(np.float32)
            tn = np.stack([nrm[idx[:, 0]], nrm[idx[:, 1]], nrm[idx[:, 2]]], 1)
        else:
            gn = np.cross(v1 - v0, v2 - v0)
            gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
            tn = np.repeat(gn[:, None, :], 3, axis=1)
        nl.append(tn)
        if mesh.uvs is not None:
            uv = mesh.uvs.astype(np.float32)
            tuv = np.stack([uv[idx[:, 0]], uv[idx[:, 1]], uv[idx[:, 2]]], 1)
        else:
            tuv = np.zeros((idx.shape[0], 3, 2), np.float32)
        uvl.append(tuv)
        # per-face tangent aligned with +u (reference builds tangents on
        # the CPU for its octahedral-packed CudaTriangle tangents,
        # CommonVars.cs:437-456): T = (e1*dv2 - e2*dv1) / det
        du1 = tuv[:, 1] - tuv[:, 0]
        du2 = tuv[:, 2] - tuv[:, 0]
        det = du1[:, 0] * du2[:, 1] - du2[:, 0] * du1[:, 1]
        e1f, e2f = v1 - v0, v2 - v0
        tan = (e1f * du2[:, 1:2] - e2f * du1[:, 1:2]) \
            / np.where(np.abs(det) < 1e-12, 1.0, det)[:, None]
        nrm = np.linalg.norm(tan, axis=-1, keepdims=True)
        tan = np.where(nrm > 1e-8, tan / np.maximum(nrm, 1e-12), 0.0)
        tan[np.abs(det) < 1e-12] = 0.0
        tanl.append(tan.astype(np.float32))
        ml.append(mesh.mat_id.astype(np.int32))
    return dict(
        p0=np.concatenate(p0l), e1=np.concatenate(e1l),
        e2=np.concatenate(e2l), n=np.concatenate(nl),
        uv=np.concatenate(uvl), tan=np.concatenate(tanl),
        mat=np.concatenate(ml))


def pack_light_rows(p0, e1, e2, mat_id, pmf):
    """[L,16] packed per-light NEE sample rows (LightTris.rows layout):
    p0(0:3) e1(3:6) e2(6:9) unit-gn(9:12) area(12) pmf(13) mat_id(14,
    exact-float) pad(15). Emission is NOT baked in — the sampler gathers
    materials.emission[mat_id] (tiny cache-hot table) so live material
    edits and emission gradients keep flowing. jnp throughout so
    refit/pose paths can rebuild rows for deformed emissives under
    jit."""
    gn = jnp.cross(e1, e2)
    area2 = jnp.linalg.norm(gn, axis=-1)
    gnu = gn / jnp.maximum(area2, 1e-20)[..., None]
    area = 0.5 * area2
    L = p0.shape[0]
    return jnp.concatenate(
        [p0, e1, e2, gnu, area[:, None], pmf[:, None],
         jnp.asarray(mat_id, jnp.float32)[:, None],
         jnp.zeros((L, 1), jnp.float32)], axis=1).astype(jnp.float32)


def _emissive_light_tris(tris, mats: List[HostMaterial]) -> LightTris:
    """Extract emissive triangles + power CDF (reference: ParentObject.cs
    emissive extraction :983-1079 + LightTriData)."""
    T = tris["mat"].shape[0]
    emis = np.array([np.max(m.emission) for m in mats], np.float32)
    is_emis = emis[tris["mat"]] > 0.0
    ids = np.nonzero(is_emis)[0].astype(np.int32)
    if ids.size == 0:
        return LightTris(tri_index=jnp.zeros((0,), jnp.int32),
                         power=jnp.zeros((0,), jnp.float32),
                         cdf=jnp.zeros((0,), jnp.float32),
                         pmf=jnp.zeros((0,), jnp.float32),
                         tri_to_light=jnp.full((T,), -1, jnp.int32),
                         rows=jnp.zeros((0, 16), jnp.float32))
    area = 0.5 * np.linalg.norm(
        np.cross(tris["e1"][ids], tris["e2"][ids]), axis=-1)
    lum = np.array([0.2126 * m.emission[0] + 0.7152 * m.emission[1]
                    + 0.0722 * m.emission[2] for m in mats], np.float32)
    power = area * lum[tris["mat"][ids]] * np.pi
    cdf = np.cumsum(power)
    cdf /= max(cdf[-1], 1e-20)
    pmf = np.diff(np.concatenate([[0.0], cdf])).astype(np.float32)
    inv = np.full((T,), -1, np.int32)
    inv[ids] = np.arange(ids.size, dtype=np.int32)
    return LightTris(tri_index=jnp.asarray(ids),
                     power=jnp.asarray(power.astype(np.float32)),
                     cdf=jnp.asarray(cdf.astype(np.float32)),
                     pmf=jnp.asarray(pmf),
                     tri_to_light=jnp.asarray(inv),
                     rows=pack_light_rows(
                         jnp.asarray(tris["p0"][ids]),
                         jnp.asarray(tris["e1"][ids]),
                         jnp.asarray(tris["e2"][ids]),
                         jnp.asarray(tris["mat"][ids]),
                         jnp.asarray(pmf)))


def shadow_tint_table(mats: List[HostMaterial], tri_mat: np.ndarray):
    """Per-tri shadow transmittance tint, or None when every material is
    opaque. tint = (1-alpha) + alpha * spec_trans * base_color: cutouts
    pass uncolored, glass passes its albedo tint, opaque blocks
    (reference CommonData.cginc:593-634)."""
    alpha = np.array([m.alpha for m in mats], np.float32)
    st = np.array([m.spec_trans for m in mats], np.float32)
    if np.all(alpha >= 1.0) and np.all(st <= 0.0):
        return None
    bc = np.array([m.base_color for m in mats], np.float32)
    tint = (1.0 - alpha)[:, None] + (alpha * st)[:, None] * bc
    return jnp.asarray(np.clip(tint[tri_mat], 0.0, 1.0))


def compile_scene(meshes: List[HostMesh], mats: List[HostMaterial],
                  env: Optional[EnvMap] = None,
                  lights: Optional[AnalyticLights] = None,
                  atlas: Optional[np.ndarray] = None,
                  atlas_rects: Optional[np.ndarray] = None,
                  atlas_level_y: Optional[np.ndarray] = None,
                  max_leaf: int = 4, with_cwbvh: bool = False,
                  with_light_bvh: bool = False, terrain=None,
                  presplit: float = 0.0,
                  leaf_k: Optional[int] = None,
                  cache_dir: Optional[str] = None,
                  hot_order: bool = False) -> Scene:
    """Build the full render-ready Scene from host meshes (single BLAS).

    cache_dir: directory for the on-disk build cache
    (scene/build_cache.py — the reference's persisted "Build Aggregated
    BVH"); None consults the TRUETRACE_BUILD_CACHE env var, and unset
    means no caching.

    presplit > 0 bisects triangles whose AABB half-area exceeds
    `presplit` x the scene mean before the BVH build (build/presplit.py
    — tighter trees, fewer traversal visits/ray on architectural
    scenes); 0 = off.

    leaf_k: triangles per CWBVH leaf slot / leaf row (any K — rows are
    10K words wide; 3/6/12 are the measured operating points, and the
    round-5 k8/k10 probe confirmed no intermediate beats them). 3 is
    the cache-resident default; 6 ("fat leaves", 60-word rows) rides the
    flat W>=60 HBM gather mode and roughly halves leaf iterations on
    scenes whose table exceeds the ~30 MB on-chip cache — use for
    multi-million-triangle scenes (BASELINE.md round-3 width map).
    None = auto, scale-dependent: 6 up to ~400k tris (cache-resident
    table; the round-5 interleaved frame A/B: 512^2x4 frame k6 517 ms
    vs k3 609 / k12 674 — the k12 loss is entirely the NEE shadow
    any-hit paying the doubled Moller block per row), 12 beyond (HBM
    regime; at 5.2M tris k12 wins BOTH closest 2.53-vs-2.13 and any-hit
    3.27-vs-2.69 Mrays/s — the flat W>=60 gather mode makes the wider
    row free while halving row count). BASELINE.md round-5."""
    tris = flatten_meshes(meshes)
    if presplit > 0.0:
        from truetrace_tpu.build.presplit import presplit_triangles
        tris = presplit_triangles(tris, max_ratio=presplit)
    tri_box = aabb_ops.from_tris(
        tris["p0"], tris["p0"] + tris["e1"], tris["p0"] + tris["e2"])
    if leaf_k is None:
        # scale-dependent frame-measured rule (round-5 paired A/Bs):
        # cache-resident tables (<~30 MB, ~<=400k tris at k6) -> k6
        # (frame 517 vs 674 ms at 293k: shadow any-hit pays the doubled
        # Moller block when gathers are cheap); HBM-resident -> k12
        # (5.2M tris: k12 wins BOTH classes, closest 2.53 vs 2.13 and
        # any-hit 3.27 vs 2.69 Mrays/s — in the flat W>=60 gather mode
        # halving row count is free). Threshold 400k sits between the
        # two measured regimes (BASELINE.md round-5 leaf_k tables).
        leaf_k = 6 if tris["p0"].shape[0] <= 400_000 else 12

    # on-disk build cache (reference "Build Aggregated BVH" persistence,
    # README.md:131; scene/build_cache.py): reuse BVH2 + CWBVH + light-BVH
    # products for an identical triangle soup + build config
    from truetrace_tpu.scene import build_cache as _bc
    if cache_dir is None:
        cache_dir = _bc.default_cache_dir()
    cached = None
    cache_key = None
    _new_products = None
    if cache_dir is not None and with_cwbvh:
        cache_key = _bc.scene_build_key(tris, mats, leaf_k, with_light_bvh,
                                        hot_order=hot_order)
        cached = _bc.load_build(cache_dir, cache_key)

    if cached is not None:
        full_perm = cached["full_perm"]
        for key in ("p0", "e1", "e2", "n", "uv", "tan", "mat"):
            tris[key] = tris[key][full_perm]
        bvh = BVH2(box=cached["bvh2_box"], left=cached["bvh2_left"],
                   count=cached["bvh2_count"], order=full_perm,
                   depth=int(cached["bvh2_depth"]))
        cw_nodes = jnp.asarray(cached["cw_nodes"])
        cw_tri_index = jnp.asarray(cached["cw_tri_index"])
        cw_leaf_rows = jnp.asarray(cached["cw_leaf_rows"])
        cw_stack = int(cached["cw_stack"])
    elif with_cwbvh:
        # CWBVH collapse needs BVH2 leaves with <= leaf_k prims
        bvh = build_bvh2(tri_box, max_leaf=leaf_k, sah_leaf_cap=leaf_k)
        # permute triangles into BVH leaf order so leaves are contiguous
        perm = bvh.order
        for key in ("p0", "e1", "e2", "n", "uv", "tan", "mat"):
            tris[key] = tris[key][perm]
        from truetrace_tpu.build.cwbvh import build_cwbvh
        cw = build_cwbvh(bvh, tri_box[perm], p_max=leaf_k)
        # re-permute triangles into CWBVH emit order; remap BVH2 leaf starts
        # (each BVH2 leaf's tris stay contiguous in CWBVH order)
        for key in ("p0", "e1", "e2", "n", "uv", "tan", "mat"):
            tris[key] = tris[key][cw.tri_index]
        leaf = bvh.count > 0
        bvh.left[leaf] = cw.leaf_start[leaf]
        from truetrace_tpu.kernels.cwbvh_wavefront import pack_leaf_rows
        nodes2, rows = pack_leaf_rows(
            cw.nodes, cw.slot_tri_base, cw.slot_tri_count,
            tris["p0"], tris["e1"], tris["e2"], k=leaf_k)
        if hot_order:
            # heat-ordered leaf-row placement for HBM-scale tables
            # (kernels/cwbvh_wavefront.py reorder_leaf_rows_hot; NOT for
            # deformable scenes — refit regenerates node-major rows)
            from truetrace_tpu.kernels.cwbvh_wavefront import (
                reorder_leaf_rows_hot)
            nodes2, rows = reorder_leaf_rows_hot(nodes2, rows)
        cw_nodes = jnp.asarray(nodes2)
        cw_tri_index = jnp.asarray(cw.tri_index)
        cw_leaf_rows = jnp.asarray(rows)
        cw_stack = int(cw.depth) + 1
        if cache_key is not None:
            _new_products = dict(
                full_perm=perm[cw.tri_index].astype(np.int32),
                bvh2_box=bvh.box, bvh2_left=bvh.left,
                bvh2_count=bvh.count,
                cw_nodes=np.asarray(nodes2),
                cw_tri_index=np.asarray(cw.tri_index),
                cw_leaf_rows=np.asarray(rows),
                cw_stack=np.int32(cw_stack),
                bvh2_depth=np.int32(bvh.depth))
    else:
        bvh = build_bvh2(tri_box, max_leaf=max_leaf)
        # permute triangles into BVH leaf order (contiguous leaf runs)
        perm = bvh.order
        for key in ("p0", "e1", "e2", "n", "uv", "tan", "mat"):
            tris[key] = tris[key][perm]
        cw_nodes = jnp.zeros((0, 20), jnp.uint32)
        cw_tri_index = jnp.zeros((0,), jnp.int32)
        cw_leaf_rows = jnp.zeros((0, 30), jnp.float32)
        cw_stack = 16

    light_tris = _emissive_light_tris(tris, mats)

    # base texture LOD per tri: 0.5*log2(albedo texel area / world area)
    # (feeds the ray-cone mip selection — the TPU analogue of the
    # reference's derivative-based texture fetches)
    T = tris["p0"].shape[0]
    tri_lod = np.zeros((T,), np.float32)
    if atlas_rects is not None and len(atlas_rects) > 0:
        alb = np.array([m.tex_albedo for m in mats], np.int32)[tris["mat"]]
        rect = np.asarray(atlas_rects)[np.maximum(alb, 0)]
        texels = np.maximum(rect[:, 2] * rect[:, 3], 1).astype(np.float64)
        duv1 = tris["uv"][:, 1] - tris["uv"][:, 0]
        duv2 = tris["uv"][:, 2] - tris["uv"][:, 0]
        uv_area = 0.5 * np.abs(duv1[:, 0] * duv2[:, 1]
                               - duv2[:, 0] * duv1[:, 1])
        w_area = 0.5 * np.linalg.norm(
            np.cross(tris["e1"], tris["e2"]), axis=-1)
        dens = uv_area * texels / np.maximum(w_area, 1e-12)
        tri_lod = np.where(alb >= 0,
                           0.5 * np.log2(np.maximum(dens, 1e-12)),
                           0.0).astype(np.float32)

    # MXU brute-force path for small scenes (kernels/tri_mxu.py)
    from truetrace_tpu.kernels.tri_mxu import BRUTE_MAX_TRIS, pack_woop
    if tris["p0"].shape[0] <= BRUTE_MAX_TRIS:
        woop = jnp.asarray(pack_woop(tris["p0"], tris["e1"], tris["e2"]))
    else:
        woop = jnp.zeros((0, 24), jnp.float32)

    lbvh_nodes = jnp.zeros((0, 12), jnp.float32)
    lbvh_info = jnp.zeros((0, 2), jnp.int32)
    lbvh_prim = jnp.zeros((0,), jnp.int32)
    lbvh_trail = jnp.zeros((0,), jnp.uint32)
    lbvh_pairs = jnp.zeros((0, 26), jnp.float32)
    lbvh_pair_children = jnp.zeros((0, 2), jnp.int32)
    lcut = {}
    if with_light_bvh and int(light_tris.tri_index.shape[0]) > 1:
        if cached is not None and "lbvh_nodes" in cached:
            lbvh_nodes = jnp.asarray(cached["lbvh_nodes"])
            lbvh_info = jnp.asarray(cached["lbvh_info"])
            lbvh_prim = jnp.asarray(cached["lbvh_prim"])
            lbvh_trail = jnp.asarray(cached["lbvh_trail"])
            lbvh_pairs = jnp.asarray(cached["lbvh_pairs"])
            lbvh_pair_children = jnp.asarray(cached["lbvh_pair_children"])
            lcut = {k: jnp.asarray(cached[k]) for k in
                    ("lcut_bounds", "lcut_link", "lcut_node_ids",
                     "lcut_of_light", "lcut_skip")}
        else:
            from truetrace_tpu.build.lightbvh import (build_cut,
                                                      build_light_bvh,
                                                      build_pairs)
            lb = build_light_bvh(
                tris, np.asarray(light_tris.tri_index),
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
            if _new_products is not None:
                _new_products.update(
                    lbvh_nodes=lb.nodes, lbvh_info=lb.info,
                    lbvh_prim=lb.prim, lbvh_trail=lb.trail,
                    lbvh_pairs=pairs, lbvh_pair_children=pair_children,
                    lcut_bounds=np.asarray(cut.bounds),
                    lcut_link=np.asarray(cut.link),
                    lcut_node_ids=np.asarray(cut.node_ids),
                    lcut_of_light=np.asarray(cut.of_light),
                    lcut_skip=np.asarray(cut.skip))

    if _new_products is not None:
        _bc.save_build(cache_dir, cache_key, _new_products)

    return Scene(
        tri_p0=jnp.asarray(tris["p0"]), tri_e1=jnp.asarray(tris["e1"]),
        tri_e2=jnp.asarray(tris["e2"]), tri_n=jnp.asarray(tris["n"]),
        tri_uv=jnp.asarray(tris["uv"]), tri_tan=jnp.asarray(tris["tan"]),
        tri_mat=jnp.asarray(tris["mat"]),
        bvh2_box=jnp.asarray(bvh.box), bvh2_left=jnp.asarray(bvh.left),
        bvh2_count=jnp.asarray(bvh.count),
        cw_nodes=cw_nodes, cw_tri_index=cw_tri_index,
        cw_leaf_rows=cw_leaf_rows, woop=woop,
        atlas=jnp.asarray(atlas, jnp.float32) if atlas is not None
        else jnp.zeros((1, 1, 4), jnp.float32),
        atlas_rects=jnp.asarray(atlas_rects, jnp.int32)
        if atlas_rects is not None else jnp.zeros((0, 4), jnp.int32),
        atlas_level_y=jnp.asarray(atlas_level_y, jnp.int32)
        if atlas_level_y is not None else jnp.zeros((1,), jnp.int32),
        tri_lod=jnp.asarray(tri_lod),
        materials=material_table(mats), mesh_table=None,
        light_tris=light_tris,
        lights=lights if lights is not None else AnalyticLights.none(),
        env=env if env is not None else EnvMap.constant((0.0, 0.0, 0.0)),
        lbvh_nodes=lbvh_nodes, lbvh_info=lbvh_info, lbvh_prim=lbvh_prim,
        lbvh_trail=lbvh_trail, lbvh_pairs=lbvh_pairs,
        lbvh_pair_children=lbvh_pair_children, terrain=terrain,
        tri_shadow=shadow_tint_table(mats, tris["mat"]),
        cw_stack=cw_stack,
        has_media=any(m.spec_trans > 0.0 and m.thin < 0.5 for m in mats),
        **lcut,
    )
