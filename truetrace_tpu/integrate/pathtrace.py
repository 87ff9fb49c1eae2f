"""Wavefront path-tracing integrator (megakernel-free, compaction-ready).

TPU redesign of the reference's per-frame bounce loop
(RayTracingMaster.cs:954-1007 orchestrating kernel_trace / kernel_shade /
kernel_shadow; shading logic RayTracingShader.compute:87-507):

* The reference drives GPU work queues with atomic counters and indirect
  dispatch; here the whole wavefront is a fixed-shape ray batch stepped
  through `lax.fori_loop` over bounces with masked (dead) lanes — XLA traces
  one program, no dynamic shapes.
* NEE with MIS (power heuristic) against the emissive-triangle list: light
  selection by power CDF (binary search like the reference's FindInterval,
  CommonData.cginc:1423), area sampling, any-hit shadow ray. The light-BVH
  fast selection path plugs in at `select_light` (M2).
* BSDF is pluggable: `bsdf_sample` / `bsdf_eval` default to the full Disney
  module (kernels/disney.py); Lambert is kept for analytic tests.
* Everything is differentiable; the diff/ package wraps this with
  stored-path replay for a cheaper backward.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from truetrace_tpu.core import rng
from truetrace_tpu.core.math import (
    cross, dot, luminance, normalize, power_heuristic, sample_cosine_hemisphere,
    sample_triangle, to_world, finite_or_zero)
from truetrace_tpu.kernels.traverse_ref import (
    Hit, any_hit_bvh2, closest_hit_bvh2)
from truetrace_tpu.scene.ir import Camera, Scene, camera_rays

T_MAX = jnp.float32(1e30)
SHADOW_EPS = 1e-4
# nested-dielectric medium stack depth (glass in water in ...): 4 levels
# of containment cover practical scenes; deeper entries overwrite the top
MED_STACK = 4


@struct.dataclass
class RenderConfig:
    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)
    bounces: int = struct.field(pytree_node=False, default=4)
    use_nee: bool = struct.field(pytree_node=False, default=True)
    rr_start: int = struct.field(pytree_node=False, default=3)
    bsdf: str = struct.field(pytree_node=False, default="lambert")
    max_leaf: int = struct.field(pytree_node=False, default=4)
    traversal: str = struct.field(pytree_node=False, default="bvh2")
    light_sampling: str = struct.field(pytree_node=False, default="cdf")
    restir_capture: bool = struct.field(pytree_node=False, default=False)
    cache_capture: bool = struct.field(pytree_node=False, default=False)
    cache_query_bounce: int = struct.field(pytree_node=False, default=-1)
    # MIS weighting function for the mesh-light <-> BSDF strategy pair:
    # "approx" (default) weights with the O(1) power-CDF pmf on BOTH sides
    # — unbiased (weights still sum to 1; only the weighting function
    # changes) and removes the per-bounce light-tree pdf walk, which
    # measures at ~35% of the whole NEE cost (scripts/profile_nee.py).
    # "exact" walks the tree trail for the true descent pmf (reference
    # CalcLightPDF, CommonData.cginc:1057).
    nee_mis: str = struct.field(pytree_node=False, default="approx")
    # "pcg" (white, pcg3d) | "bluenoise" (blue-noise-dithered (0,2)
    # sequence, core/rng.py bn_uniform* — lower visible error at 1-4 spp;
    # reference low-discrepancy per-pixel mode, CommonData.cginc:404-428)
    sampler: str = struct.field(pytree_node=False, default="pcg")
    # NEE russian roulette: shadow rays whose unshadowed contribution
    # luminance is below this survive proportionally (reweighted —
    # unbiased); 0 disables. Counterpart of the reference's NEE RR
    # (RayTracingShader.compute:418-484).
    nee_rr: float = struct.field(pytree_node=False, default=0.0)
    # rematerialize the bounce body in backward passes (jax.checkpoint):
    # O(per-bounce state) backward memory instead of O(all shading
    # intermediates) — the stored-path replay; diff/render_grad.py
    remat: bool = struct.field(pytree_node=False, default=False)
    # profiling-only ablation knob ("" | "noshadow" | "nomis"): disables
    # one NEE component to attribute frame cost (scripts/profile_nee.py).
    # Renders are BIASED with a non-empty value — never use for output.
    debug_nee: str = struct.field(pytree_node=False, default="")
    # fuse the per-bounce NEE shadow flush into the NEXT bounce's trace
    # dispatch (kernels/cwbvh_wavefront.py mixed_hit_wavefront): bounce
    # b's shadow rays ride bounce b+1's occupancy cascade, halving the
    # dispatch count (the reference instead runs separate kernel_trace /
    # kernel_shadow indirect dispatches, RayTracingMaster.cs:968,996).
    # Applies only where it is exact: wavefront traversal over an
    # all-opaque scene with no terrain. Radiance is bitwise identical to
    # the unfused path (same visibility, same add order). MEASURED SLOWER
    # on v5e and therefore default-off: 759 vs 674 ms on the 512^2 x 4
    # atrium frame (scripts/tune_fused.py) and 3.39 vs 3.61 Mrays/s on
    # the mixed-ray microbench (scripts/tune_mixed.py) — shadow lanes in
    # a lock-step mixed chunk stretch the closest-hit lanes' cascade
    # stages more than a dedicated early-out any-hit dispatch costs.
    fuse_nee: bool = struct.field(pytree_node=False, default=False)
    # sort each bounce's NEE shadow rays by light distance before the
    # any-hit dispatch: short rays (and the zero-length dead lanes) pack
    # into the same 64k cascade chunks and retire whole chunks early,
    # while lax.map pipelines the long-ray chunk tails. The reference's
    # shadow rays carry exact t_max the same way
    # (IntersectionKernels.compute:264-498); sorting is the TPU analogue
    # of its atomic work-queue compaction for the shadow pass. Permute +
    # inverse-permute are independent-index gathers (~1 ns/row).
    nee_sort: bool = struct.field(pytree_node=False, default=False)
    # RIS candidate count for analytic-light NEE (reference
    # SelectUnityLight, CommonData.cginc:1806 + its RIS-count setting):
    # when the scene has MORE analytic lights than this, selection runs
    # streaming RIS over this many uniform candidates weighted by a
    # cheap contribution estimate (integrate/lights.py
    # sample_analytic_ris — unbiased, tested). <= 0 disables (always
    # uniform). At a handful of lights uniform selection is fine; at
    # dozens-to-hundreds RIS cuts variance dramatically.
    analytic_ris: int = struct.field(pytree_node=False, default=8)


def _samplers(cfg: "RenderConfig"):
    """(uniform1, uniform2) for the configured sampler. "bluenoise" swaps
    in the blue-noise-dithered (0,2) sequence (core/rng.py) — same
    (pixel, sample, dim) counter addressing, so replay contracts hold."""
    if cfg.sampler == "bluenoise":
        w = cfg.width
        return (lambda pix, s, d: rng.bn_uniform1(pix, s, d, w),
                lambda pix, s, d: rng.bn_uniform2(pix, s, d, w))
    return rng.uniform1, rng.uniform2


def gather_material(materials, mid):
    """Gather per-ray material rows from the SoA table."""
    return jax.tree_util.tree_map(lambda a: a[mid], materials)


# ---------------------------------------------------------------------------
# Lambert BSDF (M0 analytic-test path)
# ---------------------------------------------------------------------------

def lambert_sample(mat, n, wo, u_lobe, u2):
    wi_local = sample_cosine_hemisphere(u2)
    wi = to_world(n, wi_local)
    cos_i = jnp.maximum(dot(wi, n), 0.0)
    pdf = cos_i / jnp.pi
    f = mat.base_color / jnp.pi
    return wi, f, pdf, jnp.zeros_like(pdf, jnp.int32)  # lobe id 0


def lambert_eval(mat, n, wo, wi):
    cos_i = jnp.maximum(dot(wi, n), 0.0)
    f = mat.base_color / jnp.pi * (cos_i > 0.0)[..., None]
    pdf = cos_i / jnp.pi
    return f, pdf


def get_bsdf(name: str):
    if name == "lambert":
        return lambert_sample, lambert_eval
    if name == "disney":
        from truetrace_tpu.kernels.disney import disney_eval, disney_sample
        return disney_sample, disney_eval
    raise ValueError(f"unknown bsdf {name!r}")


# ---------------------------------------------------------------------------
# light sampling (emissive-triangle list; light-BVH descent plugs in here)
# ---------------------------------------------------------------------------

class LightSample(NamedTuple):
    pos: jnp.ndarray      # [R,3] point on light
    normal: jnp.ndarray   # [R,3] light geometric normal
    radiance: jnp.ndarray # [R,3]
    pdf_sa: jnp.ndarray   # [R] solid-angle pdf as seen from shading point
    valid: jnp.ndarray    # [R] bool
    pdf_w: jnp.ndarray = None  # [R] MIS weighting pdf (nee_mis="approx":
                               # power-CDF pmf based; else == pdf_sa)


def sample_light_tris(scene: Scene, p, u_sel, u2, sn=None,
                      use_tree: bool = False,
                      approx_mis: bool = False) -> LightSample:
    lt = scene.light_tris
    L = lt.tri_index.shape[0]
    if use_tree:
        if scene.lcut_bounds is not None:
            # dense cut selection (gather-free) + residual descent; the
            # approx-MIS mode runs the bandwidth-bound dense select in
            # bf16 (pmf stays exact — cdf-difference form)
            from truetrace_tpu.kernels.lighttree import sample_light_tree_cut
            idx, pmf, _ = sample_light_tree_cut(
                scene.lbvh_pairs, scene.lbvh_prim, scene.lcut_bounds,
                scene.lcut_link, p, sn, u_sel,
                select_dtype=jnp.bfloat16 if approx_mis else jnp.float32)
        else:
            from truetrace_tpu.kernels.lighttree import sample_light_tree
            idx, pmf, _ = sample_light_tree(
                scene.lbvh_pairs, scene.lbvh_prim, p, sn, u_sel)
        idx = jnp.clip(idx, 0, L - 1)
    else:
        idx = jnp.clip(jnp.searchsorted(lt.cdf, u_sel), 0, L - 1)
        pmf = lt.pmf[idx]
    if lt.rows is not None:
        # ONE cache-hot gather from the packed [L,16] light-row table
        # (p0/e1/e2/gn/area/pmf/mat_id precomputed at compile; emission
        # gathered live via mat_id from the material table) replaces
        # 6 scattered gathers into the big tri/material tables — measured
        # 50 ms of the 512^2x4 frame (round-4 NEE probe). Transpose the
        # gathered rows ONCE and read [R] columns (CLAUDE.md layout rule).
        row = lt.rows[idx].T                  # [16,R]
        c = lambda k: row[k]
        su = jnp.sqrt(u2[..., 0])
        b1 = 1.0 - su
        b2 = u2[..., 1] * su
        lpx = c(0) + c(3) * b1 + c(6) * b2
        lpy = c(1) + c(4) * b1 + c(7) * b2
        lpz = c(2) + c(5) * b1 + c(8) * b2
        tox = lpx - p[..., 0]
        toy = lpy - p[..., 1]
        toz = lpz - p[..., 2]
        d2 = jnp.maximum(tox * tox + toy * toy + toz * toz, 1e-12)
        inv_d = jax.lax.rsqrt(d2)
        wix, wiy, wiz = tox * inv_d, toy * inv_d, toz * inv_d
        cos_l = -(wix * c(9) + wiy * c(10) + wiz * c(11))
        geo = d2 / jnp.maximum(cos_l * c(12), 1e-12)
        pdf_sa = pmf * geo
        valid = (cos_l > 1e-6) & (L > 0)
        pdf_w = c(13) * geo if (use_tree and approx_mis) else pdf_sa
        # emission from the LIVE material table (tiny cache-hot gather):
        # material edits and emission gradients keep flowing
        mid = c(14).astype(jnp.int32)
        emis = scene.materials.emission[jnp.clip(
            mid, 0, scene.materials.n_materials() - 1)]
        return LightSample(pos=jnp.stack([lpx, lpy, lpz], -1),
                           normal=jnp.stack([c(9), c(10), c(11)], -1),
                           radiance=emis,
                           pdf_sa=pdf_sa, valid=valid, pdf_w=pdf_w)

    tid = lt.tri_index[idx]

    p0 = scene.tri_p0[tid]
    e1 = scene.tri_e1[tid]
    e2 = scene.tri_e2[tid]
    # uniform barycentrics: p = p0 + b1*e1 + b2*e2, b1+b2 <= 1
    su = jnp.sqrt(u2[..., 0])
    b1 = 1.0 - su
    b2 = u2[..., 1] * su
    lp = p0 + e1 * b1[..., None] + e2 * b2[..., None]
    gn = cross(e1, e2)
    area2 = jnp.linalg.norm(gn, axis=-1)
    gn = gn / jnp.maximum(area2, 1e-20)[..., None]
    area = 0.5 * area2

    to_l = lp - p
    d2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(d2)
    wi = to_l / dist[..., None]
    cos_l = -dot(wi, gn)            # light emits from its front face
    emis = scene.materials.emission[scene.tri_mat[tid]]
    geo = d2 / jnp.maximum(cos_l * area, 1e-12)
    pdf_sa = pmf * geo
    valid = (cos_l > 1e-6) & (L > 0)
    # MIS weighting pdf: the approx mode weights with the CDF pmf — the
    # same function light_pdf_sa(use_tree=False) evaluates on the BSDF
    # side, so the two strategy weights still sum to 1 (unbiased)
    pdf_w = lt.pmf[idx] * geo if (use_tree and approx_mis) else pdf_sa
    return LightSample(pos=lp, normal=gn, radiance=emis, pdf_sa=pdf_sa,
                       valid=valid, pdf_w=pdf_w)


def light_pdf_sa(scene: Scene, tid, p, hit_p, cos_l, sn_prev=None,
                 use_tree: bool = False, inst=None):
    """Solid-angle pdf that NEE would have generated this emissive hit —
    used for the MIS weight on BSDF-sampled emissive hits (reference
    computes the same from the light BVH: RayTracingShader.compute:162-211).

    inst: hit instance ids for instanced scenes — the light index is then
    inst_light_offset[inst] + inst_em_rank[tid] (local tri rows map to a
    light per INSTANCE, not per source)."""
    li = scene.light_tris.tri_to_light[tid]
    if inst is not None and scene.inst_em_rank is not None:
        rank = scene.inst_em_rank[tid]
        off = scene.inst_light_offset[jnp.maximum(inst, 0)]
        li_inst = jnp.where((inst >= 0) & (rank >= 0) & (off >= 0),
                            off + rank, -1)
        li = jnp.where(inst >= 0, li_inst, li)
    if use_tree:
        if scene.lcut_bounds is not None:
            from truetrace_tpu.kernels.lighttree import light_tree_pdf_cut
            pmf = light_tree_pdf_cut(
                scene.lbvh_pairs, scene.lbvh_trail, scene.lcut_bounds,
                scene.lcut_link, scene.lcut_of_light, scene.lcut_skip,
                li, p, sn_prev)
        else:
            from truetrace_tpu.kernels.lighttree import light_tree_pdf
            pmf = light_tree_pdf(scene.lbvh_pairs, scene.lbvh_trail,
                                 li, p, sn_prev)
    else:
        pmf = scene.light_tris.pmf[jnp.maximum(li, 0)]
    # area from the light's own (world-space) triangle row — for
    # instanced scenes tri_index points at the appended world copies
    if scene.light_tris.rows is not None \
            and scene.light_tris.rows.shape[0] > 0:
        area = scene.light_tris.rows[jnp.maximum(li, 0), 12]
    else:
        tid_l = scene.light_tris.tri_index[
            jnp.clip(jnp.maximum(li, 0), 0,
                     max(scene.light_tris.tri_index.shape[0] - 1, 0))] \
            if scene.light_tris.tri_index.shape[0] > 0 else tid
        e1 = scene.tri_e1[tid_l]
        e2 = scene.tri_e2[tid_l]
        area = 0.5 * jnp.linalg.norm(cross(e1, e2), axis=-1)
    to_l = hit_p - p
    d2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    pdf = pmf * d2 / jnp.maximum(cos_l * area, 1e-12)
    return jnp.where(li >= 0, pdf, 0.0)


# ---------------------------------------------------------------------------
# the integrator
# ---------------------------------------------------------------------------

def _scene_max_leaf(scene: Scene, cfg: "RenderConfig") -> int:
    """Static BVH2 leaf capacity for the bvh2 oracle path. A
    with_cwbvh compile builds max_leaf = leaf_k leaves (derivable from
    the packed row width); plain builds use cfg.max_leaf. Passing too
    small a value silently skips tris 5..k per leaf (round-4 bug:
    auto-k12 default broke the drive's bvh2 render)."""
    if scene.cw_leaf_rows.shape[0] > 0:
        return max(cfg.max_leaf, scene.cw_leaf_rows.shape[1] // 10)
    return cfg.max_leaf


def _trace(scene: Scene, ro, rd, cfg: "RenderConfig", alive=None):
    """Closest hit. Returns (Hit, inst [R] int32 — -1 except for the
    two-level "tlas" path, where it is the hit instance id)."""
    # dead lanes get t_max = 0: they fail the root slab immediately, so
    # the traversal's occupancy cascade compacts them out after the first
    # stage — the integrator-level analogue of the reference's shrinking
    # work queues (BufferSizes/TransferKernel indirect dispatch)
    t_max = T_MAX if alive is None else jnp.where(alive, T_MAX, 0.0)
    no_inst = jnp.full((ro.shape[0],), -1, jnp.int32)
    if cfg.traversal == "tlas":
        # interleaved two-level traversal over instanced scenes
        # (kernels/cwbvh_tlas.py; reference IntersectionKernels.compute:
        # 155-252 TLAS->BLAS W2L push/pop)
        from truetrace_tpu.kernels.cwbvh_tlas import closest_hit_tlas
        return closest_hit_tlas(scene.cw_nodes, scene.cw_leaf_rows,
                                scene.inst_rows, ro, rd, t_max)
    if cfg.traversal == "brute":
        from truetrace_tpu.kernels.tri_mxu import intersect_brute
        return intersect_brute(scene.woop, ro, rd, t_max), no_inst
    if cfg.traversal == "wavefront":
        from truetrace_tpu.kernels.cwbvh_wavefront import closest_hit_wavefront
        return closest_hit_wavefront(
            scene.cw_nodes, scene.cw_leaf_rows, ro, rd, t_max,
            max_stack=scene.cw_stack), no_inst
    if cfg.traversal == "cwbvh":
        # scene.cw_nodes are pack_leaf_rows-patched (word 5 = base leaf
        # row), so the rows-aware oracle must be used here
        from truetrace_tpu.kernels.cwbvh_ref import closest_hit_cwbvh_rows
        return closest_hit_cwbvh_rows(
            scene.cw_nodes, scene.cw_leaf_rows, ro, rd, t_max), no_inst
    return closest_hit_bvh2(
        scene.bvh2_box, scene.bvh2_left, scene.bvh2_count,
        scene.tri_p0, scene.tri_e1, scene.tri_e2, ro, rd, t_max,
        max_leaf=_scene_max_leaf(scene, cfg)), no_inst


def _occluded(scene: Scene, ro, rd, t_max, cfg: "RenderConfig"):
    blocked = _occluded_mesh(scene, ro, rd, t_max, cfg)
    if scene.terrain is not None:
        # reference kernel_shadow_heightmap
        # (IntersectionKernels.compute:598-710)
        from truetrace_tpu.kernels.heightmap import heightmap_any
        blocked = blocked | heightmap_any(scene.terrain, ro, rd, t_max)
    return blocked


def _transmission(scene: Scene, ro, rd, t_max, cfg: "RenderConfig"):
    """Shadow-ray transmittance [R,3]: binary visibility on all-opaque
    scenes (fast any-hit), per-surface tint product through cutout-alpha
    and stained glass otherwise — on the single-BLAS wavefront AND the
    two-level "tlas" path (reference handles instanced geometry in the
    same any-hit, IntersectionKernels.compute:264-498;
    CommonData.cginc:593-634 StainedGlassShadows)."""
    if scene.tri_shadow is None:
        blocked = _occluded(scene, ro, rd, t_max, cfg)
        return jnp.where(blocked[..., None], 0.0, 1.0)
    if cfg.traversal == "tlas":
        from truetrace_tpu.kernels.cwbvh_tlas import transmit_tlas
        tp = transmit_tlas(scene.cw_nodes, scene.cw_leaf_rows,
                           scene.inst_rows, scene.tri_shadow, ro, rd,
                           t_max)
    elif cfg.traversal == "wavefront":
        from truetrace_tpu.kernels.cwbvh_wavefront import transmit_wavefront
        tp = transmit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                scene.tri_shadow, ro, rd, t_max,
                                max_stack=scene.cw_stack)
    else:
        # portable oracle path (small test scenes)
        from truetrace_tpu.kernels.traverse_ref import transmit_brute
        tp = transmit_brute(scene.tri_p0, scene.tri_e1, scene.tri_e2,
                            scene.tri_shadow, ro, rd, t_max)
    if scene.terrain is not None:
        from truetrace_tpu.kernels.heightmap import heightmap_any
        tp = jnp.where(
            heightmap_any(scene.terrain, ro, rd, t_max)[..., None],
            0.0, tp)
    return tp


def _occluded_mesh(scene: Scene, ro, rd, t_max, cfg: "RenderConfig"):
    if cfg.traversal == "tlas":
        from truetrace_tpu.kernels.cwbvh_tlas import any_hit_tlas
        return any_hit_tlas(scene.cw_nodes, scene.cw_leaf_rows,
                            scene.inst_rows, ro, rd, t_max)
    if cfg.traversal == "brute":
        from truetrace_tpu.kernels.tri_mxu import any_hit_brute
        return any_hit_brute(scene.woop, ro, rd, t_max)
    if cfg.traversal == "wavefront":
        from truetrace_tpu.kernels.cwbvh_wavefront import any_hit_wavefront
        return any_hit_wavefront(
            scene.cw_nodes, scene.cw_leaf_rows, ro, rd, t_max,
            max_stack=scene.cw_stack)
    if cfg.traversal == "cwbvh":
        from truetrace_tpu.kernels.cwbvh_ref import any_hit_cwbvh_rows
        return any_hit_cwbvh_rows(
            scene.cw_nodes, scene.cw_leaf_rows, ro, rd, t_max)
    return any_hit_bvh2(
        scene.bvh2_box, scene.bvh2_left, scene.bvh2_count,
        scene.tri_p0, scene.tri_e1, scene.tri_e2, ro, rd, t_max,
        max_leaf=_scene_max_leaf(scene, cfg))


def render_sample(scene: Scene, cam: Camera, cfg: RenderConfig,
                  sample_id) -> jnp.ndarray:
    """Trace one sample per pixel of the full frame. [H*W,3] radiance."""
    pixel = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    return render_sample_pixels(scene, cam, cfg, pixel, sample_id)


def render_sample_pixels(scene: Scene, cam: Camera, cfg: RenderConfig,
                         pixel, sample_id) -> jnp.ndarray:
    """Trace one sample for an explicit flat-pixel-id batch (the unit the
    tile-sharded distributed path maps over). Returns [R,3] radiance."""
    radiance, _ = render_sample_with_stats(scene, cam, cfg, pixel, sample_id)
    return radiance


def render_sample_with_stats(scene: Scene, cam: Camera, cfg: RenderConfig,
                             pixel, sample_id, cache=None, di_sample=None,
                             jitter=None):
    """Like render_sample_pixels but also returns ray-count stats
    {n_trace, n_shadow} (the Mrays/s accounting the benchmarks use —
    counterpart of the reference's BufferSizes counters,
    IntersectionKernels.compute:79).

    jitter: optional [2] subpixel offset shared by every pixel this frame
    (the TAAU jitter sequence, post/pipeline.py taau_jitter); None = the
    default per-pixel random AA jitter."""
    W, H = cfg.width, cfg.height
    pixel = pixel.astype(jnp.uint32)
    sid = jnp.asarray(sample_id, jnp.uint32)
    _, u2 = _samplers(cfg)
    if jitter is None:
        jit2 = u2(pixel, sid, jnp.uint32(rng.DIM_CAMERA_JITTER))
    else:
        jit2 = jnp.broadcast_to(jnp.asarray(jitter, jnp.float32),
                                (pixel.shape[0], 2))
    # thin-lens DoF: lens sample drawn from a dedicated dimension; when
    # cam.aperture == 0 the offset vanishes (pinhole)
    lens_u = u2(pixel, sid + jnp.uint32(0x9E3779B9),
                jnp.uint32(rng.DIM_CAMERA_JITTER))
    ro, rd = camera_rays(cam, W, H, pixel.astype(jnp.int32), jit2,
                         lens_u=lens_u)
    # per-pixel ray-cone spread (texture LOD; Amanatides/Akenine-Moller
    # ray cones replace the reference's HW-derivative texture fetches)
    spread0 = 2.0 * jnp.tan(cam.fov_y * 0.5) / H
    return trace_rays(scene, ro, rd, cfg, pixel, sid, cam=cam, cache=cache,
                      cone_spread=spread0, di_sample=di_sample)


def trace_rays(scene: Scene, ro, rd, cfg: RenderConfig, pixel, sample_id,
               cam: Optional[Camera] = None, cache=None,
               cone_spread=None, di_sample=None):
    """Path-trace explicit primary rays (lightmap baking, custom cameras,
    debugging probes). Returns (radiance [R,3], stats dict).

    di_sample: optional dict {pos, ln, rad [R,3], W [R]} of ReSTIR DI
    reservoir light samples (integrate/restir_di.py). When given, the
    bounce-0 mesh-light NEE uses the reservoir sample at full weight
    (contribution f*Le*G*W) and the complementary BSDF-sampled emissive
    MIS term at bounce 1 is dropped — reservoirs become the sole direct
    mesh-light strategy at the primary vertex, like the reference's
    RIS-driven NEE (CommonData.cginc:861 SelectLightMeshSmart)."""
    R = ro.shape[0]
    pixel = pixel.astype(jnp.uint32)
    sid = jnp.asarray(sample_id, jnp.uint32)
    bsdf_sample, bsdf_eval = get_bsdf(cfg.bsdf)
    smp1, smp2 = _samplers(cfg)

    radiance = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones((R,), bool)
    # G-buffer capture at the primary hit (feeds the denoisers — the
    # reference's _PrimaryTriangleInfo / DepthCopyKernel path)
    g_albedo = jnp.ones((R, 3), jnp.float32)
    g_normal = jnp.zeros((R, 3), jnp.float32)
    g_depth = jnp.zeros((R,), jnp.float32)
    # ReSTIR GI candidate capture (integrate/restir.py): split of direct
    # (bounce-0) vs indirect radiance + the second path vertex record
    r_direct = jnp.zeros((R, 3), jnp.float32)
    r_x2 = jnp.zeros((R, 3), jnp.float32)
    r_n2 = jnp.zeros((R, 3), jnp.float32)
    r_tp1 = jnp.ones((R, 3), jnp.float32)     # f1*cos1/pdf1 of bounce 0
    r_pdf1 = jnp.zeros((R,), jnp.float32)
    r_valid = jnp.zeros((R,), bool)
    r_x1 = jnp.zeros((R, 3), jnp.float32)
    r_mat1 = jnp.zeros((R,), jnp.int32)
    r_emit0 = jnp.zeros((R, 3), jnp.float32)   # emitted at primary, pre-NEE
    # radiance-cache records (integrate/radiance_cache.py): one slot per
    # bounce — vertex cell, radiance prefix and throughput at entry
    B = cfg.bounces
    c_w0 = jnp.zeros((R, B), jnp.uint32)   # packed cache cell words
    c_w1 = jnp.zeros((R, B), jnp.uint32)   # (radiance_cache._pack_cell)
    c_prefix = jnp.zeros((R, B, 3), jnp.float32)
    c_tp = jnp.zeros((R, B, 3), jnp.float32)
    c_live = jnp.zeros((R, B), bool)
    cam_pos = cam.c2w[3, :3] if cam is not None else ro[0]
    # ray cones for texture LOD: width at origin + spread per unit t
    cone_w = jnp.zeros((R,), jnp.float32)
    cone_s = jnp.broadcast_to(jnp.asarray(
        cone_spread if cone_spread is not None else 0.002, jnp.float32),
        (R,))
    prev_pdf = jnp.zeros((R,), jnp.float32)   # 0 => previous bounce not MIS-able
    prev_n = jnp.zeros((R, 3), jnp.float32)   # prev shading normal (tree pdf)
    n_trace = jnp.zeros((), jnp.float32)
    n_shadow = jnp.zeros((), jnp.float32)
    use_tree = (cfg.light_sampling == "tree"
                and scene.lbvh_pairs.shape[0] > 0)
    # pending NEE shadow rays (fused dispatch, see RenderConfig.fuse_nee):
    # generated at bounce b, resolved inside bounce b+1's mixed trace
    s_ro = jnp.zeros((R, 3), jnp.float32)
    s_rd = jnp.zeros((R, 3), jnp.float32)
    s_rd = s_rd.at[:, 2].set(1.0)
    s_tmax = jnp.zeros((R,), jnp.float32)       # 0 = no pending ray
    s_contrib = jnp.zeros((R, 3), jnp.float32)

    # NEE strategy mix (reference picks a light group per shade:
    # RayTracingShader.compute:328-344): mesh emitters / env map / analytic
    has_mesh = scene.light_tris.tri_index.shape[0] > 0
    has_env_tex = scene.env.image.shape[0] > 1
    has_analytic = scene.lights.position.shape[0] > 0
    n_groups = (int(has_mesh) + int(has_env_tex and cfg.use_nee)
                + int(has_analytic)) if cfg.use_nee else 0
    p_group = 1.0 / n_groups if n_groups else 1.0
    # fused NEE applies only where the mixed dispatch is exact: binary
    # visibility (all-opaque, no terrain) on the single-BLAS wavefront
    fused = (cfg.fuse_nee and cfg.use_nee and n_groups > 0
             and cfg.traversal == "wavefront"
             and scene.tri_shadow is None and scene.terrain is None
             and cfg.debug_nee != "noshadow")

    def bounce(b, state):
        (ro, rd, radiance, throughput, alive, prev_pdf, prev_n,
         g_albedo, g_normal, g_depth, cone_w, cone_s,
         r_direct, r_x2, r_n2, r_tp1, r_pdf1, r_valid, r_x1, r_mat1,
         c_w0, c_w1, c_prefix, c_tp, c_live,
         n_trace, n_shadow, r_emit0, n_cq, n_ch,
         s_ro, s_rd, s_tmax, s_contrib, m_ids, m_sp, g_inst) = state
        n_trace = n_trace + jnp.sum(alive.astype(jnp.float32))
        if fused:
            # ONE mixed dispatch: this bounce's closest-hit rays
            # interleaved with the PREVIOUS bounce's pending NEE shadow
            # rays (any-hit lanes early-out; the occupancy cascade
            # compacts fast-retiring shadow lanes against closest-hit
            # stragglers). Adding the resolved NEE contribution here —
            # before this bounce's env/emissive adds — preserves the
            # unfused addition order exactly.
            from truetrace_tpu.kernels.cwbvh_wavefront import (
                mixed_hit_wavefront)
            ro2 = jnp.stack([ro, s_ro], 1).reshape(2 * R, 3)
            rd2 = jnp.stack([rd, s_rd], 1).reshape(2 * R, 3)
            tm2 = jnp.stack([jnp.where(alive, T_MAX, 0.0), s_tmax],
                            1).reshape(2 * R)
            af2 = jnp.stack([jnp.zeros((R,), bool), jnp.ones((R,), bool)],
                            1).reshape(2 * R)
            h2 = mixed_hit_wavefront(scene.cw_nodes, scene.cw_leaf_rows,
                                     ro2, rd2, tm2, af2,
                                     max_stack=scene.cw_stack)
            h2 = jax.tree_util.tree_map(jax.lax.stop_gradient, h2)
            hit = Hit(t=h2.t.reshape(R, 2)[:, 0],
                      tri=h2.tri.reshape(R, 2)[:, 0],
                      u=h2.u.reshape(R, 2)[:, 0],
                      v=h2.v.reshape(R, 2)[:, 0])
            inst = jnp.full((R,), -1, jnp.int32)
            s_vis = (h2.tri.reshape(R, 2)[:, 1] < 0) & (s_tmax > 0.0)
            radiance = radiance + jnp.where(s_vis[..., None],
                                            s_contrib, 0.0)
            if cfg.restir_capture:
                # bounce-0 NEE resolves here (top of bounce 1): radiance
                # now equals the unfused end-of-bounce-0 direct snapshot
                r_direct = jnp.where(b == 1, radiance, r_direct)
        else:
            hit, inst = _trace(scene, ro, rd, cfg, alive=alive)
        # detached estimator: traversal is not differentiated — this also
        # keeps XLA from saving while-loop carries for backward (the
        # dominant backward-memory term; diff/render_grad.py)
        hit = jax.tree_util.tree_map(jax.lax.stop_gradient, hit)
        inst = jax.lax.stop_gradient(inst)
        # terrain heightfield: the reference runs kernel_heightmap after
        # kernel_trace against the same hit records
        # (RayTracingMaster.cs:975); here we march it and keep the nearer t
        if scene.terrain is not None:
            from truetrace_tpu.kernels.heightmap import (
                heightmap_closest, sample_layers)
            th = heightmap_closest(scene.terrain, ro, rd, hit.t)
            ter_take = alive & th.valid & (th.t < hit.t)
            hit = Hit(t=jnp.where(ter_take, th.t, hit.t), tri=hit.tri,
                      u=hit.u, v=hit.v)
        else:
            ter_take = jnp.zeros((R,), bool)
        hit_ok = ((hit.tri >= 0) | ter_take) & alive

        # ---- miss: environment (MIS against env NEE when it is active)
        if has_env_tex:
            from truetrace_tpu.kernels.envmap import env_eval, env_pdf
            env_rgb = env_eval(scene.env, rd)
            if cfg.use_nee:
                e_pdf = env_pdf(scene.env, rd) * p_group
                w_env = jnp.where((b == 0) | (prev_pdf <= 0.0), 1.0,
                                  power_heuristic(prev_pdf, e_pdf))
            else:
                w_env = jnp.ones((R,), jnp.float32)
            env_rgb = env_rgb * w_env[..., None]
        else:
            env_rgb = scene.env.image[0, 0] * scene.env.intensity
        radiance = radiance + jnp.where(
            (alive & ~(hit.tri >= 0) & ~ter_take)[..., None],
            throughput * env_rgb, 0.0)

        tid = jnp.maximum(hit.tri, 0)
        p = ro + rd * hit.t[..., None]
        e1 = scene.tri_e1[tid]
        e2 = scene.tri_e2[tid]
        gn = normalize(cross(e1, e2))
        n0 = scene.tri_n[tid]
        w = 1.0 - hit.u - hit.v
        sn = normalize(n0[:, 0] * w[..., None] + n0[:, 1] * hit.u[..., None]
                       + n0[:, 2] * hit.v[..., None])
        if scene.inst_l2w is not None:
            # instanced hit: triangle rows are instance-local — rotate
            # normals into world space by the hit instance's L2W (exact
            # for rotation + uniform scale, the supported instance set)
            rot = scene.inst_l2w[jnp.maximum(inst, 0)][:, :, :3]  # [R,3,3]
            on_inst = (inst >= 0)[..., None]
            gn = jnp.where(on_inst,
                           normalize(jnp.einsum("rij,rj->ri", rot, gn)), gn)
            sn = jnp.where(on_inst,
                           normalize(jnp.einsum("rij,rj->ri", rot, sn)), sn)
        # face-forward both normals against the incoming ray
        flip = (dot(gn, rd) > 0.0)
        front = ~flip
        gn = jnp.where(flip[..., None], -gn, gn)
        sn = jnp.where((dot(sn, rd) > 0.0)[..., None], -sn, sn)

        mid = scene.tri_mat[tid]
        if scene.terrain is not None:
            # terrain lanes: heightfield normal + dominant-layer material id
            tn = th.normal
            tn = jnp.where((dot(tn, rd) > 0.0)[..., None], -tn, tn)
            gn = jnp.where(ter_take[..., None], tn, gn)
            sn = jnp.where(ter_take[..., None], tn, sn)
            front = jnp.where(ter_take, True, front)
            layer_w = sample_layers(scene.terrain, th.uv)      # [R,4]
            dom = jnp.argmax(layer_w, axis=-1)
            mid = jnp.where(ter_take,
                            jnp.maximum(scene.terrain.mat_ids[dom], 0), mid)
        mat = gather_material(scene.materials, mid)
        if scene.terrain is not None:
            # blend the continuous Disney params over the up-to-4 layers
            # (reference terrain layer blending,
            # RayTracingShader.compute:587-616)
            rows = gather_material(
                scene.materials, jnp.maximum(scene.terrain.mat_ids, 0))

            def _blend(cur, lay):
                if lay.dtype.kind != "f":
                    return cur                       # tex ids: dominant layer
                mix = jnp.einsum("rk,k...->r...", layer_w, lay)
                keep = ter_take.reshape((R,) + (1,) * (cur.ndim - 1))
                return jnp.where(keep, mix, cur)

            mat = jax.tree_util.tree_map(_blend, mat, rows)

        # ---- texture fetches (atlas; reference samples its packed atlas
        # rects in kernel_shade, RayTracingShader.compute:630-649)
        if scene.atlas_rects.shape[0] > 0:
            from truetrace_tpu.scene.atlas import sample_atlas, transform_uv
            uv0 = scene.tri_uv[tid]
            uv = (uv0[:, 0] * w[..., None] + uv0[:, 1] * hit.u[..., None]
                  + uv0[:, 2] * hit.v[..., None])
            if scene.terrain is not None:
                uv = jnp.where(ter_take[..., None], th.uv, uv)
            # per-material UV transforms (reference AlignUV call sites,
            # RayTracingShader.compute:623-627): albedo/emission/matcap
            # use uv_scale; normal/metallic/roughness use uv2_scale with
            # the shared offset
            uv_a = transform_uv(uv, mat.uv_scale, mat.uv_rot)
            uv_s = transform_uv(
                uv, jnp.concatenate([mat.uv2_scale, mat.uv_scale[:, 2:4]],
                                    axis=1), mat.uv_rot)
            # tangent-space normal mapping (reference normal-map path,
            # RayTracingShader.compute:129-159; tangents built like the
            # CudaTriangle octahedral tangents, CommonVars.cs:437-456)
            nm = sample_atlas(scene.atlas, scene.atlas_rects,
                              mat.tex_normal, uv_s)
            tan = scene.tri_tan[tid]
            if scene.inst_l2w is not None:
                rot_t = scene.inst_l2w[jnp.maximum(inst, 0)][:, :, :3]
                tan = jnp.where((inst >= 0)[..., None],
                                jnp.einsum("rij,rj->ri", rot_t, tan), tan)
            tan_ok = jnp.sum(tan * tan, axis=-1) > 1e-8
            t_ = tan - sn * dot(tan, sn)[..., None]
            t_ = t_ / jnp.maximum(
                jnp.linalg.norm(t_, axis=-1, keepdims=True), 1e-8)
            b_ = cross(sn, t_)
            n_ts = nm[:, :3] * 2.0 - 1.0
            # NormalStrength scales the tangent-plane deflection
            # (reference RayTracingShader.compute:134: strength * sample
            # recentred); z is rebuilt so the map renormalizes cleanly
            ns = mat.normal_strength[:, None]
            n_xy = n_ts[:, 0:2] * ns
            n_z = jnp.sqrt(jnp.maximum(
                1.0 - jnp.sum(n_xy * n_xy, axis=-1, keepdims=True), 0.0025))
            sn_m = normalize(t_ * n_xy[:, 0:1] + b_ * n_xy[:, 1:2]
                             + sn * n_z)
            use_nm = (mat.tex_normal >= 0) & tan_ok & hit_ok
            sn = jnp.where(use_nm[..., None], sn_m, sn)
            width = cone_w + hit.t * cone_s
            lod = (scene.tri_lod[tid] + jnp.log2(jnp.maximum(width, 1e-12))
                   - jnp.log2(jnp.maximum(jnp.abs(dot(rd, gn)), 0.05)))
            alb = sample_atlas(scene.atlas, scene.atlas_rects,
                               mat.tex_albedo, uv_a, lod=lod,
                               level_y=scene.atlas_level_y)
            tex_col = mat.base_color * alb[:, :3]
            # texture adjustment chain on the fetched albedo (reference
            # hue/brightness/saturation/contrast/blend,
            # RayTracingShader.compute:630-649) — textured lanes only
            from truetrace_tpu.core.math import adjust_color
            tex_col = adjust_color(tex_col, mat.hue, mat.brightness,
                                   mat.saturation, mat.contrast,
                                   mat.blend_color, mat.blend_factor)
            mat = mat.replace(base_color=jnp.where(
                (mat.tex_albedo >= 0)[..., None], tex_col, mat.base_color))
            # texture-driven cutout alpha (reference AdvancedAlphaMapped)
            mat = mat.replace(alpha=jnp.where(
                mat.tex_albedo >= 0, mat.alpha * alb[:, 3], mat.alpha))
            rm = sample_atlas(scene.atlas, scene.atlas_rects,
                              mat.tex_rough_metal, uv_s)
            mat = mat.replace(
                roughness=jnp.where(mat.tex_rough_metal >= 0,
                                    mat.roughness * rm[:, 1], mat.roughness),
                metallic=jnp.where(mat.tex_rough_metal >= 0,
                                   mat.metallic * rm[:, 2], mat.metallic))
            # separate single-channel overrides (reference MetallicTex /
            # RoughnessTex fetches, RayTracingShader.compute:654-657:
            # replace, metallic gated off for full spec_trans, roughness
            # optionally inverted smoothness)
            mtl = sample_atlas(scene.atlas, scene.atlas_rects,
                               mat.tex_metallic, uv_s)
            mat = mat.replace(metallic=jnp.where(
                (mat.tex_metallic >= 0) & (mat.spec_trans < 1.0),
                mtl[:, 0], mat.metallic))
            rgh = sample_atlas(scene.atlas, scene.atlas_rects,
                               mat.tex_roughness, uv_s)
            rgh_v = jnp.where(mat.rough_tex_invert > 0.5,
                              1.0 - rgh[:, 0], rgh[:, 0])
            mat = mat.replace(roughness=jnp.where(
                mat.tex_roughness >= 0, jnp.clip(rgh_v, 0.0, 1.0),
                mat.roughness))
            # dedicated alpha texture (reference AlphaTex cutout fetch,
            # IntersectionKernels.compute:38-39)
            alp = sample_atlas(scene.atlas, scene.atlas_rects,
                               mat.tex_alpha, uv_s)
            mat = mat.replace(alpha=jnp.where(
                mat.tex_alpha >= 0, mat.alpha * alp[:, 0], mat.alpha))
            em = sample_atlas(scene.atlas, scene.atlas_rects,
                              mat.tex_emission, uv_a)
            mat = mat.replace(emission=jnp.where(
                (mat.tex_emission >= 0)[..., None],
                mat.emission * em[:, :3], mat.emission))
            if cam is not None:
                # matcap: view-space-normal atlas lookup modulating the
                # base color at the primary hit (reference matcap path,
                # RayTracingShader.compute:129-159)
                vx = dot(sn, cam.c2w[0, :3])
                vy = dot(sn, cam.c2w[1, :3])
                uv_m = transform_uv(jnp.stack([vx, vy], -1) * 0.5 + 0.5,
                                    mat.uv_scale, mat.uv_rot)
                mc = sample_atlas(scene.atlas, scene.atlas_rects,
                                  mat.tex_matcap, uv_m)
                use_mc = (mat.tex_matcap >= 0) & (b == 0)
                # MatCapMask: lerp base -> matcap by the mask channel
                # (reference RayTracingShader.compute:152-157); no mask
                # keeps the multiply blend
                mk = sample_atlas(scene.atlas, scene.atlas_rects,
                                  mat.tex_matcap_mask, uv_a)
                has_mask = (mat.tex_matcap_mask >= 0)
                mc_col = jnp.where(
                    has_mask[..., None],
                    mat.base_color + (mc[:, :3] - mat.base_color)
                    * mk[:, 0:1],
                    mat.base_color * mc[:, :3])
                mat = mat.replace(base_color=jnp.where(
                    use_mc[..., None], mc_col, mat.base_color))

        # ---- roughness/metallic remap ranges (reference
        # RayTracingShader.compute:654-662; (0,1) = identity)
        mat = mat.replace(
            roughness=jnp.clip(
                mat.rough_remap[:, 0] + mat.roughness
                * (mat.rough_remap[:, 1] - mat.rough_remap[:, 0]),
                1e-5, 1.0),
            metallic=jnp.clip(
                mat.metal_remap[:, 0] + mat.metallic
                * (mat.metal_remap[:, 1] - mat.metal_remap[:, 0]),
                0.0, 1.0))

        # ---- glass interior transport via a per-lane MEDIUM STACK
        # (beyond the reference's backface heuristic,
        # RayTracingShader.compute:278-281, which misses water absorption
        # on segments ending at nested objects' front faces). m_ids [R,4]
        # holds the material ids of the dielectrics the lane is inside
        # (innermost = slot m_sp-1); every segment that lands on a hit
        # attenuates by the CURRENT medium's Beer-Lambert extinction over
        # hit.t (Materials.cginc:350 CalculateExtinction; scatter_dist
        # <= 0 treated as 1). Non-watertight transmissive meshes should
        # author thin=1 (sheets) — thin surfaces never push media.
        # compiled OUT entirely for media-free scenes (Scene.has_media
        # static flag — the block measured ~20 ms/bounce at 512^2)
        if scene.has_media:
            in_medium = m_sp > 0
            cur_med = jnp.take_along_axis(
                m_ids, jnp.clip(m_sp - 1, 0, MED_STACK - 1)[:, None],
                axis=1)[:, 0]
            # gather ONLY the 4 needed material columns (the full-row
            # gather_material here cost a second material fetch per
            # bounce)
            safe_med = jnp.maximum(cur_med, 0)
            med_tc = scene.materials.transmit_color[safe_med]
            med_bc = scene.materials.base_color[safe_med]
            med_sd = scene.materials.scatter_dist[safe_med]
            med_ior = scene.materials.ior[safe_med]
            m_authored = jnp.all(med_tc >= 0.0, axis=-1, keepdims=True)
            # apparent interior color: the authored TransmittanceColor
            # when present (reference keys CalculateExtinction on it,
            # CommonVars.cs:109), else derived from the surface tint
            app = jnp.where(m_authored,
                            jnp.clip(1.0 - med_tc, 0.0, 1.0),
                            jnp.clip(1.0 - med_bc, 0.0, 1.0))
            s_ext = 1.9 - app + 3.5 * (app - 0.8) ** 2
            sd = jnp.where(med_sd <= 0.0, 1.0, med_sd)
            # deviation from the reference formula at app == 0 exactly: a
            # perfectly white glass is treated as clear (sigma = 0) so
            # the white furnace stays neutral; the reference would absorb
            # at 1/(4.14 * dist) even for white glass
            att = jnp.where(
                app <= 0.0, 1.0,
                jnp.exp(-hit.t[..., None] / (s_ext * sd[..., None])))
            apply_att = in_medium & hit_ok
            throughput = jnp.where(apply_att[..., None], throughput * att,
                                   throughput)
            # relative eta fed to the BSDF = n_dest / n_src (air
            # boundaries reproduce the classic ior on entry, 1/ior on
            # exit): entering a surface from medium c -> n_surface/n_c;
            # exiting it -> the second-innermost medium (or air) over
            # n_surface
            transmissive = hit_ok & (mat.spec_trans > 0.0) \
                & (mat.thin < 0.5)
            n_cur = jnp.where(in_medium, med_ior, 1.0)
            below_id = jnp.take_along_axis(
                m_ids, jnp.clip(m_sp - 2, 0, MED_STACK - 1)[:, None],
                axis=1)[:, 0]
            n_below = jnp.where(
                m_sp > 1,
                scene.materials.ior[jnp.maximum(below_id, 0)], 1.0)
            ior_eff = jnp.where(front,
                                mat.ior / jnp.maximum(n_cur, 1e-6),
                                n_below / jnp.maximum(mat.ior, 1e-6))
            mat = mat.replace(ior=jnp.where(transmissive, ior_eff,
                                            mat.ior))
        else:
            transmissive = jnp.zeros((R,), bool)

        # ---- cutout alpha: stochastically pass straight through partial
        # surfaces (reference alpha-mapped any/closest-hit skips,
        # IntersectionKernels.compute:264-498); the lane keeps flying in
        # the same direction and spends one loop iteration
        u_cut = smp1(pixel, sid,
                     jnp.uint32(rng.path_dim(b, rng.DIM_AUX)))
        passthru = hit_ok & (mat.alpha < 1.0) & (u_cut >= mat.alpha)
        hit_ok = hit_ok & ~passthru

        # ---- primary-hit G-buffer
        first = (b == 0)
        g_albedo = jnp.where(first & hit_ok[..., None], mat.base_color,
                             g_albedo)
        g_normal = jnp.where(first & hit_ok[..., None], sn, g_normal)
        g_depth = jnp.where(first & hit_ok, hit.t, g_depth)
        # primary-hit instance id (tlas path; -1 elsewhere) — feeds
        # per-OBJECT motion vectors (post/motion.py; the reference's
        # engine MotionVectors consumed by RayGenKernels.compute:78-82)
        g_inst = jnp.where(first & hit_ok, inst, g_inst)
        if cfg.restir_capture:
            # second path vertex (the GI sample point); first vertex + mat
            second = (b == 1)
            r_x2 = jnp.where(second & hit_ok[..., None], p, r_x2)
            r_n2 = jnp.where(second & hit_ok[..., None], gn, r_n2)
            r_valid = r_valid | (second & hit_ok)
            r_x1 = jnp.where(first & hit_ok[..., None], p, r_x1)
            r_mat1 = jnp.where(first & hit_ok, mid, r_mat1)

        if cfg.cache_capture or cfg.cache_query_bounce >= 0:
            from truetrace_tpu.integrate.radiance_cache import (
                cache_cell_packed, cache_query)
        if cfg.cache_capture:
            # record the vertex cell + entry prefix/throughput at bounce b
            _, _, v_w0, v_w1 = cache_cell_packed(p, sn, cam_pos)
            c_w0 = c_w0.at[:, b].set(jnp.where(hit_ok, v_w0, 0))
            c_w1 = c_w1.at[:, b].set(jnp.where(hit_ok, v_w1, 0))
            c_prefix = c_prefix.at[:, b].set(radiance)
            c_tp = c_tp.at[:, b].set(throughput)
            c_live = c_live.at[:, b].set(hit_ok)
        if cfg.cache_query_bounce >= 0 and cache is not None:
            # terminate paths with a confident cache entry (reference:
            # radiance-cache hooks RayTracingShader.compute:303-326)
            q_rad, q_hit = cache_query(cache, p, sn, cam_pos)
            q_able = hit_ok & (b >= cfg.cache_query_bounce)
            q_take = q_able & q_hit
            n_cq = n_cq + jnp.sum(q_able.astype(jnp.float32))
            n_ch = n_ch + jnp.sum(q_take.astype(jnp.float32))
            radiance = radiance + jnp.where(q_take[..., None],
                                            throughput * q_rad, 0.0)
            alive = alive & ~q_take
            hit_ok = hit_ok & ~q_take

        # ---- emissive hit (MIS against NEE)
        emis = mat.emission
        is_emis = jnp.max(emis, axis=-1) > 0.0
        cos_l = -dot(rd, gn)  # gn already flipped; use front-ness for emission
        if cfg.use_nee and has_mesh and cfg.debug_nee != "nomis":
            l_pdf = light_pdf_sa(
                scene, tid, ro, p, jnp.maximum(cos_l, 1e-6),
                sn_prev=prev_n,
                use_tree=use_tree and cfg.nee_mis == "exact",
                inst=inst if scene.inst_l2w is not None else None) * p_group
            mis_w = jnp.where((b == 0) | (prev_pdf <= 0.0), 1.0,
                              power_heuristic(prev_pdf, l_pdf))
        else:
            mis_w = jnp.ones((R,), jnp.float32)
        if di_sample is not None:
            # bounce-0 direct mesh light is fully estimated by the DI
            # reservoir NEE; drop the BSDF-sampled complement at bounce 1
            mis_w = jnp.where(b == 1, 0.0, mis_w)
        emit_take = hit_ok & is_emis & front
        radiance = radiance + jnp.where(
            emit_take[..., None], throughput * emis * mis_w[..., None], 0.0)
        # emitted-at-primary (+ env on miss), snapshotted BEFORE NEE: the
        # piece ReSTIR DI keeps when it replaces the direct light, and the
        # noise-free channel the denoisers pass through UNfiltered
        # (reference CopyData splits it out, ASVGF.compute:177)
        r_emit0 = jnp.where(b == 0, radiance, r_emit0)

        # ---- NEE: pick one strategy {mesh, env, analytic} per lane
        wo = -rd
        if n_groups > 0:
            u_sel = smp1(pixel, sid,
                         jnp.uint32(rng.path_dim(b, rng.DIM_LIGHT_SELECT)))
            u_l2 = smp2(pixel, sid,
                        jnp.uint32(rng.path_dim(b, rng.DIM_LIGHT_SAMPLE)))
            g_pick = jnp.clip((u_sel * n_groups).astype(jnp.int32),
                              0, n_groups - 1)
            u_resc = jnp.clip(u_sel * n_groups - g_pick.astype(jnp.float32),
                              0.0, 1.0 - 1e-7)

            # strategy results, selected lane-wise
            wi_l = jnp.zeros((R, 3), jnp.float32)
            dist_l = jnp.zeros((R,), jnp.float32)
            rad_l = jnp.zeros((R, 3), jnp.float32)
            pdf_l = jnp.zeros((R,), jnp.float32)    # solid-angle pdf * p_group
            pdfw_l = jnp.zeros((R,), jnp.float32)   # MIS weighting pdf
            delta_l = jnp.zeros((R,), bool)
            valid_l = jnp.zeros((R,), bool)
            gi = 0
            if has_mesh:
                ls = sample_light_tris(scene, p, u_resc, u_l2, sn=sn,
                                       use_tree=use_tree,
                                       approx_mis=cfg.nee_mis == "approx")
                if di_sample is not None:
                    # bounce 0: DI reservoir replaces the fresh tree/CDF
                    # sample; pdf encodes the unbiased contribution weight
                    # (contrib = f * Le * cos_s * W * cos_l / d2) and the
                    # lane is flagged delta (full weight, no MIS split)
                    di_to = di_sample["pos"] - p
                    di_d2 = jnp.maximum(dot(di_to, di_to), 1e-12)
                    di_dist = jnp.sqrt(di_d2)
                    di_wi = di_to / di_dist[..., None]
                    di_cos_l = -dot(di_wi, di_sample["ln"])
                    di_ok = (di_sample["W"] > 0.0) & (di_cos_l > 1e-6)
                    di_pdf = di_d2 / jnp.maximum(
                        di_sample["W"] * di_cos_l, 1e-12)
                    use_di = (b == 0)
                    ls = LightSample(
                        pos=jnp.where(use_di, di_sample["pos"], ls.pos),
                        normal=jnp.where(use_di, di_sample["ln"],
                                         ls.normal),
                        radiance=jnp.where(use_di, di_sample["rad"],
                                           ls.radiance),
                        pdf_sa=jnp.where(use_di, di_pdf, ls.pdf_sa),
                        valid=jnp.where(use_di, di_ok, ls.valid),
                        pdf_w=jnp.where(use_di, di_pdf, ls.pdf_w))
                to_l = ls.pos - p
                d_m = jnp.linalg.norm(to_l, axis=-1)
                sel = g_pick == gi
                wi_l = jnp.where(sel[..., None],
                                 to_l / jnp.maximum(d_m, 1e-12)[..., None],
                                 wi_l)
                dist_l = jnp.where(sel, d_m, dist_l)
                rad_l = jnp.where(sel[..., None], ls.radiance, rad_l)
                pdf_l = jnp.where(sel, ls.pdf_sa * p_group, pdf_l)
                pdfw_l = jnp.where(sel, ls.pdf_w * p_group, pdfw_l)
                valid_l = jnp.where(sel, ls.valid, valid_l)
                if di_sample is not None:
                    delta_l = jnp.where(sel & (b == 0), True, delta_l)
                gi += 1
            if has_env_tex:
                from truetrace_tpu.kernels.envmap import env_sample
                d_env, p_env, r_env = env_sample(scene.env, u_l2)
                sel = g_pick == gi
                wi_l = jnp.where(sel[..., None], d_env, wi_l)
                dist_l = jnp.where(sel, jnp.float32(1e30), dist_l)
                rad_l = jnp.where(sel[..., None], r_env, rad_l)
                pdf_l = jnp.where(sel, p_env * p_group, pdf_l)
                pdfw_l = jnp.where(sel, p_env * p_group, pdfw_l)
                valid_l = jnp.where(sel, p_env > 1e-12, valid_l)
                gi += 1
            if has_analytic:
                from truetrace_tpu.integrate.lights import (
                    sample_analytic, sample_analytic_ris)
                K_an = scene.lights.position.shape[0]
                if 0 < cfg.analytic_ris < K_an:
                    uc, uk = [], []
                    for c in range(cfg.analytic_ris):
                        u2c = smp2(pixel, sid, jnp.uint32(
                            rng.path_dim(b, rng.DIM_LIGHT_SELECT))
                            + jnp.uint32(0x9E3779 * (c + 1)))
                        uc.append(u2c[..., 0])
                        uk.append(u2c[..., 1])
                    al = sample_analytic_ris(
                        scene.lights, p, jnp.stack(uc, -1),
                        jnp.stack(uk, -1), u_l2)
                else:
                    al = sample_analytic(scene.lights, p, u_resc, u_l2)
                sel = g_pick == gi
                wi_l = jnp.where(sel[..., None], al.wi, wi_l)
                dist_l = jnp.where(sel, al.dist, dist_l)
                # delta lights: fold selection pmf into radiance (pdf_sa=1)
                rad_l = jnp.where(sel[..., None],
                                  al.radiance / al.pmf[..., None], rad_l)
                pdf_l = jnp.where(sel, al.pdf_sa * p_group, pdf_l)
                pdfw_l = jnp.where(sel, al.pdf_sa * p_group, pdfw_l)
                delta_l = jnp.where(sel, al.is_delta, delta_l)
                valid_l = jnp.where(sel, al.valid, valid_l)
                gi += 1

            f_l, pdf_b = bsdf_eval(mat, sn, wo, wi_l)
            cos_s = jnp.maximum(dot(wi_l, sn), 0.0)
            cand = hit_ok & valid_l & (cos_s > 0.0) & (pdf_l > 1e-12) \
                & (jnp.max(f_l, axis=-1) > 0.0) & ~is_emis
            # unshadowed contribution first: it gates the shadow ray (NEE
            # RR) and is what the miss adds
            w_mis = jnp.where(delta_l, 1.0, power_heuristic(pdfw_l, pdf_b))
            contrib = finite_or_zero(
                throughput * f_l * rad_l
                * (cos_s * w_mis / jnp.maximum(pdf_l, 1e-12))[..., None])
            if cfg.nee_rr > 0.0:
                # roulette away low-value shadow rays, reweight survivors
                u_srr = smp1(
                    pixel, sid, jnp.uint32(rng.path_dim(b, rng.DIM_NEE_RR)))
                p_s = jnp.clip(luminance(contrib) / cfg.nee_rr, 0.05, 1.0)
                cand = cand & (u_srr < p_s)
                contrib = contrib / p_s[..., None]
            sro = p + gn * SHADOW_EPS
            n_shadow = n_shadow + jnp.sum(cand.astype(jnp.float32))
            # non-candidate lanes shoot zero-length shadow rays: the
            # traversal cascade retires them in its first stage
            if fused:
                # defer: stash the shadow ray; the NEXT bounce's mixed
                # trace resolves it (post-loop flush for the last bounce)
                s_ro, s_rd = sro, wi_l
                s_tmax = jnp.where(cand, dist_l - 2.0 * SHADOW_EPS, 0.0)
                s_contrib = jnp.where(cand[..., None], contrib, 0.0)
            elif cfg.debug_nee == "noshadow":
                trans = jnp.ones((R, 3), jnp.float32)
                radiance = radiance + jnp.where(cand[..., None],
                                                contrib * trans, 0.0)
            else:
                s_tm = jnp.where(cand, dist_l - 2.0 * SHADOW_EPS, 0.0)
                if cfg.nee_sort:
                    order = jnp.argsort(s_tm)
                    inv = jnp.argsort(order)
                    trans = jax.lax.stop_gradient(_transmission(
                        scene, sro[order], wi_l[order], s_tm[order],
                        cfg))[inv]
                else:
                    trans = jax.lax.stop_gradient(_transmission(
                        scene, sro, wi_l, s_tm, cfg))
                radiance = radiance + jnp.where(cand[..., None],
                                                contrib * trans, 0.0)

        # ---- BSDF sample / continue
        u_lobe = smp1(pixel, sid,
                      jnp.uint32(rng.path_dim(b, rng.DIM_BSDF_LOBE)))
        u_dir = smp2(pixel, sid,
                     jnp.uint32(rng.path_dim(b, rng.DIM_BSDF_SAMPLE)))
        wi, f, pdf, lobe = bsdf_sample(mat, sn, wo, u_lobe, u_dir)
        # detached-sampling estimator: the sampled direction and its pdf are
        # treated as constants in the backward pass; parameter gradients
        # flow through f (and NEE/emission terms) only. This keeps gradients
        # well-defined w.r.t. roughness etc. without differentiating the
        # traversal (diff/ replays the same decisions).
        wi = jax.lax.stop_gradient(wi)
        pdf = jax.lax.stop_gradient(pdf)
        cos_i = jnp.abs(dot(wi, sn))
        ok = hit_ok & (pdf > 1e-9)
        new_tp = throughput * f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None]
        new_tp = finite_or_zero(new_tp)

        # russian roulette
        u_rr = smp1(pixel, sid,
                    jnp.uint32(rng.path_dim(b, rng.DIM_RR)))
        q = jnp.clip(jnp.max(new_tp, axis=-1), 0.05, 1.0)
        do_rr = b >= cfg.rr_start
        survive = jnp.where(do_rr, u_rr < q, True)
        new_tp = jnp.where(do_rr,
                           new_tp / jnp.maximum(q, 1e-9)[..., None], new_tp)

        alive = (ok & survive & (jnp.max(new_tp, axis=-1) > 0.0)) | passthru
        cone_w = jnp.where(hit_ok, cone_w + hit.t * cone_s, cone_w)
        cone_s = jnp.where(hit_ok, cone_s + 0.25 * mat.roughness ** 2,
                           cone_s)
        side = jnp.where(dot(wi, gn) >= 0.0, 1.0, -1.0)
        # cutout pass-through lanes keep flying unperturbed
        ro = jnp.where(passthru[..., None], p + rd * SHADOW_EPS,
                       p + gn * (SHADOW_EPS * side[..., None]))
        rd = jnp.where(passthru[..., None], rd, wi)
        throughput = jnp.where(passthru[..., None], throughput,
                               jnp.where(alive[..., None], new_tp,
                                         throughput))
        prev_pdf = jnp.where(passthru, prev_pdf,
                             jnp.where(alive, pdf, 0.0))
        sn = jnp.where(passthru[..., None], prev_n, sn)
        # ---- medium-stack update: a sampled direction that CROSSES the
        # surface (dot(wi, gn) < 0, gn face-forwarded to the source side)
        # of a non-thin transmissive material enters (front face: push
        # its id) or leaves (back face: remove the TOPMOST entry matching
        # the id — id-matched removal tolerates interleaved boundaries
        # and makes stray backfaces of never-entered open meshes no-ops)
        if scene.has_media:
            crossed = (alive & ~passthru & transmissive
                       & (dot(wi, gn) < 0.0))
            push_evt = crossed & front
            pop_evt = crossed & ~front
            slots = jnp.arange(MED_STACK, dtype=jnp.int32)[None, :]
            top = jnp.clip(m_sp, 0, MED_STACK - 1)[:, None]
            m_ids = jnp.where(push_evt[:, None] & (slots == top),
                              mid[:, None], m_ids)
            match = (m_ids == mid[:, None]) & (slots < m_sp[:, None])
            has_match = jnp.any(match, axis=1)
            top_match = (MED_STACK - 1
                         - jnp.argmax(match[:, ::-1].astype(jnp.int32),
                                      axis=1))
            do_pop = pop_evt & has_match
            shifted = jnp.concatenate(
                [m_ids[:, 1:], jnp.full((R, 1), -1, jnp.int32)], axis=1)
            m_ids = jnp.where(
                do_pop[:, None] & (slots >= top_match[:, None]),
                shifted, m_ids)
            m_sp = jnp.clip(m_sp + push_evt.astype(jnp.int32)
                            - do_pop.astype(jnp.int32), 0, MED_STACK)
        if cfg.restir_capture:
            # snapshot direct radiance + first-bounce throughput factor
            r_direct = jnp.where(first, radiance, r_direct)
            tp1 = f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None]
            r_tp1 = jnp.where(first & alive[..., None],
                              finite_or_zero(tp1), r_tp1)
            r_pdf1 = jnp.where(first, jnp.where(alive, pdf, 0.0), r_pdf1)
        return (ro, rd, radiance, throughput, alive, prev_pdf, sn,
                g_albedo, g_normal, g_depth, cone_w, cone_s,
                r_direct, r_x2, r_n2, r_tp1, r_pdf1, r_valid, r_x1, r_mat1,
                c_w0, c_w1, c_prefix, c_tp, c_live,
                n_trace, n_shadow, r_emit0, n_cq, n_ch,
                s_ro, s_rd, s_tmax, s_contrib, m_ids, m_sp, g_inst)

    n_cq = jnp.zeros((), jnp.float32)   # cache queries attempted
    n_ch = jnp.zeros((), jnp.float32)   # cache hits taken
    state = (ro, rd, radiance, throughput, alive, prev_pdf, prev_n,
             g_albedo, g_normal, g_depth, cone_w, cone_s,
             r_direct, r_x2, r_n2, r_tp1, r_pdf1, r_valid, r_x1, r_mat1,
             c_w0, c_w1, c_prefix, c_tp, c_live,
             n_trace, n_shadow, r_emit0, n_cq, n_ch,
             s_ro, s_rd, s_tmax, s_contrib,
             jnp.full((R, MED_STACK), -1, jnp.int32),   # medium ids
             jnp.zeros((R,), jnp.int32),                # medium depth
             jnp.full((R,), -1, jnp.int32))   # primary-hit instance id
    body = jax.checkpoint(bounce) if cfg.remat else bounce
    state = jax.lax.fori_loop(0, cfg.bounces, body, state)
    radiance = state[2]
    direct = state[12]
    if fused:
        # flush the LAST bounce's pending shadow rays (one extra any-hit
        # dispatch per frame instead of one per bounce)
        s_ro_f, s_rd_f, s_tmax_f, s_contrib_f = state[30:34]
        blocked = jax.lax.stop_gradient(
            _occluded_mesh(scene, s_ro_f, s_rd_f, s_tmax_f, cfg))
        s_vis = (~blocked) & (s_tmax_f > 0.0)
        radiance = radiance + jnp.where(s_vis[..., None], s_contrib_f, 0.0)
        if cfg.restir_capture and cfg.bounces == 1:
            direct = radiance   # the b==1 snapshot never ran
    stats = {"n_trace": state[25], "n_shadow": state[26],
             "albedo": state[7], "normal": state[8], "depth": state[9],
             "emitted0": state[27], "inst": state[36],
             "cache_hit_rate": state[29] / jnp.maximum(state[28], 1.0)}
    if cfg.restir_capture:
        stats.update({
            "direct": direct, "x2": state[13], "n2": state[14],
            "tp1": state[15], "pdf1": state[16],
            "cand_valid": state[17], "x1": state[18], "mat1": state[19],
            "indirect": radiance - direct,
        })
    if cfg.cache_capture:
        stats.update({
            "cache_w0": state[20], "cache_w1": state[21],
            "cache_prefix": state[22], "cache_tp": state[23],
            "cache_live": state[24],
        })
    return radiance, stats


@partial(jax.jit, static_argnames=("cfg", "spp"))
def render(scene: Scene, cam: Camera, cfg: RenderConfig, spp: int = 16,
           base_sample: int = 0) -> jnp.ndarray:
    """Render [H, W, 3] averaging `spp` samples per pixel."""
    def body(s, acc):
        return acc + render_sample(scene, cam, cfg, base_sample + s)
    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((cfg.height * cfg.width, 3), jnp.float32))
    img = acc / spp
    return img.reshape(cfg.height, cfg.width, 3)
