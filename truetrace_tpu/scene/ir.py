"""Scene intermediate representation: a pytree of arrays.

TPU-first analogue of the reference's aggregated GPU mega-buffers
(AssetManager.cs:986-1227 builds one global triangle / node / material /
light-tri buffer with per-mesh offsets; layouts at SURVEY.md section 2.4).
Differences by design:

* SoA float32 arrays instead of byte-packed structs — XLA lays these out and
  fuses gathers; octahedral/RGBE packing is applied only where bandwidth wins
  (normals/tangents can be stored packed as uint32 when `packed=True`).
* The whole scene is a single pytree, so it can be donated, sharded
  (replicated across the mesh) and threaded through `lax` loops untouched.
* All sizes are static after build — required for jit.

Coordinate convention: right-handed, y-up, units = meters. Camera looks down
-z in view space (standard GL-style), matching the maths in scene/camera.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class MaterialTable:
    """Disney BSDF parameter table, one row per material.

    Field set mirrors the reference's MaterialData (CommonVars.cs:94-137,
    GPU view CommonData.cginc:215-257) minus the texture-atlas rects (textures
    are indexed separately via `tex_*` index columns; -1 = none).
    """
    base_color: jnp.ndarray       # [M,3]
    emission: jnp.ndarray         # [M,3]  (radiance; reference: EmissionColor * emission)
    roughness: jnp.ndarray        # [M]
    metallic: jnp.ndarray         # [M]
    spec_trans: jnp.ndarray       # [M]   specular transmission (glass)
    ior: jnp.ndarray              # [M]
    specular: jnp.ndarray         # [M]   specular level (0.5 -> F0 0.04 scale)
    spec_tint: jnp.ndarray        # [M]
    sheen: jnp.ndarray            # [M]
    sheen_tint: jnp.ndarray       # [M]
    clearcoat: jnp.ndarray        # [M]
    clearcoat_gloss: jnp.ndarray  # [M]
    anisotropic: jnp.ndarray      # [M]
    subsurface: jnp.ndarray       # [M]   flatness / thin-SSS weight
    diff_trans: jnp.ndarray       # [M]   diffuse transmission (thin)
    thin: jnp.ndarray             # [M]   0/1 thin-surface flag
    alpha: jnp.ndarray            # [M]   cutout opacity
    tex_albedo: jnp.ndarray       # [M] int32 atlas slot, -1 = none
    tex_normal: jnp.ndarray       # [M]
    tex_emission: jnp.ndarray     # [M]
    tex_rough_metal: jnp.ndarray  # [M] combined glTF metallicRoughness
    tex_matcap: jnp.ndarray       # [M] view-normal-indexed matcap
                                  # (reference calcFinalColor matcap path,
                                  # RayTracingShader.compute:129-159)
    # separate single-channel slots (reference's 8 bindings,
    # CommonVars.cs:96-103: MetallicTex/RoughnessTex/AlphaTex/MatCapMask);
    # channel 0 of the RGBA atlas texel is the value
    tex_metallic: jnp.ndarray     # [M] replaces metallic when >= 0
    tex_roughness: jnp.ndarray    # [M] replaces roughness when >= 0
    tex_alpha: jnp.ndarray        # [M] multiplies cutout alpha when >= 0
    tex_matcap_mask: jnp.ndarray  # [M] lerp weight for the matcap blend
    rough_tex_invert: jnp.ndarray  # [M] 0/1: roughness tex is smoothness
                                   # (reference InvertSmoothnessTexture tag)

    # per-material UV transform (reference AlbedoTextureScale /
    # SecondaryTextureScale / Rotation, CommonVars.cs:123-136, applied in
    # AlignUV CommonData.cginc:569-591): uv' = rot(uv * scale + offset).
    # uv_scale feeds albedo/emission/matcap(mask); uv2_scale replaces its
    # scale.xy for the normal/metallic/roughness/alpha fetches.
    uv_scale: jnp.ndarray         # [M,4] (sx, sy, ox, oy)
    uv2_scale: jnp.ndarray        # [M,2] secondary (sx, sy)
    uv_rot: jnp.ndarray           # [M] radians about uv (0.5, 0.5)
    normal_strength: jnp.ndarray  # [M] normal-map intensity (1 = full;
                                  # reference NormalStrength CommonVars.cs:127,
                                  # RayTracingShader.compute:134)

    # texture adjustment pipeline applied to the albedo fetch (reference
    # kernel_shade hue/brightness/saturation/contrast/blend,
    # RayTracingShader.compute:630-649) + roughness/metallic remap ranges
    # (RayTracingShader.compute:654-662)
    hue: jnp.ndarray              # [M] hue rotation (degrees)
    brightness: jnp.ndarray       # [M] multiplier (1 = neutral)
    saturation: jnp.ndarray       # [M] 1 = neutral, 0 = grayscale
    contrast: jnp.ndarray         # [M] 1 = neutral (pivot 0.5)
    blend_color: jnp.ndarray      # [M,3]
    blend_factor: jnp.ndarray     # [M] lerp(albedo, blend_color, f)
    rough_remap: jnp.ndarray      # [M,2] (lo,hi); (0,1) = identity
    metal_remap: jnp.ndarray      # [M,2]
    # Beer-Lambert interior scatter distance for glass (reference
    # scatterDistance, Materials.cginc:350 CalculateExtinction — 0 is
    # treated as 1): extinction sigma = 1 / (s(1-base_color) * dist)
    scatter_dist: jnp.ndarray     # [M]
    # dedicated glass interior apparent color (reference
    # TransmittanceColor, CommonVars.cs:109, fed to CalculateExtinction
    # at RayTracingShader.compute:640). Any component < 0 = unauthored:
    # derive from 1 - base_color so surface tint doubles as absorption.
    transmit_color: jnp.ndarray   # [M,3]

    @staticmethod
    def make(n: int) -> "MaterialTable":
        f = lambda *s: jnp.zeros((n, *s), jnp.float32)
        i = lambda: jnp.full((n,), -1, jnp.int32)
        remap01 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], jnp.float32),
                                   (n, 2))
        return MaterialTable(
            base_color=jnp.ones((n, 3), jnp.float32) * 0.8,
            emission=f(3), roughness=jnp.ones((n,), jnp.float32) * 0.5,
            metallic=f(), spec_trans=f(),
            ior=jnp.ones((n,), jnp.float32) * 1.5,
            specular=jnp.ones((n,), jnp.float32) * 0.5,
            spec_tint=f(), sheen=f(), sheen_tint=jnp.ones((n,), jnp.float32) * 0.5,
            clearcoat=f(), clearcoat_gloss=jnp.ones((n,), jnp.float32) * 0.97,
            anisotropic=f(), subsurface=f(), diff_trans=f(), thin=f(),
            alpha=jnp.ones((n,), jnp.float32),
            hue=f(), brightness=jnp.ones((n,), jnp.float32),
            saturation=jnp.ones((n,), jnp.float32),
            contrast=jnp.ones((n,), jnp.float32),
            blend_color=f(3), blend_factor=f(),
            rough_remap=remap01, metal_remap=remap01, scatter_dist=f(),
            transmit_color=jnp.full((n, 3), -1.0, jnp.float32),
            tex_albedo=i(), tex_normal=i(), tex_emission=i(),
            tex_rough_metal=i(), tex_matcap=i(),
            tex_metallic=i(), tex_roughness=i(), tex_alpha=i(),
            tex_matcap_mask=i(), rough_tex_invert=f(),
            uv_scale=jnp.broadcast_to(
                jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32), (n, 4)),
            uv2_scale=jnp.ones((n, 2), jnp.float32),
            uv_rot=f(),
            normal_strength=jnp.ones((n,), jnp.float32),
        )

    def n_materials(self) -> int:
        return self.roughness.shape[0]


@struct.dataclass
class MeshTable:
    """Two-level structure: one row per mesh *instance* (TLAS leaf).

    Counterpart of MyMeshDataCompacted (CommonVars.cs:246-255): world<->local
    transforms plus offsets into the aggregated triangle / CWBVH-node arrays.
    Instancing = several rows sharing the same node/tri offsets.
    """
    w2l: jnp.ndarray          # [I,4,4] world->local (row-vector convention p @ M)
    l2w: jnp.ndarray          # [I,4,4]
    node_offset: jnp.ndarray  # [I] int32 into the aggregated CWBVH node array
    tri_offset: jnp.ndarray   # [I] int32 into the aggregated triangle arrays
    light_node_offset: jnp.ndarray  # [I] int32 into light-BVH nodes (-1 none)
    aabb: jnp.ndarray         # [I,2,3] world-space bounds (refit input)


@struct.dataclass
class LightTris:
    """Emissive-triangle list (reference LightTriData, CommonVars.cs:258-264).

    `tri_index` points back into the global triangle arrays so radiance /
    geometry are fetched rather than duplicated."""
    tri_index: jnp.ndarray    # [L] int32 global tri id
    power: jnp.ndarray        # [L] scalar emitted power (for CDF / RIS)
    cdf: jnp.ndarray          # [L] inclusive normalized CDF over power
    pmf: jnp.ndarray          # [L] selection probability (cdf diff)
    tri_to_light: jnp.ndarray # [T] int32 inverse map, -1 = not emissive
    # packed per-light sample rows [L,16]: p0(0:3) e1(3:6) e2(6:9)
    # unit-gn(9:12) area(12) pmf(13) mat_id(14, exact float) pad(15).
    # Emission is NOT baked in — it is gathered live from the material
    # table via mat_id so edits and gradients stay live
    # (scene/mesh.py pack_light_rows builds these). ONE cache-hot gather
    # replaces the 6 scattered big-table gathers the NEE sample otherwise
    # pays per lane per bounce — measured 50 ms of a 512^2x4 frame
    # (round-4 NEE probe). None on legacy pytrees.
    rows: Optional[jnp.ndarray] = None


@struct.dataclass
class AnalyticLights:
    """Unity-style analytic lights (RayTracingLights.cs LightData, 48B):
    type 0=point 1=directional 2=spot 3=quad(area) 4=disk(area)."""
    position: jnp.ndarray     # [K,3]
    direction: jnp.ndarray    # [K,3]
    radiance: jnp.ndarray     # [K,3]
    ltype: jnp.ndarray        # [K] int32
    spot_cos: jnp.ndarray     # [K,2] inner/outer cos for spot
    extent: jnp.ndarray       # [K,2] quad half-extents / disk radius
    softness: jnp.ndarray     # [K] penumbra radius for point/spot/dir
                              # (reference LightData.Softness,
                              # RayTracingShader.compute:361-375)
    z_rot: Optional[Any] = None  # [K] area-light in-plane rotation
                              # (reference ZAxisRotation); None = 0

    @staticmethod
    def none() -> "AnalyticLights":
        z3 = jnp.zeros((0, 3), jnp.float32)
        z2 = jnp.zeros((0, 2), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        return AnalyticLights(z3, z3, z3, jnp.zeros((0,), jnp.int32), z2,
                              z2, z1, z1)


@struct.dataclass
class EnvMap:
    """Equirect environment with 2-D CDF importance tables (built by
    build/env_cdf.py; reference: CDFCreator.compute + SampleLI
    CommonData.cginc:1437-1464)."""
    image: jnp.ndarray        # [H,W,3] radiance
    cdf_x: jnp.ndarray        # [H,W]   per-row inclusive CDF (conditional)
    cdf_y: jnp.ndarray        # [H]     marginal CDF (sin-theta weighted)
    total: jnp.ndarray        # []      integral for pdf normalization
    rotation: jnp.ndarray     # []      azimuth rotation (radians)
    intensity: jnp.ndarray    # []      scale

    @staticmethod
    def constant(rgb=(0.0, 0.0, 0.0)) -> "EnvMap":
        img = jnp.broadcast_to(jnp.asarray(rgb, jnp.float32), (1, 1, 3))
        return EnvMap(image=img,
                      cdf_x=jnp.ones((1, 1), jnp.float32),
                      cdf_y=jnp.ones((1,), jnp.float32),
                      total=jnp.asarray(float(np.mean(rgb)), jnp.float32),
                      rotation=jnp.float32(0.0), intensity=jnp.float32(1.0))


@struct.dataclass
class Scene:
    """The aggregated, render-ready scene. Every array is device-resident and
    replicated across the device mesh (scene data is read-only at render
    time; framebuffers/reservoirs are the sharded state).

    Triangle layout follows the reference's CudaTriangle edge form
    (CommonVars.cs:437-456): pos0 + edge1 + edge2, per-vertex shading normals
    and UVs, material id. BVH arrays are attached by the builders
    (build/bvh2.py, build/cwbvh.py) — `bvh2_*` is the always-available
    reference traversal structure; `cw_*` is the CWBVH used by the Pallas
    fast path.
    """
    # geometry (aggregated across meshes; local/object space when mesh_table
    # has non-identity transforms, world space in the single-BLAS case)
    tri_p0: jnp.ndarray       # [T,3]
    tri_e1: jnp.ndarray       # [T,3]
    tri_e2: jnp.ndarray       # [T,3]
    tri_n: jnp.ndarray        # [T,3,3] shading normals (v0,v1,v2)
    tri_uv: jnp.ndarray       # [T,3,2]
    tri_tan: jnp.ndarray      # [T,3] per-face UV tangent (normal mapping)
    tri_mat: jnp.ndarray      # [T] int32 material id

    # BVH2 (flat, aggregated; see build/bvh2.py for node layout)
    bvh2_box: jnp.ndarray     # [N,2,3] node bounds
    bvh2_left: jnp.ndarray    # [N] int32: internal -> left child (right=left+1); leaf -> first tri
    bvh2_count: jnp.ndarray   # [N] int32: 0 for internal, #tris for leaf

    # CWBVH (8-wide compressed; see build/cwbvh.py). uint32 rows, one node =
    # 20 words (80 B) exactly like the reference GPU node
    # (CommonVars.cs:414-434) so a node fetch is one contiguous gather.
    cw_nodes: jnp.ndarray     # [C,20] uint32 (word 5 = base leaf row)
    cw_tri_index: jnp.ndarray # [T] int32 CWBVH leaf order -> global tri id
    cw_leaf_rows: jnp.ndarray # [L,30] f32 per-leaf rows: 3 packed tris +
                              # 3 tri-id words (kernels/cwbvh_wavefront.py
                              # pack_leaf_rows)
    woop: jnp.ndarray           # [T,24] Woop unit-tri transforms for the
                                # MXU brute-force path (empty if disabled)

    # texture atlas (scene/atlas.py; empty = no textures)
    atlas: jnp.ndarray        # [AHm,AW,4] f32 (mip chain stacked below L0)
    atlas_rects: jnp.ndarray  # [NT,4] i32 (x,y,w,h in level-0 texels)
    atlas_level_y: jnp.ndarray  # [M] i32 mip-level row origins
    tri_lod: jnp.ndarray      # [T] base texture LOD per tri (texel density;
                              # ray-cone LOD adds log2(footprint))

    materials: MaterialTable
    mesh_table: Optional[MeshTable]
    light_tris: LightTris
    lights: AnalyticLights
    env: EnvMap

    # light BVH (PBRT-4 SAOH; build/lightbvh.py), optional
    lbvh_nodes: jnp.ndarray   # [LN,12] f32: min(3) max(3) axis(3) cos_o _ phi
    lbvh_info: jnp.ndarray    # [LN,2] i32: leaf (first,count>0); internal (left,-right)
    lbvh_prim: jnp.ndarray    # [L] i32 leaf slot -> light index
    lbvh_trail: jnp.ndarray   # [L] u32 root->leaf bit trail per light index
    lbvh_pairs: jnp.ndarray   # [Ni,26] descent pair rows (build_pairs) —
                              # one gather per descent step
    lbvh_pair_children: jnp.ndarray  # [Ni,2] child node ids (refit)

    # heightfield terrain (scene/terrain.py; reference TerrainObject +
    # kernel_heightmap), optional
    terrain: Optional[Any] = None

    # per-tri shadow transmittance tint [T,3] — built only when the scene
    # has cutout-alpha or spec_trans materials (None = all-opaque fast
    # path). Reference: stained-glass / cutout any-hit transport,
    # CommonData.cginc:593-634
    tri_shadow: Optional[Any] = None

    # instanced-scene extras (scene/instances.py compile_scene_instanced;
    # consumed by the traversal="tlas" path — reference two-level
    # kernel_trace, IntersectionKernels.compute:155-252, instance table
    # AssetManager.cs:1714-1750). Triangle arrays hold LOCAL-space rows
    # for the shared BLASes; emissive instance triangles are additionally
    # materialized in WORLD space and appended (NEE samples those rows).
    inst_rows: Optional[Any] = None          # [I,30] TLAS instance rows
    inst_l2w: Optional[Any] = None           # [I,3,4] local->world rows
    inst_em_rank: Optional[Any] = None       # [T] emissive rank in source
    inst_light_offset: Optional[Any] = None  # [I] light-list base (-1)

    # light-BVH cut (build/lightbvh.py build_cut): dense gather-free light
    # selection over a <=128-entry cut of subtree roots; the per-step
    # dependent-gather descent only runs BELOW the cut. None when the
    # scene has no light BVH.
    lcut_bounds: Optional[Any] = None        # [M,12] f32 cut node rows
    lcut_link: Optional[Any] = None          # [M] i32 pair idx / -(prim+1)
    lcut_node_ids: Optional[Any] = None      # [M] i32 (refit refresh)
    lcut_of_light: Optional[Any] = None      # [L] i32 light -> cut entry
    lcut_skip: Optional[Any] = None          # [L] i32 trail bits above cut

    # exact CWBVH depth bound from the builder (+1 margin): sizes the
    # wavefront traversal's shift-register stack planes, whose per-
    # iteration shuffle cost scales with this (ablation in BASELINE.md).
    # Static (compile-time) — a scene rebuild with a different depth
    # retraces, a refit (same topology) does not.
    cw_stack: int = struct.field(pytree_node=False, default=16)
    # STATIC: any non-thin transmissive material present? False lets the
    # integrator compile out the whole nested-dielectric medium-stack
    # block (measured ~20 ms/bounce at 512^2 when left in — round 4).
    # Default True = safe for hand-built scenes.
    has_media: bool = struct.field(pytree_node=False, default=True)

    def n_tris(self) -> int:
        return self.tri_p0.shape[0]


@struct.dataclass
class Camera:
    """Pinhole + thin-lens camera (reference CreateCameraRay,
    CommonData.cginc:511-554)."""
    c2w: jnp.ndarray          # [4,4] camera->world
    fov_y: jnp.ndarray        # [] vertical fov (radians)
    aperture: jnp.ndarray     # [] lens radius (0 = pinhole)
    focus_dist: jnp.ndarray   # []

    @staticmethod
    def look_at(eye, target, up=(0.0, 1.0, 0.0), fov_y_deg=40.0,
                aperture=0.0, focus_dist=1.0) -> "Camera":
        eye = np.asarray(eye, np.float32)
        fwd = np.asarray(target, np.float32) - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, np.asarray(up, np.float32))
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        m = np.eye(4, dtype=np.float32)
        m[0, :3] = right
        m[1, :3] = true_up
        m[2, :3] = -fwd          # camera looks down -z
        m[3, :3] = eye
        return Camera(c2w=jnp.asarray(m),
                      fov_y=jnp.float32(np.deg2rad(fov_y_deg)),
                      aperture=jnp.float32(aperture),
                      focus_dist=jnp.float32(focus_dist))


def camera_rays(cam: Camera, width: int, height: int, pixel_id, jitter,
                lens_u=None):
    """Generate primary rays for flat pixel ids.

    pixel_id: [R] int32 (y*width+x); jitter: [R,2] U[0,1); lens_u: [R,2] for
    DoF. Returns (ro [R,3], rd [R,3]).
    """
    x = (pixel_id % width).astype(jnp.float32) + jitter[..., 0]
    y = (pixel_id // width).astype(jnp.float32) + jitter[..., 1]
    # NDC in [-1,1], y up
    ndc_x = (x / width) * 2.0 - 1.0
    ndc_y = 1.0 - (y / height) * 2.0
    tan_half = jnp.tan(cam.fov_y * 0.5)
    aspect = width / height
    vx = ndc_x * tan_half * aspect
    vy = ndc_y * tan_half
    d_cam = jnp.stack([vx, vy, -jnp.ones_like(vx)], axis=-1)

    right = cam.c2w[0, :3]
    up = cam.c2w[1, :3]
    back = cam.c2w[2, :3]
    eye = cam.c2w[3, :3]
    rd = (d_cam[..., 0:1] * right + d_cam[..., 1:2] * up
          - d_cam[..., 2:3] * (-back))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(eye, rd.shape)

    if lens_u is not None:
        # thin-lens: offset origin on lens disk, refocus at focus_dist
        r = jnp.sqrt(lens_u[..., 0]) * cam.aperture
        phi = 2.0 * jnp.pi * lens_u[..., 1]
        off = (r * jnp.cos(phi))[..., None] * right + \
              (r * jnp.sin(phi))[..., None] * up
        focus_p = ro + rd * (cam.focus_dist /
                             jnp.maximum(-jnp.sum(rd * back, -1, keepdims=True), 1e-6))
        ro = ro + off
        rd = focus_p - ro
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd
