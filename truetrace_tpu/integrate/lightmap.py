"""Lightmap baking: irradiance baked into a UV-space texture.

Counterpart of the reference's lightmap generators
(RayGenKernels.compute `LightMapGen`/`LightMapGen2` :171-234, gated by the
TTLightMapping define): instead of rasterizing lightmap-UV triangles on
the GPU, texels are generated host-side by a tiny conservative UV
rasterizer, then shaded by the same wavefront integrator used for camera
rays — each texel spawns cosine-hemisphere rays from its surface point.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.core import rng
from truetrace_tpu.core.math import sample_cosine_hemisphere, to_world


class LightmapTexels(NamedTuple):
    pos: jnp.ndarray       # [N,3] world position of each covered texel
    normal: jnp.ndarray    # [N,3]
    texel_xy: np.ndarray   # [N,2] int32 destination coords
    size: tuple            # (H, W)


def rasterize_texels(positions: np.ndarray, indices: np.ndarray,
                     uvs: np.ndarray, size: int = 64,
                     normals: np.ndarray = None) -> LightmapTexels:
    """Conservative UV rasterization on the host: for every lightmap texel
    covered by a triangle, emit its interpolated world position/normal."""
    H = W = size
    tex_pos = {}
    v_uv = uvs[indices]            # [F,3,2]
    v_p = positions[indices]       # [F,3,3]
    if normals is not None:
        v_n = normals[indices]
    else:
        gn = np.cross(v_p[:, 1] - v_p[:, 0], v_p[:, 2] - v_p[:, 0])
        gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        v_n = np.repeat(gn[:, None, :], 3, axis=1)

    for f in range(indices.shape[0]):
        uv = v_uv[f] * [W, H]
        lo = np.floor(uv.min(0)).astype(int)
        hi = np.ceil(uv.max(0)).astype(int)
        for y in range(max(lo[1], 0), min(hi[1] + 1, H)):
            for x in range(max(lo[0], 0), min(hi[0] + 1, W)):
                p = np.array([x + 0.5, y + 0.5])
                # barycentric in UV space
                a, b, c = uv
                den = ((b[1] - c[1]) * (a[0] - c[0])
                       + (c[0] - b[0]) * (a[1] - c[1]))
                if abs(den) < 1e-12:
                    continue
                w0 = ((b[1] - c[1]) * (p[0] - c[0])
                      + (c[0] - b[0]) * (p[1] - c[1])) / den
                w1 = ((c[1] - a[1]) * (p[0] - c[0])
                      + (a[0] - c[0]) * (p[1] - c[1])) / den
                w2 = 1.0 - w0 - w1
                if w0 < -0.15 or w1 < -0.15 or w2 < -0.15:
                    continue
                wp = w0 * v_p[f, 0] + w1 * v_p[f, 1] + w2 * v_p[f, 2]
                wn = w0 * v_n[f, 0] + w1 * v_n[f, 1] + w2 * v_n[f, 2]
                tex_pos[(x, y)] = (wp, wn / max(np.linalg.norm(wn), 1e-9))

    xy = np.array(sorted(tex_pos.keys()), np.int32).reshape(-1, 2)
    pos = np.stack([tex_pos[tuple(k)][0] for k in xy])
    nrm = np.stack([tex_pos[tuple(k)][1] for k in xy])
    return LightmapTexels(pos=jnp.asarray(pos.astype(np.float32)),
                          normal=jnp.asarray(nrm.astype(np.float32)),
                          texel_xy=xy, size=(H, W))


def bake_lightmap(scene, texels: LightmapTexels, cfg, spp: int = 32,
                  offset: float = 1e-3) -> np.ndarray:
    """Bake incident irradiance E (W/m^2-ish, cosine-weighted incoming
    radiance integral) per texel. Returns [H,W,3] (zeros where uncovered).

    Each sample shoots one cosine-weighted ray and evaluates the full
    path-traced radiance along it — E = pi * mean(L_cos_sampled)."""
    from truetrace_tpu.integrate.pathtrace import render_sample_with_stats
    from truetrace_tpu.scene.ir import Camera

    N = texels.pos.shape[0]
    ids = jnp.arange(N, dtype=jnp.uint32)
    acc = jnp.zeros((N, 3), jnp.float32)
    for s in range(spp):
        u = rng.uniform2(ids, jnp.uint32(1000 + s), jnp.uint32(0))
        d = to_world(texels.normal, sample_cosine_hemisphere(u))
        ro = texels.pos + texels.normal * offset
        rad, _ = _trace_radiance(scene, ro, d, cfg, 2000 + s)
        acc = acc + rad
    E = jnp.pi * acc / spp

    H, W = texels.size
    out = np.zeros((H, W, 3), np.float32)
    out[texels.texel_xy[:, 1], texels.texel_xy[:, 0]] = np.asarray(E)
    return out


def _trace_radiance(scene, ro, rd, cfg, seed):
    """Path-traced radiance along explicit rays (reuses the integrator by
    overriding its camera rays via a pass-through camera)."""
    from truetrace_tpu.integrate import pathtrace as pt
    import jax.numpy as jnp

    R = ro.shape[0]
    pixel = jnp.arange(R, dtype=jnp.uint32)
    # call the bounce loop directly with explicit primary rays
    rad, stats = pt.trace_rays(scene, ro, rd, cfg, pixel,
                               jnp.uint32(seed))
    return rad, stats
