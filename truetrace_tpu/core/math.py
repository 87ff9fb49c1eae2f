"""Core math primitives shared by every layer of the tracer.

Functional JAX counterparts of the reference renderer's GPU-side helpers
(octahedral normal codec: reference CommonData.cginc:841-857; RGBE packing:
CommonData.cginc:479-509; MIS power heuristic: RayTracingShader.compute:436;
orthonormal-basis and sampling helpers: Materials.cginc).  Everything here is
shape-polymorphic, vmappable, and differentiable where it makes sense.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6
F32_MAX = jnp.float32(3.4028235e38)


# ---------------------------------------------------------------------------
# small vector helpers (arrays are [..., 3])
# ---------------------------------------------------------------------------

def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps: float = 1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), eps))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def luminance(rgb):
    """Rec.709 luminance, matching the reference's `luminance()` helper."""
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722


def reflect(v, n):
    """Reflect direction `v` about normal `n` (v points *into* the surface)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(v, n, eta):
    """Refract `v` (into surface) through `n` with relative IOR `eta`.

    Returns (dir, total_internal_reflection_mask)."""
    cos_i = -dot(v, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    d = eta[..., None] * v + (eta * cos_i - cos_t)[..., None] * n
    return normalize(d), tir


# ---------------------------------------------------------------------------
# orthonormal basis (branchless Frisvad / Duff et al. revised ONB)
# ---------------------------------------------------------------------------

def onb(n):
    """Build tangent/bitangent for unit normal n. Returns (t, b).

    Branchless formulation (Duff et al. 2017) — TPU-friendly: pure VPU math,
    no data-dependent control flow."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1)
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(n, v_local):
    """Rotate a tangent-space vector (z = normal) into world space."""
    t, b = onb(n)
    return (v_local[..., 0:1] * t + v_local[..., 1:2] * b
            + v_local[..., 2:3] * n)


def to_local(n, v_world):
    t, b = onb(n)
    return jnp.stack(
        [dot(v_world, t), dot(v_world, b), dot(v_world, n)], axis=-1)


# ---------------------------------------------------------------------------
# octahedral unit-vector codec (32-bit: 2 x snorm16)
# reference: CommonData.cginc:841-857 (DecodeOctahedral/EncodeOctahedral),
# CommonVars.cs:816 (PackOctahedral). Same mapping, realized with int lanes.
# ---------------------------------------------------------------------------

def octahedral_encode(n):
    """Unit vector [...,3] -> two snorm floats in [-1,1] ([...,2])."""
    l1 = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    p = n[..., :2] / jnp.maximum(l1, 1e-20)
    flip = (1.0 - jnp.abs(p[..., ::-1])) * jnp.where(p >= 0.0, 1.0, -1.0)
    return jnp.where(n[..., 2:3] < 0.0, flip, p)


def octahedral_decode(e):
    """Two snorm floats [...,2] -> unit vector [...,3]."""
    z = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    flip = (1.0 - jnp.abs(e[..., ::-1])) * jnp.where(e >= 0.0, 1.0, -1.0)
    xy = jnp.where(z[..., None] < 0.0, flip, e)
    return normalize(jnp.concatenate([xy, z[..., None]], axis=-1))


def octahedral_pack32(n):
    """Unit vector -> uint32 (2 x snorm16), bit layout matching the reference's
    PackOctahedral (CommonVars.cs:816)."""
    e = octahedral_encode(n)
    q = jnp.round(jnp.clip(e, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    u = (q & 0xFFFF).astype(jnp.uint32)
    return u[..., 0] | (u[..., 1] << 16)


def octahedral_unpack32(u):
    ux = (u & jnp.uint32(0xFFFF)).astype(jnp.int32)
    uy = ((u >> 16) & jnp.uint32(0xFFFF)).astype(jnp.int32)
    # sign-extend 16-bit
    sx = jnp.where(ux >= 32768, ux - 65536, ux).astype(jnp.float32) / 32767.0
    sy = jnp.where(uy >= 32768, uy - 65536, uy).astype(jnp.float32) / 32767.0
    return octahedral_decode(jnp.stack([sx, sy], axis=-1))


# ---------------------------------------------------------------------------
# RGBE shared-exponent HDR codec (reference CommonData.cginc:479-509)
# ---------------------------------------------------------------------------

def rgbe_pack(rgb):
    """HDR rgb [...,3] -> uint32 RGBE (8-8-8 mantissa + 8 exponent)."""
    m = jnp.max(rgb, axis=-1)
    exp = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(m, 1e-32))), -64.0, 63.0)
    scale = jnp.exp2(-exp)
    q = jnp.clip(jnp.round(rgb * scale[..., None] * 255.0), 0.0, 255.0)
    q = q.astype(jnp.uint32)
    e = (exp.astype(jnp.int32) + 64).astype(jnp.uint32)
    out = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (e << 24)
    return jnp.where(m <= 0.0, jnp.uint32(0), out)


def rgbe_unpack(u):
    r = (u & jnp.uint32(0xFF)).astype(jnp.float32)
    g = ((u >> 8) & jnp.uint32(0xFF)).astype(jnp.float32)
    b = ((u >> 16) & jnp.uint32(0xFF)).astype(jnp.float32)
    e = ((u >> 24) & jnp.uint32(0xFF)).astype(jnp.int32) - 64
    scale = jnp.exp2(e.astype(jnp.float32)) / 255.0
    return jnp.stack([r, g, b], axis=-1) * scale[..., None]


# ---------------------------------------------------------------------------
# MIS
# ---------------------------------------------------------------------------

def power_heuristic(pdf_a, pdf_b):
    """Veach power heuristic (beta=2); reference RayTracingShader.compute
    (`power_heuristic`). pdfs are clamped so the ratio never becomes
    inf/inf — NaNs here poison gradients through masked lanes (0*NaN)."""
    a = jnp.clip(pdf_a, 0.0, 1e8)
    b = jnp.clip(pdf_b, 0.0, 1e8)
    a2 = a * a
    return a2 / jnp.maximum(a2 + b * b, 1e-20)


def balance_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def sample_cosine_hemisphere(u):
    """u: [...,2] uniform -> cosine-weighted direction in tangent space
    (z-up), pdf = cos/pi."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u[..., 0]))
    return jnp.stack([x, y, z], axis=-1)


def sample_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_triangle(u):
    """Uniform barycentrics from 2 uniforms (sqrt parameterization)."""
    su = jnp.sqrt(u[..., 0])
    b0 = 1.0 - su
    b1 = u[..., 1] * su
    return b0, b1


# ---------------------------------------------------------------------------
# ray-primitive intersection (pure VPU math, used by both the JAX reference
# path and as the scalar core of Pallas kernels)
# ---------------------------------------------------------------------------

def ray_tri(ro, rd, p0, e1, e2, t_max):
    """Moller-Trumbore against edge-form triangles (pos0 + 2 edges — the
    reference's CudaTriangle layout, CommonVars.cs:437-456).

    Broadcasting: any leading batch dims. Returns (hit, t, u, v)."""
    pvec = cross(rd, e2)
    det = dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvec = ro - p0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(rd, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > 1e-4) & (t < t_max) & (jnp.abs(det) > 1e-12))
    return hit, t, u, v


def ray_aabb(ro, inv_rd, bmin, bmax, t_max):
    """Slab test. Returns (hit, t_near)."""
    t0 = (bmin - ro) * inv_rd
    t1 = (bmax - ro) * inv_rd
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_near = jnp.max(tsm, axis=-1)
    t_far = jnp.min(tbg, axis=-1)
    hit = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_max)
    return hit, t_near


# ---------------------------------------------------------------------------
# misc numeric
# ---------------------------------------------------------------------------

def safe_div(a, b, eps: float = 1e-20):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b >= 0, eps, -eps), b)


def finite_or_zero(x):
    """NaN/Inf guard mirroring the reference's ad-hoc guards
    (RayTracingShader.compute:727)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def hue_rotate(rgb, degrees):
    """Rotate RGB hue around the gray axis by `degrees` [..., per-lane].
    Counterpart of the reference's Unity_Hue_Degrees in kernel_shade
    (RayTracingShader.compute:640)."""
    th = jnp.deg2rad(degrees)
    c = jnp.cos(th)
    s = jnp.sin(th)
    one3 = (1.0 - c) / 3.0
    rt3s = jnp.sqrt(jnp.float32(1.0 / 3.0)) * s
    m00 = c + one3
    m01 = one3 - rt3s
    m02 = one3 + rt3s
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack([m00 * r + m01 * g + m02 * b,
                      m02 * r + m00 * g + m01 * b,
                      m01 * r + m02 * g + m00 * b], axis=-1)


def adjust_color(rgb, hue_deg, brightness, saturation, contrast,
                 blend_color, blend_factor):
    """The reference's albedo adjustment chain (kernel_shade,
    RayTracingShader.compute:630-649): hue -> brightness -> saturation ->
    contrast -> saturate -> blend toward a flat color."""
    c = hue_rotate(rgb, hue_deg)
    c = c * brightness[..., None]
    lum = luminance(c)[..., None]
    c = lum + (c - lum) * saturation[..., None]
    c = (c - 0.5) * contrast[..., None] + 0.5
    c = jnp.clip(c, 0.0, 1.0)
    return c + (blend_color - c) * blend_factor[..., None]
