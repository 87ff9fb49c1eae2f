"""Camera motion vectors for temporal reprojection.

The reference reprojects with per-pixel motion vectors produced during
raygen/shading (ASVGF `Reproject`, TAA, ReSTIR temporal all consume them).
Here they are derived analytically from the depth buffer and the previous
camera: reconstruct each pixel's world position from the current camera ray
and linear depth, project into the previous camera, and report the pixel
offset (cur - prev). Pure function of (prev_cam, cam, depth) — works under
jit and matches the renderer's camera convention (scene/ir.py Camera,
row-vector c2w, looks down -z).
"""
from __future__ import annotations

import jax.numpy as jnp

from truetrace_tpu.scene.ir import Camera


def world_from_depth(cam: Camera, depth: jnp.ndarray):
    """Reconstruct world positions [H,W,3] from hit distances along the
    center rays (depth = ray t, the integrator's g_depth)."""
    H, W = depth.shape
    x = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W * 2.0 - 1.0
    y = 1.0 - (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H * 2.0
    tan_half = jnp.tan(cam.fov_y * 0.5)
    aspect = W / H
    vx = x * tan_half * aspect
    vy = y * tan_half
    d = (vx[..., None] * cam.c2w[0, :3] + vy[..., None] * cam.c2w[1, :3]
         - jnp.broadcast_to(cam.c2w[2, :3], (H, W, 3)))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return cam.c2w[3, :3] + d * depth[..., None]


def project(cam: Camera, p: jnp.ndarray, width: int, height: int):
    """World -> pixel coordinates (x, y) + in-front flag for `cam`."""
    rel = p - cam.c2w[3, :3]
    cx = jnp.sum(rel * cam.c2w[0, :3], axis=-1)
    cy = jnp.sum(rel * cam.c2w[1, :3], axis=-1)
    cz = jnp.sum(rel * cam.c2w[2, :3], axis=-1)   # +back; in front => cz < 0
    tan_half = jnp.tan(cam.fov_y * 0.5)
    aspect = width / height
    z = jnp.maximum(-cz, 1e-6)
    ndc_x = cx / (z * tan_half * aspect)
    ndc_y = cy / (z * tan_half)
    px = (ndc_x + 1.0) * 0.5 * width - 0.5
    py = (1.0 - ndc_y) * 0.5 * height - 0.5
    return px, py, cz < 0


def object_motion_transforms(l2w_prev: jnp.ndarray, l2w_cur: jnp.ndarray):
    """Per-instance [I,3,4] motion transform M_i mapping a CURRENT-frame
    world point on instance i to its PREVIOUS-frame world position:
    M_i = l2w_prev_i ∘ inv(l2w_cur_i). Rows are the _mat34 layout
    (scene/instances.py): p_world = A @ p_local + t with A = rows[:, :3],
    t = rows[:, 3]."""
    A_cur = l2w_cur[:, :, :3]                     # [I,3,3]
    t_cur = l2w_cur[:, :, 3]
    A_prev = l2w_prev[:, :, :3]
    t_prev = l2w_prev[:, :, 3]
    A_cur_inv = jnp.linalg.inv(A_cur)
    A = jnp.einsum("iab,ibc->iac", A_prev, A_cur_inv)
    t = t_prev - jnp.einsum("iab,ib->ia", A, t_cur)
    return jnp.concatenate([A, t[..., None]], axis=-1)


def motion_vectors_objects(prev_cam: Camera, cam: Camera,
                           depth: jnp.ndarray, inst: jnp.ndarray,
                           l2w_prev: jnp.ndarray, l2w_cur: jnp.ndarray):
    """Per-pixel motion [H,W,2] including per-OBJECT motion: pixels whose
    primary hit lies on instance i (inst >= 0, the integrator's g_inst)
    are carried back through instance i's previous transform before
    projecting into the previous camera — the counterpart of the
    reference's engine motion vectors, which encode object motion
    (RayGenKernels.compute:78-82 reprojects through MotionVectors;
    RayTracingShader.compute:229). Camera-only vectors ghost animated
    instances under TAA/TAAU/SVGF/ReSTIR temporal reuse."""
    H, W = depth.shape
    p = world_from_depth(cam, depth)
    M = object_motion_transforms(l2w_prev, l2w_cur)     # [I,3,4]
    mi = M[jnp.clip(inst, 0, M.shape[0] - 1)]           # [H,W,3,4]
    p_obj = (jnp.einsum("hwab,hwb->hwa", mi[..., :3], p) + mi[..., 3])
    p = jnp.where((inst >= 0)[..., None], p_obj, p)
    px, py, ok = project(prev_cam, p, W, H)
    cur_x = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    cur_y = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    dx = cur_x - 0.5 - px
    dy = cur_y - 0.5 - py
    big = jnp.float32(1e4)
    dx = jnp.where(ok & (depth > 0), dx, big)
    dy = jnp.where(ok & (depth > 0), dy, big)
    return jnp.stack([dx, dy], axis=-1)


def motion_vectors(prev_cam: Camera, cam: Camera, depth: jnp.ndarray):
    """Per-pixel motion [H,W,2] = (dx, dy) such that history lives at
    (x - dx, y - dy) — the convention post/svgf.py & friends consume.
    Pixels that fall behind the previous camera get huge motion (history
    rejected by the gates)."""
    H, W = depth.shape
    p = world_from_depth(cam, depth)
    px, py, ok = project(prev_cam, p, W, H)
    cur_x = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5
    cur_y = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    dx = cur_x - 0.5 - px
    dy = cur_y - 0.5 - py
    big = jnp.float32(1e4)
    dx = jnp.where(ok & (depth > 0), dx, big)
    dy = jnp.where(ok & (depth > 0), dy, big)
    return jnp.stack([dx, dy], axis=-1)
