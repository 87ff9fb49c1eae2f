"""Linear-blend skinning (LBS) feeding the CWBVH refit path.

The reference reads Unity's skinned vertex buffers and rebuilds tris +
AABBs on the GPU (BVHRefitter.compute `Construct` :73-122, driven by
ParentObject.RefitMesh). Here skinning itself is a jitted JAX op: bone
palette matrices x vertex weights -> deformed vertices -> edge-form tris ->
`build.refit.refit_cwbvh` requantizes the acceleration structure in place.

Everything is differentiable, so bone transforms can be optimization
targets (inverse kinematics through the renderer).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SkinnedMesh(NamedTuple):
    """Static skinning data (host-built, device-resident)."""
    rest_verts: jnp.ndarray   # [V,3] bind-pose positions
    bone_idx: jnp.ndarray     # [V,4] int32
    bone_w: jnp.ndarray       # [V,4] weights (sum to 1)
    tri_vidx: jnp.ndarray     # [F,3] int32 triangle -> vertex ids
    inv_bind: jnp.ndarray     # [B,3,4] inverse bind matrices (rows)


def make_two_bone_cylinder(n_radial=16, n_height=24, radius=0.3,
                           height=2.0):
    """Test asset: a cylinder skinned to 2 bones (root + tip), weights
    blended along the height — the classic bend-test mesh."""
    from truetrace_tpu.scene.primitives import cylinder
    v, idx, _ = cylinder(n_radial, n_height, radius, height, cap=True)
    V = v.shape[0]
    t = np.clip(v[:, 1] / height, 0.0, 1.0)
    w1 = np.clip((t - 0.25) / 0.5, 0.0, 1.0)
    bone_w = np.stack([1.0 - w1, w1, np.zeros(V), np.zeros(V)], axis=-1)
    bone_idx = np.broadcast_to(np.array([0, 1, 2, 3], np.int32), (V, 4))
    inv_bind = np.zeros((2, 3, 4), np.float32)
    inv_bind[0, :, :3] = np.eye(3)
    inv_bind[1, :, :3] = np.eye(3)
    inv_bind[1, 1, 3] = -height * 0.5     # bone 1 origin at half height
    return SkinnedMesh(
        rest_verts=jnp.asarray(v.astype(np.float32)),
        bone_idx=jnp.asarray(bone_idx),
        bone_w=jnp.asarray(bone_w.astype(np.float32)),
        tri_vidx=jnp.asarray(idx),
        inv_bind=jnp.asarray(inv_bind))


def bone_matrix(rot_axis, angle, translate):
    """[3,4] bone transform from axis-angle + translation (Rodrigues)."""
    a = jnp.asarray(rot_axis, jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a), 1e-9)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x, y, z = a[0], a[1], a[2]
    R = jnp.asarray([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s,
         x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c),
         y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s,
         c + z * z * (1 - c)]])
    return jnp.concatenate(
        [R, jnp.asarray(translate, jnp.float32)[:, None]], axis=1)


@jax.jit
def skin_vertices(mesh: SkinnedMesh, bones: jnp.ndarray) -> jnp.ndarray:
    """bones [B,3,4] world transforms. Returns deformed verts [V,3]."""
    B = bones.shape[0]
    # palette = bone_world @ inv_bind (compose two [3,4] row transforms)
    def compose(a, b):
        R = a[:, :3] @ b[:, :3]
        t = a[:, :3] @ b[:, 3] + a[:, 3]
        return jnp.concatenate([R, t[:, None]], axis=1)
    palette = jax.vmap(compose)(bones, mesh.inv_bind[:B])
    pal = palette[mesh.bone_idx]                     # [V,4,3,4]
    v_h = jnp.concatenate([mesh.rest_verts,
                           jnp.ones((mesh.rest_verts.shape[0], 1))], -1)
    per_bone = jnp.einsum("vbij,vj->vbi", pal, v_h,
                          precision=jax.lax.Precision.HIGHEST)  # [V,4,3]
    return jnp.sum(per_bone * mesh.bone_w[..., None], axis=1)


def skinned_tris(mesh: SkinnedMesh, bones: jnp.ndarray):
    """Deformed edge-form triangles (p0, e1, e2) ready for refit_cwbvh."""
    v = skin_vertices(mesh, bones)
    p0 = v[mesh.tri_vidx[:, 0]]
    p1 = v[mesh.tri_vidx[:, 1]]
    p2 = v[mesh.tri_vidx[:, 2]]
    return p0, p1 - p0, p2 - p0
