"""AABB utilities used by the host-side BVH builders (numpy) and JAX refit.

Counterpart of the reference's `CommonVars.AABB` helpers
(Builders/CommonVars.cs:305-402). These run on host (numpy arrays) during the
build and as jnp arrays inside refit level-sweeps — so everything is written
against the array-API subset shared by numpy and jax.numpy.
"""
from __future__ import annotations

import numpy as np

INF = np.float32(np.inf)


def empty(n=None, xp=np):
    """An inverted (empty) AABB or a batch of them: shape [..., 2, 3] with
    [...,0,:]=+inf mins, [...,1,:]=-inf maxs."""
    shape = (2, 3) if n is None else (n, 2, 3)
    box = xp.empty(shape, dtype=xp.float32)
    box[..., 0, :] = INF
    box[..., 1, :] = -INF
    return box


def union(a, b, xp=np):
    return xp.stack([xp.minimum(a[..., 0, :], b[..., 0, :]),
                     xp.maximum(a[..., 1, :], b[..., 1, :])], axis=-2)


def grow_point(box, p, xp=np):
    return xp.stack([xp.minimum(box[..., 0, :], p),
                     xp.maximum(box[..., 1, :], p)], axis=-2)


def surface_area(box, xp=np):
    d = xp.maximum(box[..., 1, :] - box[..., 0, :], 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def half_area(box, xp=np):
    d = xp.maximum(box[..., 1, :] - box[..., 0, :], 0.0)
    return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
            + d[..., 2] * d[..., 0])


def centroid(box):
    return 0.5 * (box[..., 0, :] + box[..., 1, :])


def contains(outer, inner, slack=1e-5):
    """True where `outer` conservatively contains `inner` (used by CWBVH
    quantization round-trip tests; mirrors BVH8Builder.cs asserts)."""
    lo_ok = np.all(outer[..., 0, :] <= inner[..., 0, :] + slack, axis=-1)
    hi_ok = np.all(outer[..., 1, :] >= inner[..., 1, :] - slack, axis=-1)
    return lo_ok & hi_ok


def from_tris(p0, p1, p2, xp=np):
    """Per-triangle AABBs from three vertex arrays [N,3] -> [N,2,3]."""
    lo = xp.minimum(xp.minimum(p0, p1), p2)
    hi = xp.maximum(xp.maximum(p0, p1), p2)
    return xp.stack([lo, hi], axis=-2)
