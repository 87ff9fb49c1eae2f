"""Stateless counter-based RNG for wavefront path tracing.

The reference uses a stateful PCG stream seeded by pixel index + frame
(CommonData.cginc:404-428, `random(coord, id)` with a per-dimension counter).
On TPU we keep the same *addressing scheme* — every random number is a pure
function of (pixel, sample/frame, bounce, dimension) — but realize it with a
counter-based hash so there is no mutable state threaded through `lax` loops
and every lane computes its stream independently on the VPU.

`pcg3d` (Jarzynski & Olano 2020) gives three decorrelated u32 per call; we use
(pixel_id, sample_id, dim_id) as the 3-D counter.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def pcg3d(v0, v1, v2):
    """3-D PCG hash: three uint32 counters -> three decorrelated uint32."""
    x = v0.astype(_U32)
    y = v1.astype(_U32)
    z = v2.astype(_U32)
    m = _U32(1664525)
    a = _U32(1013904223)
    x = x * m + a
    y = y * m + a
    z = z * m + a
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _u32_to_unit_float(u):
    """uint32 -> float32 in [0, 1): use the top 24 bits."""
    return (u >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def uniform2(pixel_id, sample_id, dim_id):
    """Two independent U[0,1) floats per lane.

    pixel_id / sample_id / dim_id: broadcastable int32/uint32 arrays.
    dim_id enumerates random-number *uses* along a path (bounce*K + slot),
    mirroring the reference's per-use counter (CommonData.cginc:412)."""
    x, y, _ = pcg3d(pixel_id, sample_id, dim_id)
    return jnp.stack([_u32_to_unit_float(x), _u32_to_unit_float(y)], axis=-1)


def uniform1(pixel_id, sample_id, dim_id):
    x, _, _ = pcg3d(pixel_id, sample_id, dim_id)
    return _u32_to_unit_float(x)


def uniform3(pixel_id, sample_id, dim_id):
    x, y, z = pcg3d(pixel_id, sample_id, dim_id)
    return jnp.stack([_u32_to_unit_float(x), _u32_to_unit_float(y),
                      _u32_to_unit_float(z)], axis=-1)


# dimension-slot layout along a path (stride per bounce). Keeping a fixed
# stride makes replay in the backward pass trivial: the same (pixel, sample,
# dim) triple regenerates the identical decision stream (diff/replay.py).
DIMS_PER_BOUNCE = 8
DIM_CAMERA_JITTER = 0   # subpixel jitter + DoF lens sample
DIM_BSDF_LOBE = 1       # lobe selection
DIM_BSDF_SAMPLE = 2     # 2-D direction sample
DIM_LIGHT_SELECT = 3    # light-tree / RIS selection
DIM_LIGHT_SAMPLE = 4    # 2-D point-on-light sample
DIM_RR = 5              # russian roulette
DIM_AUX = 6             # free slot (ReSTIR etc.)
DIM_NEE_RR = 7          # NEE shadow-ray russian roulette


def path_dim(bounce, slot):
    """Dimension id for a given bounce and slot."""
    return bounce * DIMS_PER_BOUNCE + slot
