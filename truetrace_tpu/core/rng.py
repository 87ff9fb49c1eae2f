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


# ---------------------------------------------------------------------------
# Blue-noise / low-discrepancy sampler (RenderConfig.sampler="bluenoise")
#
# Counterpart of the reference's low-discrepancy per-pixel mode
# (CommonData.cginc:404-428: `random` switches to a scrambled sequence +
# per-pixel scramble for the denoiser-facing passes). TPU form: a
# Cranley-Patterson-rotated Owen-ish (0,2)-sequence — per sample index a
# scalar Sobol pair, per dimension an XOR scramble, per PIXEL a toroidal
# shift from a void-and-cluster blue-noise mask, so neighbouring pixels'
# low-spp errors are anti-correlated (what the eye and the denoisers see).
# Still a pure function of (pixel, sample, dim): the replay contract
# (ASVGF/diff/ReSTIR) is untouched.
# ---------------------------------------------------------------------------

BN_SIZE = 64                      # mask side; tiled toroidally over screen
_BN_MASK = None                   # lazy [BN_SIZE*BN_SIZE] f32 ranks in [0,1)


def blue_noise_mask():
    """Flat [BN_SIZE*BN_SIZE] float32 blue-noise ranks in [0,1).

    Sequential void-filling (Ulichney void-and-cluster, insertion phase
    only): repeatedly place the next rank at the cell with the lowest
    accumulated toroidal-Gaussian energy. Deterministic; built once per
    process (~60 ms) and cached."""
    global _BN_MASK
    if _BN_MASK is not None:
        # cached as NUMPY: converting per call keeps the constant out of
        # whatever trace context first computed it (a jnp cache built
        # under jit leaks that trace's context — UnexpectedTracerError)
        return jnp.asarray(_BN_MASK)
    import numpy as np
    n = BN_SIZE
    sigma = 1.5      # adj-rank diff 0.40 + low/high spectral ratio ~0
                     # (sweep in round-4 notes; 1.9 gave 0.37)
    ax = np.arange(n)
    d = np.minimum(ax, n - ax).astype(np.float64)
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    kernel = np.exp(-d2 / (2.0 * sigma * sigma))
    energy = np.zeros((n, n))
    taken = np.zeros((n, n), bool)
    rank = np.zeros((n, n), np.int64)
    # deterministic start cell; ties break by flat index (argmin order)
    for r in range(n * n):
        masked = np.where(taken, np.inf, energy)
        idx = int(np.argmin(masked))
        y, x = divmod(idx, n)
        taken[y, x] = True
        rank[y, x] = r
        energy += np.roll(np.roll(kernel, y, axis=0), x, axis=1)
    _BN_MASK = (rank.reshape(-1).astype(np.float64)
                / (n * n)).astype(np.float32)
    return jnp.asarray(_BN_MASK)


def _bitrev32(x):
    x = ((x & _U32(0x55555555)) << 1) | ((x >> 1) & _U32(0x55555555))
    x = ((x & _U32(0x33333333)) << 2) | ((x >> 2) & _U32(0x33333333))
    x = ((x & _U32(0x0F0F0F0F)) << 4) | ((x >> 4) & _U32(0x0F0F0F0F))
    x = ((x & _U32(0x00FF00FF)) << 8) | ((x >> 8) & _U32(0x00FF00FF))
    return (x << 16) | (x >> 16)


# Sobol' dimension-2 direction numbers (primitive polynomial x+1:
# v_i = v_{i-1} ^ (v_{i-1} >> 1), the classic m = 1,3,5,15,17,... —
# together with the bit-reversed first dimension this is THE (0,2)
# sequence every Sobol implementation ships)
import numpy as _np


def _sobol2_dirs():
    v = [0] * 32
    v[0] = 1 << 31
    for i in range(1, 32):
        v[i] = v[i - 1] ^ (v[i - 1] >> 1)
    return _np.asarray(v, _np.uint64).astype(_np.uint32)


_SOBOL2_DIRS = _sobol2_dirs()


def _sobol_pair(s):
    """Scalar (or array) sample index -> (x, y) u32 Sobol (0,2) pair."""
    s = jnp.asarray(s).astype(_U32)
    x = _bitrev32(s)
    y = jnp.zeros_like(s)
    for i in range(32):
        y = y ^ jnp.where((s >> i) & _U32(1) == 1,
                          _U32(int(_SOBOL2_DIRS[i])), _U32(0))
    return x, y


def _lk_permute(x, seed):
    """Laine–Karras hash permutation (Burley 2020, "Practical Hash-based
    Owen Scrambling"): in the bit-reversed domain this acts as a random
    per-bit-prefix permutation — i.e. a base-2 Owen scramble."""
    x = x + seed
    x = x ^ (x * _U32(0x6C50B47C))
    x = x ^ (x * _U32(0xB82F1E52))
    x = x ^ (x * _U32(0xC7AFE638))
    x = x ^ (x * _U32(0x8D22F6E6))
    return x


def _owen_scramble(x, seed):
    """Base-2 Owen (nested uniform) scramble of an MSB-aligned u32 sample."""
    return _bitrev32(_lk_permute(_bitrev32(x), seed))


def _bn_shift(pixel_id, dim_id, width):
    """Per-pixel, per-dim blue-noise shift in [0,1): the mask sampled at
    the pixel's screen cell, toroidally offset per dimension."""
    mask = blue_noise_mask()
    pix = pixel_id.astype(jnp.int32)
    x = pix % width
    y = pix // width
    # decorrelate dimensions: offset the mask lookup by a hash of dim
    hx, hy, _ = pcg3d(dim_id, dim_id ^ _U32(0x9E3779B9), _U32(17))
    ox = (hx & _U32(BN_SIZE - 1)).astype(jnp.int32)
    oy = (hy & _U32(BN_SIZE - 1)).astype(jnp.int32)
    cell = ((y + oy) % BN_SIZE) * BN_SIZE + (x + ox) % BN_SIZE
    return mask[cell]


def bn_uniform1(pixel_id, sample_id, dim_id, width):
    """Blue-noise-dithered LD scalar: per-dim index-shuffled + Owen-
    scrambled van der Corput, Cranley–Patterson rotated per pixel by the
    mask.

    Padding dimensions from one shared sequence needs REAL per-dimension
    randomization: a per-dim Owen shuffle of the sample index plus an
    Owen scramble of the output (Burley 2020). A plain XOR scramble is a
    digital shift — it leaves any two dimensions' joint distribution
    degenerate (ADVICE r4: RR/lobe/MIS draws were deterministically
    coupled, 64/1024 occupied joint cells). Owen scrambling preserves the
    1-D (0,m,1)-net stratification while making cross-dim joints behave
    like independent padding."""
    dim_id = jnp.asarray(dim_id).astype(_U32)
    u = bn_sequence1(sample_id, dim_id) + _bn_shift(pixel_id, dim_id, width)
    return u - jnp.floor(u)


def bn_sequence1(sample_id, dim_id):
    """The pre-rotation per-dim scalar LD sequence (exactly stratified;
    bn_uniform1 adds the per-pixel blue-noise Cranley–Patterson shift,
    which preserves stratification only up to bin-boundary wrap)."""
    dim_id = jnp.asarray(dim_id).astype(_U32)
    h1, h2, _ = pcg3d(dim_id, _U32(0xA511E9B3), _U32(3))
    s = _owen_scramble(jnp.asarray(sample_id).astype(_U32), h1)
    sx, _ = _sobol_pair(s)
    return _u32_to_unit_float(_owen_scramble(sx, h2))


def bn_uniform2(pixel_id, sample_id, dim_id, width):
    """Blue-noise-dithered LD pair: (0,2)-sequence in a per-dim Owen-
    shuffled sample index, each component Owen-scrambled (see
    bn_uniform1). The two components share ONE shuffled index so the
    (0,2) pair property is preserved; different dim_ids get independent
    shuffles/scrambles so joints across dims are decorrelated."""
    dim_id = jnp.asarray(dim_id).astype(_U32)
    h1, scx, scy = pcg3d(dim_id, _U32(0xA511E9B3), _U32(5))
    s = _owen_scramble(jnp.asarray(sample_id).astype(_U32), h1)
    sx, sy = _sobol_pair(s)
    bx = _u32_to_unit_float(_owen_scramble(sx, scx))
    by = _u32_to_unit_float(_owen_scramble(sy, scy))
    shx = _bn_shift(pixel_id, dim_id, width)
    shy = _bn_shift(pixel_id, dim_id ^ _U32(0x517CC1B7), width)
    ux = bx + shx
    uy = by + shy
    return jnp.stack([ux - jnp.floor(ux), uy - jnp.floor(uy)], axis=-1)
