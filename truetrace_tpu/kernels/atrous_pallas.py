"""Pallas TPU kernel: SVGF edge-aware a-trous filter pass.

The denoiser's hot op (post/svgf.py `_atrous_pass`: 25 taps x 4 buffers x
edge weights, run 5x per frame). The XLA version re-reads HBM per tap
fusion group; this kernel pins color/variance/normal/depth in VMEM and
computes all 25 taps on-chip — one HBM read + one write per buffer per
pass.

Whole-image-in-VMEM formulation (images up to ~512x768 f32 fit the ~16 MB
VMEM); larger frames fall back to the XLA path automatically
(`atrous_pass_auto`). Taps are realized with `pltpu.roll` (cyclic shifts
are exact for the interior; the reference's mirrored borders differ only
on the 2*step-pixel frame, matching the XLA version used elsewhere).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIGMA_Z = 1.0
SIGMA_N = 128.0
SIGMA_L = 4.0
_K1D = (1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16)

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _luminance(c0, c1, c2):
    return c0 * 0.2126 + c1 * 0.7152 + c2 * 0.0722


def _kernel(step: int, c0_ref, c1_ref, c2_ref, var_ref, n0_ref, n1_ref,
            n2_ref, z_ref, o0_ref, o1_ref, o2_ref, ov_ref, ow_ref):
    c0 = c0_ref[:]
    c1 = c1_ref[:]
    c2 = c2_ref[:]
    var = var_ref[:]
    n0 = n0_ref[:]
    n1 = n1_ref[:]
    n2 = n2_ref[:]
    z = z_ref[:]
    lum = _luminance(c0, c1, c2)
    # 3x3 Gaussian variance prefilter for the luminance sigma (SVGF paper;
    # see post/svgf._var_prefilter3 — prevents stable-zero pixels from
    # rejecting all neighbors and staying black)
    H0, W0 = var.shape
    var_w = jnp.zeros_like(var)
    for pdy in (-1, 0, 1):
        for pdx in (-1, 0, 1):
            pk = (2.0 if pdy == 0 else 1.0) * (2.0 if pdx == 0 else 1.0)
            v = var
            if pdy:
                v = pltpu.roll(v, pdy % H0, 0)
            if pdx:
                v = pltpu.roll(v, pdx % W0, 1)
            var_w = var_w + v * pk
    var_w = var_w * (1.0 / 16.0)
    sig_l = SIGMA_L * jnp.sqrt(jnp.maximum(var_w, 1e-10)) + 1e-8
    sig_z = SIGMA_Z * abs(step) * (jnp.abs(z) * 0.02 + 1e-2) + 1e-8

    H, W = c0.shape
    # accumulate into the output refs (and lum as weight scratch in-reg is
    # too big) so per-tap temporaries die immediately — an SSA-style unroll
    # keeps ~90 live [H,W] arrays and blows the Mosaic VMEM stack
    o0_ref[:] = jnp.zeros_like(c0)
    o1_ref[:] = jnp.zeros_like(c0)
    o2_ref[:] = jnp.zeros_like(c0)
    ov_ref[:] = jnp.zeros_like(c0)
    ow_ref[:] = jnp.zeros_like(c0)
    for i, ky in enumerate(_K1D):
        for j, kx in enumerate(_K1D):
            dy = (i - 2) * step
            dx = (j - 2) * step
            k = ky * kx

            def sh(a):
                # pltpu.roll requires non-negative shifts
                out = a
                if dy:
                    out = pltpu.roll(out, dy % H, 0)
                if dx:
                    out = pltpu.roll(out, dx % W, 1)
                return out

            if dy == 0 and dx == 0:
                w = jnp.full_like(c0, k)
            else:
                ndot = n0 * sh(n0) + n1 * sh(n1) + n2 * sh(n2)
                w_n = jnp.maximum(ndot, 0.0) ** SIGMA_N
                w_z = jnp.exp(-jnp.abs(z - sh(z)) / sig_z)
                w_l = jnp.exp(-jnp.abs(lum - sh(lum)) / sig_l)
                w = w_n * w_z * w_l * k
            o0_ref[:] = o0_ref[:] + sh(c0) * w
            o1_ref[:] = o1_ref[:] + sh(c1) * w
            o2_ref[:] = o2_ref[:] + sh(c2) * w
            ov_ref[:] = ov_ref[:] + sh(var) * w * w
            ow_ref[:] = ow_ref[:] + w
    inv = 1.0 / jnp.maximum(ow_ref[:], 1e-8)
    o0_ref[:] = o0_ref[:] * inv
    o1_ref[:] = o1_ref[:] * inv
    o2_ref[:] = o2_ref[:] * inv
    ov_ref[:] = ov_ref[:] * inv * inv


@partial(jax.jit, static_argnames=("step",))
def atrous_pass_pallas(color, var, normal, depth, step: int):
    """One a-trous pass entirely in VMEM. color [H,W,3], var/depth [H,W],
    normal [H,W,3]. Returns (filtered color, filtered var)."""
    H, W = depth.shape
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_kernel, step),
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * 5,
        in_specs=[spec] * 8,
        out_specs=[spec] * 5,
        interpret=jax.default_backend() == "cpu",
    )(color[..., 0], color[..., 1], color[..., 2], var,
      normal[..., 0], normal[..., 1], normal[..., 2], depth)
    c = jnp.stack(outs[:3], axis=-1)
    return c, outs[3]


def atrous_fits_vmem(h: int, w: int) -> bool:
    # 8 in + 4 out + ~6 temporaries, f32
    return h * w * 4 * 18 <= VMEM_BUDGET_BYTES


def atrous_pass_auto(color, var, normal, depth, step: int):
    """Pallas when the frame fits VMEM (and we're on TPU), else the XLA
    reference implementation."""
    H, W = depth.shape
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and atrous_fits_vmem(H, W):
        return atrous_pass_pallas(color, var, normal, depth, step)
    from truetrace_tpu.post.svgf import _atrous_pass
    return _atrous_pass(color, var, normal, depth, step)
