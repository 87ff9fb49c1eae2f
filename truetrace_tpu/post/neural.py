"""Learned denoiser — the OIDN slot (reference: UnityDenoiserPlugin.cs +
vendored OpenImageDenoise2.dll / OptiX binaries, flagged [NATIVE-EQUIV] in
SURVEY.md section 2.1).

The reference bridges to a prebuilt CNN denoiser through a native plugin;
the TPU-native equivalent IS the accelerator's home turf: a compact U-Net
(flax/linen, NHWC, bf16-friendly conv stacks that map straight onto the
MXU) consuming the same inputs OIDN does — noisy color + albedo + normal
G-buffer — and trained on this renderer's own output pairs (low-spp in,
high-spp target), so no foreign weights are needed.

Pieces:
  * `DenoiserUNet` — 3-level U-Net, ~200k params (kept small: the typical
    frame is already temporally accumulated; this is a final cleanup pass).
  * `denoise` — apply with log-tonemapped color + albedo demodulation
    (standard OIDN-style preprocessing for HDR stability).
  * `make_train_step` — Adam + L1-in-log-space loss, jittable, pmap-able.
  * scripts/train_denoiser.py renders random Cornell-variant pairs and
    trains on-device; utils/checkpoint.py persists params.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pre_color(c):
    """HDR -> log space (OIDN's transfer function idea)."""
    return jnp.log1p(jnp.maximum(c, 0.0))


def _post_color(y):
    return jnp.expm1(y)


class ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.ch, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class DenoiserUNet(nn.Module):
    """3-level U-Net over [B,H,W,9] (log-color, albedo, normal) -> residual
    on the log color. H, W must be multiples of 4."""
    chans: Sequence[int] = (24, 48, 96)

    @nn.compact
    def __call__(self, x):
        c0 = ConvBlock(self.chans[0])(x)
        d1 = nn.avg_pool(c0, (2, 2), strides=(2, 2))
        c1 = ConvBlock(self.chans[1])(d1)
        d2 = nn.avg_pool(c1, (2, 2), strides=(2, 2))
        c2 = ConvBlock(self.chans[2])(d2)
        u1 = jax.image.resize(c2, c1.shape[:1] + (c1.shape[1], c1.shape[2],
                                                  c2.shape[-1]), "nearest")
        c3 = ConvBlock(self.chans[1])(jnp.concatenate([u1, c1], -1))
        u0 = jax.image.resize(c3, c0.shape[:1] + (c0.shape[1], c0.shape[2],
                                                  c3.shape[-1]), "nearest")
        c4 = ConvBlock(self.chans[0])(jnp.concatenate([u0, c0], -1))
        return nn.Conv(3, (3, 3), padding="SAME")(c4)


def features(noisy, albedo, normal):
    """Assemble the network input [..,9]: log color, albedo, normal."""
    return jnp.concatenate([_pre_color(noisy), albedo, normal], axis=-1)


def init_params(key, h: int = 64, w: int = 64):
    model = DenoiserUNet()
    x = jnp.zeros((1, h, w, 9), jnp.float32)
    return model.init(key, x)["params"]


@jax.jit
def denoise(params, noisy, albedo, normal):
    """[H,W,3] noisy radiance -> denoised radiance (non-negative)."""
    model = DenoiserUNet()
    x = features(noisy, albedo, normal)[None]
    resid = model.apply({"params": params}, x)[0]
    y = _pre_color(noisy) + resid
    return jnp.maximum(_post_color(y), 0.0)


def loss_fn(params, batch):
    """L1 in log space (robust to HDR outliers/fireflies)."""
    model = DenoiserUNet()
    x = features(batch["noisy"], batch["albedo"], batch["normal"])
    resid = model.apply({"params": params}, x)
    pred = _pre_color(batch["noisy"]) + resid
    tgt = _pre_color(batch["target"])
    return jnp.mean(jnp.abs(pred - tgt))


def make_train_step(learning_rate: float = 1e-3):
    import optax
    tx = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step
