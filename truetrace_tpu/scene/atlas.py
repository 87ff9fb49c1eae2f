"""Texture atlas: host-side packing + device-side sampling.

Counterpart of the reference's atlasing pipeline (AssetManager.CreateAtlas
AssetManager.cs:396-533 packing via RectpackSharp + CopyTextureShader blits;
rect UV transform CommonData.cginc:569-591). TPU differences: no BCn
compression (XLA gathers from a dense f16/f32 array; bandwidth is traded
for gather-friendliness), one shelf-packed RGBA atlas per scene.

Sampling is a pure function (kernels can fuse it): wrap-repeat inside the
texture's rect, bilinear filter.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass
class AtlasBuilder:
    """Shelf packer: add [H,W,C] uint8/float images, then build()."""
    max_width: int = 4096
    images: List[np.ndarray] = field(default_factory=list)

    def add(self, img: np.ndarray) -> int:
        """Returns the texture id."""
        if img.ndim == 2:
            img = img[..., None]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.shape[-1] == 1:
            img = np.repeat(img, 4, axis=-1)
        elif img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones_like(img[..., :1])], axis=-1)
        self.images.append(img.astype(np.float32))
        return len(self.images) - 1

    def build(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (atlas [AH,AW,4] f32, rects [N,4] i32 (x,y,w,h))."""
        if not self.images:
            return (np.zeros((1, 1, 4), np.float32),
                    np.zeros((0, 4), np.int32))
        # shelf pack, tallest first
        order = sorted(range(len(self.images)),
                       key=lambda i: -self.images[i].shape[0])
        rects = np.zeros((len(self.images), 4), np.int32)
        shelf_y = 0
        shelf_h = 0
        x = 0
        aw = min(self.max_width,
                 max(int(np.ceil(np.sqrt(
                     sum(im.shape[0] * im.shape[1]
                         for im in self.images)))) ,
                     max(im.shape[1] for im in self.images)))
        for i in order:
            h, w = self.images[i].shape[:2]
            if x + w > aw:
                shelf_y += shelf_h
                shelf_h = 0
                x = 0
            rects[i] = (x, shelf_y, w, h)
            shelf_h = max(shelf_h, h)
            x += w
        ah = shelf_y + shelf_h
        atlas = np.zeros((ah, aw, 4), np.float32)
        for i, im in enumerate(self.images):
            rx, ry, w, h = rects[i]
            atlas[ry:ry + h, rx:rx + w] = im
        return atlas, rects


def sample_atlas(atlas: jnp.ndarray, rects: jnp.ndarray, tex_id, uv,
                 bilinear: bool = True):
    """Sample texture `tex_id` [R] at uv [R,2] (wrap-repeat). Returns
    [R,4]. tex_id < 0 lanes return ones (callers select)."""
    safe_id = jnp.maximum(tex_id, 0)
    r = rects[safe_id]                       # [R,4] x,y,w,h
    w = jnp.maximum(r[:, 2], 1).astype(jnp.float32)
    h = jnp.maximum(r[:, 3], 1).astype(jnp.float32)
    u = (uv[:, 0] % 1.0) * w
    v = (uv[:, 1] % 1.0) * h

    def fetch(xi, yi):
        x = r[:, 0] + (xi % r[:, 2].astype(jnp.int32))
        y = r[:, 1] + (yi % r[:, 3].astype(jnp.int32))
        return atlas[jnp.clip(y, 0, atlas.shape[0] - 1),
                     jnp.clip(x, 0, atlas.shape[1] - 1)]

    if not bilinear:
        return fetch(u.astype(jnp.int32), v.astype(jnp.int32))
    x0 = jnp.floor(u - 0.5)
    y0 = jnp.floor(v - 0.5)
    fx = (u - 0.5 - x0)[:, None]
    fy = (v - 0.5 - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = fetch(x0i, y0i)
    c10 = fetch(x0i + 1, y0i)
    c01 = fetch(x0i, y0i + 1)
    c11 = fetch(x0i + 1, y0i + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)
