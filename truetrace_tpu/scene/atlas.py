"""Texture atlas: host-side packing + device-side sampling, with mips.

Counterpart of the reference's atlasing pipeline (AssetManager.CreateAtlas
AssetManager.cs:396-533 packing via RectpackSharp + CopyTextureShader blits;
rect UV transform CommonData.cginc:569-591). TPU differences: no BCn
compression (XLA gathers from a dense f32 array; bandwidth is traded for
gather-friendliness), one shelf-packed RGBA atlas per scene.

Mip chain: every rect is 16-aligned, so levels 1..4 are exact 2x2-average
downscales of the whole atlas with rect coordinates simply shifted right.
The chain is stacked below level 0 in one image; `level_y[k]` gives each
level's row origin. Per-ray LOD comes from the integrator's ray cones
(pathtrace.py) — the TPU-friendly stand-in for the reference's
hardware-derivative texture fetches.

Sampling is a pure function (kernels can fuse it): wrap-repeat inside the
texture's rect, bilinear filter, optional nearest-mip select.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

ALIGN = 16          # rect alignment; supports 4 clean mip levels
N_MIPS = 4


def _pad_align(img: np.ndarray) -> np.ndarray:
    """Edge-clamp pad H/W up to multiples of ALIGN (keeps mips bleed-free)."""
    h, w = img.shape[:2]
    ph = (-h) % ALIGN
    pw = (-w) % ALIGN
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return img


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
            # grayscale -> RGB + OPAQUE alpha (alpha channel feeds the
            # cutout path; replicating the value would punch holes)
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones_like(img[..., :1])], axis=-1)
        self.images.append(_pad_align(img.astype(np.float32)))
        return len(self.images) - 1

    def build(self, mips: int = N_MIPS
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (atlas [AHm,AW,4] f32 with the mip chain stacked below
        level 0, rects [N,4] i32 (x,y,w,h in level-0 texels),
        level_y [mips] i32 row origins)."""
        if not self.images:
            return (np.zeros((1, 1, 4), np.float32),
                    np.zeros((0, 4), np.int32),
                    np.zeros((max(mips, 1),), np.int32))
        order = sorted(range(len(self.images)),
                       key=lambda i: -self.images[i].shape[0])
        rects = np.zeros((len(self.images), 4), np.int32)
        shelf_y = 0
        shelf_h = 0
        x = 0
        aw = min(self.max_width,
                 max(int(np.ceil(np.sqrt(
                     sum(im.shape[0] * im.shape[1]
                         for im in self.images)))),
                     max(im.shape[1] for im in self.images)))
        aw = aw + ((-aw) % ALIGN)
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
        ah = ah + ((-ah) % ALIGN)
        level0 = np.zeros((ah, aw, 4), np.float32)
        for i, im in enumerate(self.images):
            rx, ry, w, h = rects[i]
            level0[ry:ry + h, rx:rx + w] = im

        # stacked mip chain (2x2 box filter per level)
        levels = [level0]
        for _ in range(1, mips):
            prev = levels[-1]
            hh, ww = prev.shape[0] // 2, prev.shape[1] // 2
            if hh < 1 or ww < 1:
                break
            down = prev[:hh * 2, :ww * 2].reshape(hh, 2, ww, 2, 4
                                                  ).mean(axis=(1, 3))
            levels.append(down.astype(np.float32))
        level_y = np.zeros((len(levels),), np.int32)
        y = 0
        padded = []
        for k, lv in enumerate(levels):
            level_y[k] = y
            row = np.zeros((lv.shape[0], aw, 4), np.float32)
            row[:, :lv.shape[1]] = lv
            padded.append(row)
            y += lv.shape[0]
        return np.concatenate(padded, axis=0), rects, level_y


def transform_uv(uv, scale_offset, rot):
    """Per-material UV transform (reference AlignUV,
    CommonData.cginc:569-591): uv' = uv * scale.xy + offset.zw, wrapped,
    then rotated by `rot` radians about (0.5, 0.5) and re-wrapped.

    uv [R,2]; scale_offset [R,4] (sx, sy, ox, oy); rot [R] radians.
    Identity rows ((1,1,0,0), rot 0) pass uv through bit-near-exactly
    (wrapping is deferred to sample_atlas's own repeat)."""
    out = uv * scale_offset[:, 0:2] + scale_offset[:, 2:4]
    s = jnp.sin(rot)[:, None]
    c = jnp.cos(rot)[:, None]
    w = out % 1.0 - 0.5
    rot_uv = jnp.concatenate([w[:, 0:1] * c - w[:, 1:2] * s,
                              w[:, 0:1] * s + w[:, 1:2] * c], axis=1) + 0.5
    return jnp.where((rot != 0.0)[:, None], rot_uv % 1.0, out)


def sample_atlas(atlas: jnp.ndarray, rects: jnp.ndarray, tex_id, uv,
                 bilinear: bool = True, lod=None,
                 level_y: Optional[jnp.ndarray] = None):
    """Sample texture `tex_id` [R] at uv [R,2] (wrap-repeat). Returns
    [R,4]. tex_id < 0 lanes return ones (callers select).

    lod: optional [R] mip level (float; nearest mip is used). Requires
    `level_y` from AtlasBuilder.build; None = level 0."""
    safe_id = jnp.maximum(tex_id, 0)
    r = rects[safe_id]                       # [R,4] x,y,w,h (level 0)
    if lod is not None and level_y is not None and level_y.shape[0] > 1:
        M = level_y.shape[0]
        k = jnp.clip(jnp.round(lod).astype(jnp.int32), 0, M - 1)
        rx = r[:, 0] >> k
        ry = (r[:, 1] >> k) + level_y[k]
        rw = jnp.maximum(r[:, 2] >> k, 1)
        rh = jnp.maximum(r[:, 3] >> k, 1)
    else:
        rx, ry = r[:, 0], r[:, 1]
        rw = jnp.maximum(r[:, 2], 1)
        rh = jnp.maximum(r[:, 3], 1)
    w = rw.astype(jnp.float32)
    h = rh.astype(jnp.float32)
    u = (uv[:, 0] % 1.0) * w
    v = (uv[:, 1] % 1.0) * h

    def fetch(xi, yi):
        x = rx + (xi % rw)
        y = ry + (yi % rh)
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
