"""Video textures: animated atlas slots (reference VideoObject.cs — a
Unity VideoPlayer rendering into a 1920x1080 RT that the shade kernel
samples as an emissive/albedo texture, RayTracingShader.compute:630).

TPU design: the video's frames live on device as one [N,H,W,4] stack; per
rendered frame the current video frame is written into the texture's
atlas rect with one `dynamic_update_slice` (pure function -> works under
jit, and the scene stays a single pytree). Any material slot
(albedo/emission/...) can point at the video's texture id, matching the
reference's video-textured emissive surfaces.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from truetrace_tpu.scene.atlas import AtlasBuilder, _pad_align
from truetrace_tpu.scene.ir import Scene


@dataclass
class VideoTexture:
    """A registered video: atlas slot + device-resident frame stack."""
    tex_id: int
    frames: jnp.ndarray      # [N,H,W,4] f32
    fps: float = 30.0

    @property
    def n_frames(self) -> int:
        return self.frames.shape[0]


def register_video(builder: AtlasBuilder, frames: np.ndarray,
                   fps: float = 30.0) -> VideoTexture:
    """Reserve an atlas rect sized like one frame; returns the handle.
    `frames`: [N,H,W,C] uint8 or float."""
    f = np.asarray(frames)
    if f.dtype == np.uint8:
        f = f.astype(np.float32) / 255.0
    if f.shape[-1] == 3:
        f = np.concatenate([f, np.ones_like(f[..., :1])], axis=-1)
    f = np.stack([_pad_align(fr) for fr in f])
    tex_id = builder.add(f[0])
    return VideoTexture(tex_id=tex_id, frames=jnp.asarray(f, jnp.float32),
                        fps=fps)


def bind_video_frame(scene: Scene, video: VideoTexture, frame_index
                     ) -> Scene:
    """Return a scene whose atlas shows `frame_index` (traced value OK —
    jit-safe; wraps around the clip length)."""
    import jax.lax
    idx = jnp.asarray(frame_index, jnp.int32) % video.n_frames
    frame = video.frames[idx]                       # [H,W,4]
    rect = scene.atlas_rects[video.tex_id]          # (x,y,w,h) static slot
    # update EVERY mip level: the integrator samples albedo through
    # ray-cone LOD (atlas.sample_atlas level_y), so a level-0-only write
    # would leave stale first-frame content wherever lod rounds to >= 1
    atlas = scene.atlas
    n_levels = int(scene.atlas_level_y.shape[0])
    lv = frame
    for k in range(n_levels):
        if lv.shape[0] < 1 or lv.shape[1] < 1:
            break
        atlas = jax.lax.dynamic_update_slice(
            atlas, lv,
            ((rect[1] >> k) + scene.atlas_level_y[k], rect[0] >> k,
             jnp.int32(0)))
        hh, ww = lv.shape[0] // 2, lv.shape[1] // 2
        if hh < 1 or ww < 1:
            break
        lv = lv[:hh * 2, :ww * 2].reshape(hh, 2, ww, 2, 4).mean(axis=(1, 3))
    return scene.replace(atlas=atlas)


def bind_video_time(scene: Scene, video: VideoTexture, t_seconds) -> Scene:
    """Bind by wall-clock time (frame = floor(t * fps))."""
    return bind_video_frame(
        scene, video, (jnp.asarray(t_seconds, jnp.float32)
                       * video.fps).astype(jnp.int32))
