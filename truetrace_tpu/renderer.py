"""Frame orchestrator: the user-facing renderer.

Counterpart of the reference's RayTracingMaster + RenderHandle
(RayTracingMaster.cs:906-1231 `Render`/`RenderImage`: raygen -> bounce loop
-> ReSTIR -> radiance cache resolve -> denoise -> post -> accumulate), as a
pure-functional frame step over an explicit `FrameState` pytree. One
`Renderer` owns the static configuration (the reference's ~50 inspector
fields, SURVEY.md section 5.6 tier 2); per-frame state is threaded
functionally so the whole step jits, shards, and checkpoints.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from truetrace_tpu.integrate.pathtrace import (
    RenderConfig, render_sample_with_stats)
from truetrace_tpu.integrate.radiance_cache import (
    RadianceCache, cache_resolve, render_sample_cached)
from truetrace_tpu.integrate.restir import ReSTIRState, restir_gi_step
from truetrace_tpu.integrate.restir_di import ReSTIRDIState, restir_di_step
from truetrace_tpu.post.asvgf import (ASVGFState, asvgf_step,
                                       restir_asvgf_step)
from truetrace_tpu.post.pipeline import Accumulator, PostConfig, postprocess
from truetrace_tpu.post.recur import ReCurState, recur_denoise
from truetrace_tpu.post.svgf import SVGFState, svgf_denoise
from truetrace_tpu.scene.ir import Camera, Scene


@dataclass(frozen=True)
class RendererConfig:
    """Tier-2 runtime settings (reference RayTracingMaster.cs:170-227)."""
    width: int = 512
    height: int = 512
    bounces: int = 6
    bsdf: str = "disney"
    traversal: str = "wavefront"
    light_sampling: str = "tree"
    use_nee: bool = True
    denoiser: str = "none"          # none | svgf | asvgf | recur | neural
                                    # (use_restir + "asvgf" = ReSTIR-ASVGF)
    neural_weights: str = ""        # msgpack path for denoiser="neural"
                                    # (scripts/train_denoiser.py output)
    use_restir: bool = False
    use_restir_di: bool = False     # direct light via ReSTIR DI reservoirs
    use_radiance_cache: bool = False
    cache_query_bounce: int = 2
    cache_capacity: int = 1 << 20
    post: PostConfig = field(default_factory=PostConfig)

    def render_config(self) -> RenderConfig:
        return RenderConfig(
            width=self.width, height=self.height, bounces=self.bounces,
            bsdf=self.bsdf, traversal=self.traversal,
            light_sampling=self.light_sampling, use_nee=self.use_nee,
            restir_capture=self.use_restir,
            cache_capture=self.use_radiance_cache,
            cache_query_bounce=(self.cache_query_bounce
                                if self.use_radiance_cache else -1))


class FrameState(NamedTuple):
    accum: Accumulator
    sample: jnp.ndarray                 # [] int32 next sample id
    svgf: Optional[SVGFState]
    asvgf: Optional[ASVGFState]
    recur: Optional[ReCurState]
    restir: Optional[ReSTIRState]
    restir_di: Optional[ReSTIRDIState]
    cache: Optional[RadianceCache]
    taa_history: Optional[jnp.ndarray]
    prev_cam: Optional[Camera] = None   # last frame's camera (motion vecs)


class Renderer:
    """Owns scene + config; `step` advances one frame."""

    def __init__(self, scene: Scene, cam: Camera, cfg: RendererConfig):
        self.scene = scene
        self.cam = cam
        self.cfg = cfg
        self.rcfg = cfg.render_config()
        self.neural_params = None
        if cfg.denoiser == "neural":
            import os
            from flax import serialization
            from truetrace_tpu.post.neural import init_params
            self.neural_params = init_params(
                jax.random.PRNGKey(0), cfg.height, cfg.width)
            if cfg.neural_weights and os.path.exists(cfg.neural_weights):
                with open(cfg.neural_weights, "rb") as f:
                    self.neural_params = serialization.from_bytes(
                        self.neural_params, f.read())

    def init_state(self) -> FrameState:
        h, w = self.cfg.height, self.cfg.width
        return FrameState(
            accum=Accumulator.create(h, w),
            sample=jnp.int32(0),
            svgf=SVGFState.create(h, w)
            if self.cfg.denoiser == "svgf"
            or (self.cfg.use_restir and self.cfg.denoiser == "asvgf")
            else None,
            asvgf=ASVGFState.create(h, w)
            if self.cfg.denoiser == "asvgf" and not self.cfg.use_restir
            else None,
            recur=ReCurState.create(h, w) if self.cfg.denoiser == "recur"
            else None,
            restir=ReSTIRState.create(h, w) if self.cfg.use_restir
            else None,
            restir_di=ReSTIRDIState.create(h, w)
            if self.cfg.use_restir_di else None,
            cache=RadianceCache.create(self.cfg.cache_capacity)
            if self.cfg.use_radiance_cache else None,
            taa_history=None,
            prev_cam=None,
        )

    def reset_accumulation(self, state: FrameState) -> FrameState:
        """Camera moved / scene edited (reference RunUpdate,
        RayTracingMaster.cs:375-392)."""
        return state._replace(accum=state.accum.reset())

    def step(self, state: FrameState, cam: Optional[Camera] = None):
        """One frame: trace (+restir/cache), denoise, accumulate, post.
        Returns (display_image [H,W,3] in [0,1], radiance [H,W,3],
        new_state). Pass `cam` to move the camera — temporal passes
        reproject their history with motion vectors from the previous
        frame's camera (post/motion.py)."""
        cfg = self.cfg
        rcfg = self.rcfg
        if cam is not None:
            import numpy as _np
            moved = not _np.allclose(_np.asarray(cam.c2w),
                                     _np.asarray(self.cam.c2w), atol=1e-7)
            self.cam = cam
            if moved:
                # camera moved: restart progressive accumulation (the
                # reference's RunUpdate, RayTracingMaster.cs:375-392);
                # temporal denoiser/reservoir states survive and are
                # motion-reprojected instead
                state = state._replace(accum=state.accum.reset())
        h, w = cfg.height, cfg.width
        sid = state.sample
        pixel = jnp.arange(h * w, dtype=jnp.uint32)
        new = {}

        if cfg.use_restir_di:
            # direct light from DI reservoirs (integrate/restir_di.py)
            frame, restir_di, _ = restir_di_step(
                self.scene, self.cam, rcfg, state.restir_di, sid,
                prev_cam=state.prev_cam)
            new["restir_di"] = restir_di
            st = None
        elif cfg.use_restir and cfg.denoiser == "asvgf":
            # ReSTIR-ASVGF (reference ReSTIRASVGF.cs): validation
            # gradients drive the filter's history clamp
            frame, restir, svgf, _ = restir_asvgf_step(
                self.scene, self.cam, rcfg, state.restir, state.svgf,
                sid, prev_cam=state.prev_cam)
            new["restir"] = restir
            new["svgf"] = svgf
            st = None
        elif cfg.use_restir:
            img, restir, _ = restir_gi_step(self.scene, self.cam, rcfg,
                                            state.restir, sid,
                                            prev_cam=state.prev_cam)
            new["restir"] = restir
            frame = img
            st = None
        elif cfg.use_radiance_cache:
            rad, cache = render_sample_cached(self.scene, self.cam, rcfg,
                                              state.cache, pixel, sid)
            new["cache"] = cache_resolve(cache)
            frame = rad.reshape(h, w, 3)
            st = None
        elif cfg.denoiser == "asvgf":
            out, asvgf, _ = asvgf_step(self.scene, self.cam, rcfg,
                                       state.asvgf, sid)
            new["asvgf"] = asvgf
            frame = out
            st = None
        else:
            rad, st = render_sample_with_stats(self.scene, self.cam, rcfg,
                                               pixel, sid)
            frame = rad.reshape(h, w, 3)

        motion = None
        if state.prev_cam is not None and st is not None:
            from truetrace_tpu.post.motion import motion_vectors
            motion = motion_vectors(state.prev_cam, self.cam,
                                    st["depth"].reshape(h, w))
        if cfg.denoiser == "svgf" and st is not None:
            frame, svgf = svgf_denoise(
                frame, st["albedo"].reshape(h, w, 3),
                st["normal"].reshape(h, w, 3),
                st["depth"].reshape(h, w), state.svgf, motion=motion)
            new["svgf"] = svgf
        elif cfg.denoiser == "recur" and st is not None:
            frame, recur = recur_denoise(
                frame, st["albedo"].reshape(h, w, 3),
                st["normal"].reshape(h, w, 3),
                st["depth"].reshape(h, w), state.recur, motion=motion)
            new["recur"] = recur
        elif cfg.denoiser == "neural" and st is not None:
            # the OIDN slot: learned U-Net on (color, albedo, normal)
            from truetrace_tpu.post.neural import denoise as neural_denoise
            frame = neural_denoise(self.neural_params, frame,
                                   st["albedo"].reshape(h, w, 3),
                                   st["normal"].reshape(h, w, 3))

        accum = state.accum.add(frame)
        display, taa_hist = postprocess(accum.image, cfg.post,
                                        state.taa_history)
        new_state = state._replace(
            accum=accum, sample=sid + 1, taa_history=taa_hist,
            prev_cam=self.cam, **new)
        return display, accum.image, new_state
