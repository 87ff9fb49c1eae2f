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
from truetrace_tpu.integrate.restir import ReSTIRState
from truetrace_tpu.integrate.restir_di import ReSTIRDIState
from truetrace_tpu.post.asvgf import ASVGFState
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
                                    # | neural_taa (U-Net + clamped
                                    # temporal blend: the matrix showed
                                    # plain neural flickers ~3x the
                                    # temporal filters)
                                    # (use_restir + "asvgf" = ReSTIR-ASVGF)
    neural_weights: str = ""        # msgpack path for denoiser="neural"
                                    # (scripts/train_denoiser.py output)
    use_restir: bool = False
    use_restir_di: bool = False     # direct light via ReSTIR DI reservoirs
    use_radiance_cache: bool = False
    cache_query_bounce: int = 2
    cache_capacity: int = 1 << 20
    # temporal upscaling (reference TAAU.compute): render at
    # width/upscale x height/upscale with a per-frame Halton subpixel
    # jitter and reconstruct the full-res frame temporally
    # (post/pipeline.py taau_upscale). 1 = off.
    upscale: int = 1
    # partial rendering: trace only 1/k of the pixels per frame (rolling
    # interleave) and reuse the previous frame's radiance/G-buffers for
    # the rest, motion-reprojected on camera moves — the reference's
    # interactivity lever (DoPartialRendering,
    # RayTracingShader.compute:91-97: only raygen is gated; every
    # downstream pass runs full-res on the composed buffers). 1 = off.
    # Composes with ReSTIR GI/DI (stale pixels submit no fresh candidate;
    # reservoirs persist), the radiance cache and TAAU. Progressive
    # accumulation stays unbiased (stale pixels repeat their own past
    # samples), it just converges k-x slower.
    partial_rendering: int = 1
    # insert jax.lax.optimization_barrier between the integrator outputs
    # and the image-space pipeline: stops XLA from fusing/layout-
    # propagating the post ops into the wavefront loop (the round-5
    # composed-plain anomaly: identical flops, ~+210 ms runtime when the
    # traced radiance flowed straight into accumulate/post on axon)
    step_barrier: bool = False
    post: PostConfig = field(default_factory=PostConfig)

    @property
    def internal_size(self):
        s = max(self.upscale, 1)
        return self.height // s, self.width // s

    def render_config(self) -> RenderConfig:
        ih, iw = self.internal_size
        return RenderConfig(
            width=iw, height=ih, bounces=self.bounces,
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
    taau_history: Optional[jnp.ndarray] = None  # full-res TAAU history
    # partial-rendering persistence: dict of full-res flat buffers the
    # 1/k traced subset scatters into (rad/albedo/normal/depth/emitted0
    # always; + direct/x1/mat1 for ReSTIR GI, di_x1/di_n/di_d for the
    # ReSTIR DI prepass G-buffer)
    partial: Optional[dict] = None
    # temporal auto-exposure state (post/pipeline.py
    # auto_exposure_temporal); -1 = cold start
    exposure: Optional[jnp.ndarray] = None
    # last frame's per-instance l2w rows [I,3,4] — with the primary-hit
    # instance G-buffer these give per-OBJECT motion vectors
    # (post/motion.py motion_vectors_objects; reference engine
    # MotionVectors, RayGenKernels.compute:78-82)
    prev_inst_l2w: Optional[jnp.ndarray] = None
    # denoiser="neural_taa": previous denoised frame (internal res) for
    # the motion-reprojected clamped temporal blend
    neural_hist: Optional[jnp.ndarray] = None


class Renderer:
    """Owns scene + config; `step` advances one frame."""

    def __init__(self, scene: Scene, cam: Camera, cfg: RendererConfig):
        self.scene = scene
        self.cam = cam
        self.cfg = cfg
        self.rcfg = cfg.render_config()
        self.neural_params = None
        if cfg.denoiser in ("neural", "neural_taa"):
            import os
            from flax import serialization
            from truetrace_tpu.post.neural import init_params
            self.neural_params = init_params(
                jax.random.PRNGKey(0), cfg.height, cfg.width)
            if cfg.neural_weights and os.path.exists(cfg.neural_weights):
                with open(cfg.neural_weights, "rb") as f:
                    self.neural_params = serialization.from_bytes(
                        self.neural_params, f.read())

    def jit_step(self, cam_moved: bool = False):
        """Jitted composed frame `(state, scene, cam) -> (display,
        radiance, new_state)` with scene and camera as traced ARGUMENTS.

        Always prefer this over `jax.jit(lambda st: r.step(st))`: a
        closure bakes the scene tables into the HLO as constants, which
        on the axon backend costs ~+220 ms/frame on the 512^2x4 plain
        frame (736 vs 516 ms — round-5 probe, BASELINE.md 'composed-
        plain anomaly') on top of the compile-size limit (CLAUDE.md).

        cam_moved is static (True = reset accumulation every frame, the
        interactive-camera mode). NOTE: after the first call,
        `self.scene`/`self.cam` hold leaked tracers — interact with the
        renderer only through the returned function (or re-assign real
        arrays before eager use)."""
        @jax.jit
        def frame(state, scene, cam):
            self.scene = scene
            self.cam = cam
            if cam_moved:
                # step() only auto-resets when it receives cam= itself
                state = state._replace(accum=state.accum.reset())
            return self.step(state, cam_moved=cam_moved)
        return frame

    def _init_partial(self, ih, iw):
        """Full-res compose buffers for partial rendering (see
        FrameState.partial)."""
        R = ih * iw
        p = dict(rad=jnp.zeros((R, 3)), albedo=jnp.ones((R, 3)),
                 normal=jnp.zeros((R, 3)), depth=jnp.zeros((R,)),
                 emitted0=jnp.zeros((R, 3)),
                 inst=jnp.full((R,), -1, jnp.int32))
        if self.cfg.use_restir:
            p.update(direct=jnp.zeros((R, 3)), x1=jnp.zeros((R, 3)),
                     mat1=jnp.zeros((R,), jnp.int32))
        if self.cfg.use_restir_di:
            p.update(di_x1=jnp.zeros((R, 3)), di_n=jnp.zeros((R, 3)),
                     di_d=jnp.zeros((R,)))
        return p

    def init_state(self) -> FrameState:
        # trace-resolution states live at the internal (pre-upscale) size;
        # accumulation / TAA / TAAU history at the output size
        h, w = self.cfg.height, self.cfg.width
        ih, iw = self.cfg.internal_size
        return FrameState(
            accum=Accumulator.create(h, w),
            sample=jnp.int32(0),
            svgf=SVGFState.create(ih, iw)
            if self.cfg.denoiser == "svgf" else None,
            asvgf=ASVGFState.create(ih, iw)
            if self.cfg.denoiser == "asvgf" else None,
            recur=ReCurState.create(ih, iw) if self.cfg.denoiser == "recur"
            else None,
            restir=ReSTIRState.create(ih, iw) if self.cfg.use_restir
            else None,
            restir_di=ReSTIRDIState.create(ih, iw)
            if self.cfg.use_restir_di else None,
            cache=RadianceCache.create(self.cfg.cache_capacity)
            if self.cfg.use_radiance_cache else None,
            taa_history=None,
            prev_cam=None,
            partial=self._init_partial(ih, iw)
            if self.cfg.partial_rendering > 1 else None,
            exposure=jnp.float32(-1.0) if self.cfg.post.auto_expose
            else None,
            neural_hist=jnp.zeros((ih, iw, 3), jnp.float32)
            if self.cfg.denoiser == "neural_taa" else None,
        )

    def reset_accumulation(self, state: FrameState) -> FrameState:
        """Camera moved / scene edited (reference RunUpdate,
        RayTracingMaster.cs:375-392)."""
        return state._replace(accum=state.accum.reset())

    def step(self, state: FrameState, cam: Optional[Camera] = None,
             scene: Optional[Scene] = None,
             cam_moved: Optional[bool] = None):
        """One frame: trace (+restir/cache), denoise, accumulate, post.
        Returns (display_image [H,W,3] in [0,1], radiance [H,W,3],
        new_state). Pass `cam` to move the camera — temporal passes
        reproject their history with motion vectors from the previous
        frame's camera (post/motion.py). Pass `scene` for dynamic
        geometry (scene/dynamic.py pose_scene or
        scene/instances.py update_instance_transforms output): progressive
        accumulation restarts, temporal denoiser states survive — the
        reference's RunUpdate policy (RayTracingMaster.cs:375-392)."""
        cfg = self.cfg
        rcfg = self.rcfg

        def _motion(depth_img, inst_flat=None):
            """Per-pixel motion vectors: per-OBJECT when the scene is
            instanced and last frame's transforms are known, else
            camera-only (post/motion.py)."""
            if state.prev_cam is None:
                return None
            from truetrace_tpu.post.motion import (motion_vectors,
                                                   motion_vectors_objects)
            if (inst_flat is not None and state.prev_inst_l2w is not None
                    and self.scene.inst_l2w is not None):
                return motion_vectors_objects(
                    state.prev_cam, self.cam, depth_img,
                    inst_flat.reshape(depth_img.shape),
                    state.prev_inst_l2w, self.scene.inst_l2w)
            return motion_vectors(state.prev_cam, self.cam, depth_img)

        if scene is not None:
            self.scene = scene
            state = state._replace(accum=state.accum.reset())
        if cam is not None:
            if cam_moved is None:
                # eager path: detect movement by value. Under jit, pass
                # cam_moved explicitly (tracers cannot be np-compared)
                import numpy as _np
                cam_moved = not _np.allclose(
                    _np.asarray(cam.c2w), _np.asarray(self.cam.c2w),
                    atol=1e-7)
            self.cam = cam
            if cam_moved:
                # camera moved: restart progressive accumulation (the
                # reference's RunUpdate, RayTracingMaster.cs:375-392);
                # temporal denoiser/reservoir states survive and are
                # motion-reprojected instead
                state = state._replace(accum=state.accum.reset())
        if cam_moved is None:
            cam_moved = False
        h, w = cfg.internal_size      # trace resolution (upscale>1: low)
        sid = state.sample
        pixel = jnp.arange(h * w, dtype=jnp.uint32)
        k = cfg.partial_rendering
        if k > 1:
            if (h * w) % k:
                raise ValueError("partial_rendering must divide the "
                                 "pixel count")
            # rolling 1/k interleave (reference DoPartialRendering,
            # RayTracingShader.compute:91-97); static subset shape.
            # Only raygen is gated — every downstream pass (ReSTIR,
            # cache, denoise, TAAU) runs full-res on composed buffers,
            # exactly like the reference.
            pixel = (jnp.arange((h * w) // k, dtype=jnp.uint32) * k
                     + jnp.asarray(sid, jnp.uint32) % k)
        new = {}
        P = dict(state.partial) if k > 1 else None
        if k > 1 and cam_moved and state.prev_cam is not None:
            # motion-reproject the persistent compose buffers so stale
            # pixels track the new view (fresh subset overwrites after)
            mv = _motion(P["depth"].reshape(h, w), P["inst"])
            ys = jnp.clip(jnp.round(jnp.arange(h)[:, None]
                                    - mv[..., 1]).astype(jnp.int32),
                          0, h - 1)
            xs = jnp.clip(jnp.round(jnp.arange(w)[None, :]
                                    - mv[..., 0]).astype(jnp.int32),
                          0, w - 1)
            P = {key: buf.reshape((h, w) + buf.shape[1:])[ys, xs]
                 .reshape(buf.shape) for key, buf in P.items()}
        # TAAU jitter sequence: one Halton subpixel offset per frame so
        # the temporal upscaler knows where this frame's samples landed
        jitter = None
        if cfg.upscale > 1:
            from truetrace_tpu.post.pipeline import taau_jitter
            jitter = taau_jitter(sid)

        # ---- ReSTIR DI prepass: primary G-buffer feeds reservoir reuse;
        # the chosen light samples drive the main trace's bounce-0 NEE
        # (composed, not exclusive — reference runs its RIS selection
        # inside the one shade kernel, RayTracingMaster.cs:954-1131)
        di_sample = None
        if cfg.use_restir_di:
            from truetrace_tpu.integrate.restir_di import (
                restir_di_reservoirs)
            gcfg = rcfg.replace(bounces=1, use_nee=False,
                                restir_capture=True, cache_capture=False,
                                cache_query_bounce=-1)
            _, gst = render_sample_with_stats(self.scene, self.cam, gcfg,
                                              pixel, sid)
            if k > 1:
                # compose the prepass G-buffer: fresh subset + stale rest
                P["di_x1"] = P["di_x1"].at[pixel].set(gst["x1"])
                P["di_n"] = P["di_n"].at[pixel].set(gst["normal"])
                P["di_d"] = P["di_d"].at[pixel].set(gst["depth"])
                g_x1, g_n, g_d = P["di_x1"], P["di_n"], P["di_d"]
            else:
                g_x1, g_n, g_d = gst["x1"], gst["normal"], gst["depth"]
            di_motion = (_motion(g_d.reshape(h, w), gst["inst"])
                         if k == 1 else None)
            di_sample, di_state = restir_di_reservoirs(
                self.scene, self.cam, rcfg, state.restir_di, sid,
                g_x1.reshape(h, w, 3), g_n.reshape(h, w, 3),
                g_d.reshape(h, w), prev_cam=state.prev_cam,
                motion=di_motion)
            new["restir_di"] = di_state
            if k > 1:
                # the main trace only shades the fresh subset
                di_sample = jax.tree_util.tree_map(lambda a: a[pixel],
                                                   di_sample)

        # ---- the ONE wavefront trace: integrator + ReSTIR captures +
        # radiance-cache records all come out of this single bounce loop
        if cfg.use_radiance_cache:
            rad, st, cache = render_sample_cached(
                self.scene, self.cam, rcfg, state.cache, pixel, sid,
                di_sample=di_sample, jitter=jitter)
            if cam_moved and state.prev_cam is not None:
                # camera-motion reprojection merge: re-leveled cells
                # inherit their previous-level accumulation (reference
                # GetReprojectedHash, CommonData.cginc:1764)
                new["cache"] = cache_resolve(
                    cache, cam_pos=self.cam.c2w[3, :3],
                    prev_cam_pos=state.prev_cam.c2w[3, :3])
            else:
                new["cache"] = cache_resolve(cache)
        else:
            rad, st = render_sample_with_stats(self.scene, self.cam, rcfg,
                                               pixel, sid,
                                               di_sample=di_sample,
                                               jitter=jitter)
        if cfg.step_barrier:
            rad, st = jax.lax.optimization_barrier((rad, st))
        if k > 1:
            # compose the full frame: stale pixels keep (reprojected)
            # previous values, the traced subset scatters fresh ones
            # (camera-move reprojection already applied to P above)
            for key, src in (("rad", rad), ("albedo", st["albedo"]),
                             ("normal", st["normal"]),
                             ("depth", st["depth"]),
                             ("emitted0", st["emitted0"]),
                             ("inst", st["inst"])):
                P[key] = P[key].at[pixel].set(src)
            rad = P["rad"]
            comp = dict(st, albedo=P["albedo"], normal=P["normal"],
                        depth=P["depth"], emitted0=P["emitted0"],
                        inst=P["inst"])
            if cfg.use_restir:
                # persistent channels (final shade reads every pixel);
                # candidate channels scatter into ZEROS — stale pixels
                # submit no fresh candidate, their reservoirs persist
                # (the reference's behavior: raygen-only gating)
                for key, src in (("direct", st["direct"]),
                                 ("x1", st["x1"]), ("mat1", st["mat1"])):
                    P[key] = P[key].at[pixel].set(src)
                comp.update(direct=P["direct"], x1=P["x1"],
                            mat1=P["mat1"])
                R_full = h * w
                for key, src in (("x2", st["x2"]), ("n2", st["n2"]),
                                 ("tp1", st["tp1"]),
                                 ("indirect", st["indirect"])):
                    comp[key] = jnp.zeros((R_full,) + src.shape[1:],
                                          src.dtype).at[pixel].set(src)
                comp["pdf1"] = jnp.zeros((R_full,), jnp.float32
                                         ).at[pixel].set(st["pdf1"])
                comp["cand_valid"] = jnp.zeros(
                    (R_full,), st["cand_valid"].dtype
                ).at[pixel].set(st["cand_valid"])
            new["partial"] = P
            st = comp
        frame = rad.reshape(h, w, 3)
        albedo = st["albedo"].reshape(h, w, 3)
        normal = st["normal"].reshape(h, w, 3)
        depth = st["depth"].reshape(h, w)
        emissive = st["emitted0"].reshape(h, w, 3)
        gradient = None
        motion = _motion(depth, st.get("inst"))

        # ---- ReSTIR GI: reservoir-shaded indirect replaces the traced
        # indirect; its temporal-validation gradients feed ASVGF below
        if cfg.use_restir:
            from truetrace_tpu.integrate.restir import restir_gi_from_stats
            frame, restir, aux = restir_gi_from_stats(
                self.scene, self.cam, rcfg, state.restir, sid, st,
                prev_cam=state.prev_cam, motion=motion)
            new["restir"] = restir
            gradient = aux["gradient"]

        # ---- denoise
        if cfg.denoiser == "svgf":
            frame, svgf = svgf_denoise(frame, albedo, normal, depth,
                                       state.svgf, motion=motion,
                                       emissive=emissive)
            new["svgf"] = svgf
        elif cfg.denoiser == "asvgf":
            from truetrace_tpu.post.asvgf import (asvgf_filter,
                                                  asvgf_gradient,
                                                  gradient_alpha)
            ast = state.asvgf
            if cfg.use_restir:
                # ReSTIR-ASVGF (reference ReSTIRASVGF.compute): the GI
                # temporal-validation gradients drive the history clamp —
                # no replay stratum, no extra trace
                alpha_map, _ = gradient_alpha(gradient, h, w)
                cur_lum, s2 = ast.prev_lum, jnp.asarray(sid, jnp.uint32)
            else:
                alpha_map, _, cur_lum, s2 = asvgf_gradient(
                    self.scene, self.cam, rcfg, ast, sid, rad)
            frame, svgf_state, lf_hist, lf_len = asvgf_filter(
                frame, albedo, normal, depth, ast, alpha_map,
                motion=motion, emissive=emissive)
            new["asvgf"] = ASVGFState(svgf=svgf_state, prev_lum=cur_lum,
                                      prev_sid=s2, lf_hist=lf_hist,
                                      lf_len=lf_len)
        elif cfg.denoiser == "recur":
            frame, recur = recur_denoise(frame, albedo, normal, depth,
                                         state.recur, motion=motion,
                                         emissive=emissive)
            new["recur"] = recur
        elif cfg.denoiser in ("neural", "neural_taa"):
            # the OIDN slot: learned U-Net on (color, albedo, normal)
            from truetrace_tpu.post.neural import denoise as neural_denoise
            frame = neural_denoise(self.neural_params, frame, albedo,
                                   normal)
            if cfg.denoiser == "neural_taa":
                # the U-Net has no temporal term and flickers ~3x the
                # temporal filters (denoiser matrix, BASELINE round 5);
                # a motion-reprojected neighborhood-clamped blend on its
                # OUTPUT keeps the PSNR lead and kills the flicker
                from truetrace_tpu.post.pipeline import taa
                frame = taa(frame, state.neural_hist, alpha=0.2,
                            motion=motion)
                new["neural_hist"] = frame

        # ---- firefly suppression before accumulation (reference
        # FireFlyPass.shader blit, RayTracingMaster.cs:1132)
        if cfg.post.firefly > 0.0:
            from truetrace_tpu.post.pipeline import firefly_clamp
            frame = firefly_clamp(frame, cfg.post.firefly)

        if cfg.upscale > 1:
            # temporal upscaling to the output resolution (reference
            # TAAU.compute); the full-res history is its own state
            from truetrace_tpu.post.pipeline import taau_upscale
            frame, taau_hist = taau_upscale(
                frame, state.taau_history, scale=cfg.upscale,
                jitter=jitter, motion=motion)
            new["taau_history"] = taau_hist
            if motion is not None:
                # post-chain TAA runs at output res: scale the vectors
                s = cfg.upscale
                motion = jnp.repeat(jnp.repeat(motion, s, axis=0), s,
                                    axis=1)[:cfg.height, :cfg.width] * s

        if k > 1:
            # warm-up: until every interleave phase has traced once, the
            # composed frame still contains cold (zero) pixels — restart
            # the running mean each of those frames so the accumulator
            # never averages them in (unbiased from frame k-1 on)
            warm = (jnp.asarray(sid) < k - 1).astype(jnp.float32)
            accum = Accumulator(image=state.accum.image * (1.0 - warm),
                                count=state.accum.count * (1.0 - warm))
            accum = accum.add(frame)
        else:
            accum = state.accum.add(frame)
        if state.exposure is not None:
            display, taa_hist, new_exp = postprocess(
                accum.image, cfg.post, state.taa_history, motion=motion,
                exposure_state=state.exposure)
            new["exposure"] = new_exp
        else:
            display, taa_hist = postprocess(accum.image, cfg.post,
                                            state.taa_history,
                                            motion=motion)
        new_state = state._replace(
            accum=accum, sample=sid + 1, taa_history=taa_hist,
            prev_cam=self.cam, prev_inst_l2w=self.scene.inst_l2w, **new)
        return display, accum.image, new_state
