"""Denoiser quality matrix on a SEQUENCE (round-5 VERDICT item 5).

16-frame interactive sequence on the Cornell box at 1 spp/frame:
  frames 0-5   static camera, base lighting
  frame  6     light jumps to 3x (the ASVGF test case — its gradient
               pass exists exactly to unclamp history on lighting change)
  frames 6-10  static camera, bright lighting (adaptation + settle)
  frames 11-15 camera orbits ~2 deg/frame, bright lighting
Accumulation is reset every frame (pure interactive denoiser output);
temporal denoiser state persists across frames like the reference.

Reports per-phase PSNR/SSIM vs per-pose converged references plus
temporal flicker (mean frame-to-frame delta during static-camera
phases) for none/svgf/asvgf/recur/neural.

Usage: PYTHONPATH=/root/repo python scripts/denoiser_matrix.py
Env: TT_DM_OUT (examples/denoiser_matrix.json), TT_DM_REF_SPP (192).
"""
from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from train_denoiser import psnr as _psnr_raw, ssim  # noqa: E402


def _tm(x):
    """Reinhard map to [0,1): metrics on DISPLAY-scale values — raw
    PSNR against the peak (the light's emission, ~15) compresses all
    denoiser differences into fractions of a dB."""
    x = np.clip(x, 0.0, None)
    return x / (1.0 + x)


def psnr(a, b):
    return _psnr_raw(_tm(a), _tm(b))


def main():
    import jax.numpy as jnp
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.renderer import Renderer, RendererConfig
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.ir import Camera
    from truetrace_tpu.scene.mesh import compile_scene

    out_path = os.environ.get("TT_DM_OUT", "examples/denoiser_matrix.json")
    ref_spp = int(os.environ.get("TT_DM_REF_SPP", "192"))
    W = H = 96
    B = 3

    meshes, mats, cam0 = cornell.make()
    scene_a = compile_scene(meshes, mats, with_cwbvh=True,
                            with_light_bvh=True)
    # light change: 3x emission via the live material table (light rows
    # gather emission by mat id — round-4 design keeps edits live)
    scene_b = scene_a.replace(materials=scene_a.materials.replace(
        emission=scene_a.materials.emission * 3.0))

    eye0 = np.asarray(cam0.c2w)[3, :3]

    def orbit_cam(i):
        # lateral truck from the scene's own camera pose (the box spans
        # ~[0, 1.1] with the camera at z=-0.8 — absolute coordinates
        # from another scene's frame rendered black, first two runs)
        dx = 0.06 * i
        return Camera.look_at(eye=(eye0[0] + dx, eye0[1], eye0[2]),
                              target=(eye0[0] + 0.5 * dx, eye0[1], 0.0),
                              fov_y_deg=39.0)

    frames = []
    for i in range(16):
        sc = scene_a if i < 6 else scene_b
        cam = cam0 if i < 11 else orbit_cam(i - 10)
        frames.append((sc, cam))

    # converged per-pose references (poses repeat within static phases)
    rcfg = RenderConfig(width=W, height=H, bounces=B, bsdf="disney",
                        traversal="wavefront", light_sampling="tree")
    ref_cache = {}

    def ref_for(i):
        sc, cam = frames[i]
        key = (id(sc), i if i >= 11 else (0 if i < 6 else 6))
        if key not in ref_cache:
            ref_cache[key] = np.asarray(render(sc, cam, rcfg, spp=ref_spp))
        return ref_cache[key]

    results = {}
    dens = os.environ.get("TT_DM_DENOISERS",
                          "none,svgf,asvgf,recur,neural,neural_taa"
                          ).split(",")
    for den in dens:
        kw = dict(denoiser=den)
        if den.startswith("neural"):
            kw["neural_weights"] = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "examples", "denoiser.msgpack")
        cfg = RendererConfig(width=W, height=H, bounces=B, bsdf="disney",
                             traversal="wavefront", light_sampling="tree",
                             **kw)
        r = Renderer(scene_a, cam0, cfg)

        # jitted frame with scene+camera as ARGUMENTS (Renderer.jit_step
        # — eager steps re-dispatch per op on axon, and a scene CLOSURE
        # bakes constant tables costing ~+220 ms/frame, BASELINE round-5)
        jstep = r.jit_step(cam_moved=True)

        def frame(st, sc, cam):
            st = st._replace(accum=st.accum.reset())
            _, rad, st2 = jstep(st, sc, cam)
            return rad, st2

        st = r.init_state()
        outs = []
        for i, (sc, cam) in enumerate(frames):
            rad, st = frame(st, sc, cam)
            outs.append(np.asarray(rad))
        m = {}
        phases = {"static": range(2, 6), "change": range(6, 9),
                  "settled": range(9, 11), "motion": range(11, 16)}
        for ph, idxs in phases.items():
            ps = [psnr(outs[i], ref_for(i)) for i in idxs]
            ss = [ssim(_tm(outs[i]), _tm(ref_for(i))) for i in idxs]
            m[f"psnr_{ph}"] = round(float(np.mean(ps)), 2)
            m[f"ssim_{ph}"] = round(float(np.mean(ss)), 4)
        flick = [float(np.abs(_tm(outs[i]) - _tm(outs[i - 1])).mean())
                 for i in list(range(3, 6)) + [10]]
        m["flicker_static"] = round(float(np.mean(flick)), 5)
        results[den] = m
        print(den, m, flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
