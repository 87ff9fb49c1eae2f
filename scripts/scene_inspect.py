"""CLI scene inspector (the reference editor panels, headless):

    python scripts/scene_inspect.py path/to/manifest.json
    python scripts/scene_inspect.py --builtin atrium --detail 1.5

Prints stats + validation findings; exit code 1 on errors."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DEMO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest", nargs="?", help="scene manifest JSON")
    ap.add_argument("--builtin", choices=["atrium", "cornell", "sponza"],
                    help="inspect a built-in scene instead")
    ap.add_argument("--detail", type=float, default=1.5)
    args = ap.parse_args()

    from truetrace_tpu.scene.mesh import compile_scene
    from truetrace_tpu.tools.inspector import inspect_scene

    if args.manifest:
        from truetrace_tpu.scene.manifest import load_manifest
        scene, cam, cfg = load_manifest(args.manifest)
    elif args.builtin == "cornell":
        from truetrace_tpu.scene import cornell
        meshes, mats, cam = cornell.make()
        scene = compile_scene(meshes, mats, with_cwbvh=True)
    elif args.builtin == "sponza":
        from truetrace_tpu.scene import sponza_like
        meshes, mats, atlas, rects, level_y, cam, env = sponza_like.make(
            args.detail)
        scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                              atlas=atlas, atlas_rects=rects,
                              atlas_level_y=level_y)
    else:
        from truetrace_tpu.scene import atrium
        meshes, mats, cam, env = atrium.make(detail=args.detail)
        scene = compile_scene(meshes, mats, env=env, with_cwbvh=True,
                              with_light_bvh=True)

    report = inspect_scene(scene)
    print(report.render())
    sys.exit(0 if report.ok() else 1)


if __name__ == "__main__":
    main()
