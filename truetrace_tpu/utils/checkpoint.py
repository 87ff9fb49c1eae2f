"""Checkpoint / resume for long renders and optimization loops.

The reference persists only material edits to XML (RayTracingMaster.cs:
332-340) and resets progressive accumulation on camera moves; a production
TPU framework checkpoints the full render/optimization state (SURVEY.md
section 5.4): accumulated framebuffer + sample count, RNG position,
reservoir / radiance-cache / denoiser state, and trainable material
parameters. Everything here is a pytree, so orbax handles it directly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:          # pragma: no cover
    _HAS_ORBAX = False


def save_render_state(path: str, state: Dict[str, Any]) -> None:
    """state: arbitrary pytree dict, e.g. {"accum": Accumulator,
    "restir": ReSTIRState, "cache": RadianceCache, "svgf": SVGFState,
    "params": material-param dict, "sample": int}."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, state, force=True)
        ckpt.wait_until_finished()
    else:                      # npz fallback
        flat, treedef = jax.tree_util.tree_flatten(state)
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"),
                 *[np.asarray(x) for x in flat])
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))


def restore_render_state(path: str, template: Dict[str, Any]
                         ) -> Optional[Dict[str, Any]]:
    """Restore into the structure of `template` (same pytree shape/dtypes).
    Returns None if no checkpoint exists."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(path, template)
    npz = np.load(os.path.join(path, "state.npz"))
    flat, treedef = jax.tree_util.tree_flatten(template)
    restored = [npz[f"arr_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, restored)
