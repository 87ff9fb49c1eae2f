"""Differentiable rendering: gradients of image losses w.r.t. scene params.

The reference renderer is forward-only; differentiability is a new,
first-class capability of this framework (BASELINE.json north star: pixel
gradients w.r.t. material parameters — albedo/roughness/emission — and
light parameters, matching finite differences).

Estimator: detached sampling. All sampling decisions (BSDF directions,
light picks, RR) are pure functions of the counter-based RNG
(core/rng.py), so the primal and differential passes see the *same* path
set; `stop_gradient` on directions/pdfs (integrate/pathtrace.py) makes the
backward pass re-evaluate BSDFs/emission along those fixed paths — exactly
the reference's ReconstructBsdf replay trick (Materials.cginc:934-981)
turned into an AD strategy. Geometry/silhouette gradients are out of scope
(standard for detached estimators).

The trainable set is a pytree of selected MaterialTable columns (+ env
intensity and analytic-light radiance), so `jax.grad` and optax optimizers
plug in directly.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera, Scene

DEFAULT_PARAM_KEYS = ("base_color", "roughness", "emission", "metallic")


def get_material_params(scene: Scene, keys=DEFAULT_PARAM_KEYS
                        ) -> Dict[str, jnp.ndarray]:
    return {k: getattr(scene.materials, k) for k in keys}


def set_material_params(scene: Scene, params: Dict[str, jnp.ndarray]
                        ) -> Scene:
    return scene.replace(materials=scene.materials.replace(**params))


@partial(jax.jit, static_argnames=("cfg", "spp"))
def render_loss_and_grad(scene: Scene, cam: Camera, cfg: RenderConfig,
                         target: jnp.ndarray, spp: int = 8,
                         base_sample: int = 0):
    """L2 image loss against `target` [H,W,3] + gradients w.r.t. the
    default material parameter set. Returns (loss, grads dict, image)."""
    params = get_material_params(scene)

    def loss_fn(p):
        sc = set_material_params(scene, p)
        img = render(sc, cam, cfg, spp=spp, base_sample=base_sample)
        return jnp.mean((img - target) ** 2), img

    (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, grads, img
