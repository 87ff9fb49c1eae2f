"""Differentiable rendering: gradients of image losses w.r.t. scene params.

The reference renderer is forward-only; differentiability is a new,
first-class capability of this framework (BASELINE.json north star: pixel
gradients w.r.t. material parameters — albedo/roughness/emission — and
light parameters, matching finite differences).

Estimator: detached sampling. All sampling decisions (BSDF directions,
light picks, RR) are pure functions of the counter-based RNG
(core/rng.py), so the primal and differential passes see the *same* path
set; `stop_gradient` on directions/pdfs/traversal outputs
(integrate/pathtrace.py) makes the backward pass re-evaluate BSDF,
emission, env and light radiance along those fixed paths — the
reference's ReconstructBsdf replay trick (Materials.cginc:934-981) turned
into an AD strategy. Geometry/silhouette gradients are out of scope
(standard for detached estimators), as is env ROTATION (the equirect
lookup is nearest-texel, so its rotation derivative is zero a.e.).

Supported parameter set (all finite-difference gated, tests/test_diff.py):
  * MaterialTable columns: base_color, roughness, emission, metallic, ...
  * env_intensity — environment map scale (EnvMap.intensity)
  * light_radiance — analytic-light radiance table (AnalyticLights)

Backward memory: traversal results are detached, so XLA's while-loop AD
never stores traversal carries; the bounce-loop shading residuals can
additionally be rematerialized with RenderConfig(remat=True), trading
~one extra shading pass for O(state) instead of O(all intermediates)
per bounce (SURVEY.md section 7 M3; measured gate in tests/test_diff.py).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera, Scene

DEFAULT_PARAM_KEYS = ("base_color", "roughness", "emission", "metallic")
SCENE_KEYS = ("env_intensity", "light_radiance")


def get_scene_params(scene: Scene, keys=DEFAULT_PARAM_KEYS,
                     with_env: bool = True, with_lights: bool = True
                     ) -> Dict[str, jnp.ndarray]:
    """Trainable pytree: selected material columns + env/light params."""
    p = {k: getattr(scene.materials, k) for k in keys}
    if with_env:
        p["env_intensity"] = scene.env.intensity
    if with_lights and scene.lights.position.shape[0] > 0:
        p["light_radiance"] = scene.lights.radiance
    return p


def set_scene_params(scene: Scene, params: Dict[str, jnp.ndarray]
                     ) -> Scene:
    mat_p = {k: v for k, v in params.items() if k not in SCENE_KEYS}
    sc = scene.replace(materials=scene.materials.replace(**mat_p))
    if "env_intensity" in params:
        sc = sc.replace(env=sc.env.replace(
            intensity=params["env_intensity"]))
    if "light_radiance" in params:
        sc = sc.replace(lights=sc.lights.replace(
            radiance=params["light_radiance"]))
    return sc


# backwards-compatible aliases (material-only view)
def get_material_params(scene: Scene, keys=DEFAULT_PARAM_KEYS
                        ) -> Dict[str, jnp.ndarray]:
    return get_scene_params(scene, keys, with_env=False, with_lights=False)


def set_material_params(scene: Scene, params: Dict[str, jnp.ndarray]
                        ) -> Scene:
    return set_scene_params(scene, params)


@partial(jax.jit, static_argnames=("cfg", "spp"))
def render_loss_and_grad(scene: Scene, cam: Camera, cfg: RenderConfig,
                         target: jnp.ndarray, spp: int = 8,
                         base_sample: int = 0):
    """L2 image loss against `target` [H,W,3] + gradients w.r.t. the full
    scene parameter set (materials + env intensity + light radiance).
    Returns (loss, grads dict, image)."""
    params = get_scene_params(scene)

    def loss_fn(p):
        sc = set_scene_params(scene, p)
        img = render(sc, cam, cfg, spp=spp, base_sample=base_sample)
        return jnp.mean((img - target) ** 2), img

    (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, grads, img
