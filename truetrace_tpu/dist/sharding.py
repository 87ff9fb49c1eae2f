"""Device-mesh sharding: tile-parallel rendering + gradient collectives.

The reference renderer is single-GPU (SURVEY.md section 2.3) — this layer is
new, TPU-native capability: the ray population is the data dimension
(SURVEY.md section 5.7), so

* the image is sharded by pixel tiles across a 1-D `tiles` mesh axis
  (`shard_map` over the wavefront integrator — each chip traces its own
  pixel block, zero cross-chip traffic in the forward sweep),
* the scene (triangles, BVH, materials, lights) is replicated — it is
  read-only at render time, like the reference's global GPU mega-buffers,
* parameter gradients (materials/lights) are `psum`'d over ICI in the
  backward pass — the only required collective (BASELINE.json).

Everything works on any jax mesh: real TPU slices or the CPU
`--xla_force_host_platform_device_count` virtual mesh used in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from truetrace_tpu.integrate.pathtrace import RenderConfig, render_sample
from truetrace_tpu.scene.ir import Camera, Scene

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the first n available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (TILE_AXIS,))


def _render_rows(scene: Scene, cam: Camera, cfg: RenderConfig, spp: int,
                 row0, n_rows: int, base_sample: int):
    """Render `n_rows` image rows starting at row0 (one chip's tile)."""
    W = cfg.width
    pixel = (row0 * W + jnp.arange(n_rows * W)).astype(jnp.uint32)

    def body(s, acc):
        return acc + _sample_rows(scene, cam, cfg, pixel,
                                  jnp.uint32(base_sample + s))
    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((n_rows * W, 3), jnp.float32))
    return (acc / spp).reshape(n_rows, W, 3)


def _sample_rows(scene, cam, cfg, pixel, sid):
    from truetrace_tpu.integrate import pathtrace as pt
    return pt.render_sample_pixels(scene, cam, cfg, pixel, sid)


def render_tiled(scene: Scene, cam: Camera, cfg: RenderConfig, mesh: Mesh,
                 spp: int = 16, base_sample: int = 0) -> jnp.ndarray:
    """Render [H,W,3] with rows sharded across the mesh's tile axis.

    H must be divisible by the axis size (pad upstream if needed)."""
    n = mesh.shape[TILE_AXIS]
    H, W = cfg.height, cfg.width
    assert H % n == 0, f"height {H} not divisible by {n} devices"
    rows_per = H // n

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(TILE_AXIS)),
             out_specs=P(TILE_AXIS),
             check_rep=False)
    def tile_fn(scene_rep, cam_rep, row_ids):
        row0 = row_ids[0]
        return _render_rows(scene_rep, cam_rep, cfg, spp, row0, rows_per,
                            base_sample)

    row_ids = jnp.arange(H, dtype=jnp.int32)
    return tile_fn(scene, cam, row_ids)


def train_step_sharded(scene: Scene, cam: Camera, cfg: RenderConfig,
                       mesh: Mesh, target: jnp.ndarray, spp: int = 4,
                       lr: float = 0.05, base_sample: int = 0,
                       trainable=("base_color",)):
    """One differentiable-rendering optimization step, sharded over tiles.

    Renders with the current trainable parameters (any mix of
    MaterialTable columns plus "env_intensity" / "light_radiance" — the
    full diff/render_grad.py pytree), computes L2 loss against `target`
    ([H,W,3]), backprops through the full estimator, psums every gradient
    leaf over the tile axis, and returns (loss, new_scene). This is the
    multi-chip 'training step' shape: dp over pixels, replicated params,
    ICI all-reduce of gradients.
    """
    from truetrace_tpu.diff.render_grad import (get_scene_params,
                                                set_scene_params)
    n = mesh.shape[TILE_AXIS]
    H, W = cfg.height, cfg.width
    assert H % n == 0
    rows_per = H // n

    mat_keys = tuple(k for k in trainable
                     if k not in ("env_intensity", "light_radiance"))
    params = get_scene_params(scene, keys=mat_keys,
                              with_env="env_intensity" in trainable,
                              with_lights="light_radiance" in trainable)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(TILE_AXIS, None, None)),
             out_specs=(P(), P()),
             check_rep=False)
    def step(params_rep, scene_rep, cam_rep, target_rows):
        my = jax.lax.axis_index(TILE_AXIS)
        row0 = my * rows_per

        def loss_fn(p):
            sc = set_scene_params(scene_rep, p)
            img = _render_rows(sc, cam_rep, cfg, spp, row0, rows_per,
                               base_sample)
            return jnp.mean((img - target_rows) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params_rep)
        loss = jax.lax.pmean(loss, TILE_AXIS)
        g = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, TILE_AXIS), g)   # ICI all-reduce
        return loss, g

    loss, g = step(params, scene, cam, target)
    new_params = jax.tree_util.tree_map(lambda p, gg: p - lr * gg,
                                        params, g)
    return loss, set_scene_params(scene, new_params)


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> Mesh:
    """Initialize jax.distributed for a real multi-host pod slice and
    return the global tile mesh (SURVEY.md section 5.8: DCN for init,
    ICI for the render/gradient collectives).

    On single-host (or under the CPU virtual mesh) this is a no-op that
    just returns the local mesh."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return make_mesh()
