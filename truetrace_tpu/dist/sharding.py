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
try:                                  # jax >= 0.8
    import inspect as _inspect
    from jax import shard_map as _sm
    if "check_rep" not in _inspect.signature(_sm).parameters:
        def shard_map(f, **kw):       # check_rep was renamed check_vma
            if "check_rep" in kw:
                kw["check_vma"] = kw.pop("check_rep")
            return _sm(f, **kw)
    else:
        shard_map = _sm
except ImportError:                   # older jax
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


def ring_all_reduce(x, axis_name: str, n: int):
    """Mean all-reduce as an explicit ICI ring: reduce-scatter (n-1
    ppermute hops, each chip accumulates one 1/n chunk) followed by
    all-gather (n-1 more hops) — the scaling-book recipe that lets XLA
    overlap per-leaf rings with still-running backward compute, instead
    of one bulk psum barrier at the end. Numerically it is a mean with a
    ring reduction order.

    n is the static axis size; works on any leaf shape (flattens, pads
    to n chunks)."""
    if n == 1:
        return x
    shape = x.shape
    flat = x.reshape(-1)
    c = -(-flat.shape[0] // n)                       # ceil chunk size
    chunks = jnp.pad(flat, (0, n * c - flat.shape[0])).reshape(n, c)
    me = jax.lax.axis_index(axis_name)
    fwd = [(j, (j + 1) % n) for j in range(n)]

    # reduce-scatter: after step s, chip me holds the running sum of
    # chunk (me - 2 - s) mod n over s+2 contributors; after n-1 steps it
    # owns the COMPLETE sum of chunk `me`
    acc = chunks[(me - 1) % n]
    send_idx = (me - 1) % n
    for _ in range(n - 1):
        recv = jax.lax.ppermute(acc, axis_name, fwd)
        send_idx = (send_idx - 1) % n
        acc = recv + chunks[send_idx]
    # all-gather: circulate the finished chunks around the ring; each
    # hop delivers the chunk one index lower
    out = jnp.zeros((n, c), flat.dtype).at[me].set(acc)
    piece = acc
    idx = me
    for _ in range(n - 1):
        piece = jax.lax.ppermute(piece, axis_name, fwd)
        idx = (idx - 1) % n
        out = out.at[idx].set(piece)
    return (out.reshape(-1)[:flat.shape[0]] / n).reshape(shape)


def train_step_sharded(scene: Scene, cam: Camera, cfg: RenderConfig,
                       mesh: Mesh, target: jnp.ndarray, spp: int = 4,
                       lr: float = 0.05, base_sample: int = 0,
                       trainable=("base_color",), tx=None, opt_state=None,
                       collective: str = "psum"):
    """One differentiable-rendering optimization step, sharded over tiles.

    Renders with the current trainable parameters (any mix of
    MaterialTable columns plus "env_intensity" / "light_radiance" — the
    full diff/render_grad.py pytree), computes L2 loss against `target`
    ([H,W,3]), backprops through the full estimator, all-reduces every
    gradient leaf over the tile axis, and applies the update. This is
    the multi-chip 'training step' shape: dp over pixels, replicated
    params, ICI all-reduce of gradients.

    Optimizer: pass an optax `tx` + its `opt_state` to run a real
    optimizer (returns (loss, new_scene, new_opt_state)); without them
    the legacy fixed-lr SGD applies and the return stays (loss,
    new_scene). collective: "psum" (one bulk pmean per leaf) or "ring"
    (explicit reduce-scatter + all-gather via ppermute,
    `ring_all_reduce` — per-leaf rings XLA can overlap with
    still-running backward compute).
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
        if collective == "ring":
            g = jax.tree_util.tree_map(
                lambda x: ring_all_reduce(x, TILE_AXIS, n), g)
        else:
            g = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, TILE_AXIS), g)  # ICI all-reduce
        return loss, g

    loss, g = step(params, scene, cam, target)
    if tx is not None:
        updates, new_opt_state = tx.update(g, opt_state, params)
        import optax
        new_params = optax.apply_updates(params, updates)
        return loss, set_scene_params(scene, new_params), new_opt_state
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
