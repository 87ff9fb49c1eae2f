"""Distributed rendering: sharded == single-device bitwise, grads psum'd."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.dist.sharding import (
    make_mesh, render_tiled, train_step_sharded)
from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def setup():
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=16, height=16, bounces=2)
    return scene, cam, cfg


def test_eight_devices_available():
    assert len(jax.devices()) >= 8     # conftest forces the virtual mesh


def test_sharded_matches_single_device(setup):
    """Tile sharding must not change a single pixel: the counter-based RNG
    keys off (pixel, sample), which sharding preserves."""
    scene, cam, cfg = setup
    img1 = np.asarray(render_tiled(scene, cam, cfg, make_mesh(1), spp=2))
    img8 = np.asarray(render_tiled(scene, cam, cfg, make_mesh(8), spp=2))
    assert np.array_equal(img1, img8)
    # and matches the plain (unsharded) renderer
    ref = np.asarray(render(scene, cam, cfg, spp=2))
    np.testing.assert_allclose(img1, ref, atol=1e-6)


def test_train_step_gradients_match(setup):
    """Sharded train step's pmean'd gradient == single-device gradient."""
    scene, cam, cfg = setup
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss1, s1 = train_step_sharded(scene, cam, cfg, make_mesh(1), target,
                                   spp=1)
    loss8, s8 = train_step_sharded(scene, cam, cfg, make_mesh(8), target,
                                   spp=1)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss8))
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.materials.base_color),
                               np.asarray(s8.materials.base_color),
                               rtol=1e-4, atol=1e-6)


def test_scaling_harness(setup):
    from truetrace_tpu.dist.scaling import measure_scaling
    scene, cam, cfg = setup
    res = measure_scaling(scene, cam, cfg, spp=1, device_counts=[1, 8],
                          iters=1)
    assert 1 in res and 8 in res
    assert res[8]["identical_to_1dev"]


def test_train_step_full_trainable_set(setup):
    """Generalized trainables: material columns + env intensity +
    light radiance all update under the sharded step, matching the
    1-device step."""
    scene, cam, cfg = setup
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    keys = ("base_color", "roughness", "emission", "env_intensity")
    loss1, s1 = train_step_sharded(scene, cam, cfg, make_mesh(1), target,
                                   spp=1, trainable=keys)
    loss8, s8 = train_step_sharded(scene, cam, cfg, make_mesh(8), target,
                                   spp=1, trainable=keys)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for col in ("base_color", "roughness", "emission"):
        np.testing.assert_allclose(np.asarray(getattr(s1.materials, col)),
                                   np.asarray(getattr(s8.materials, col)),
                                   rtol=1e-4, atol=1e-6)
    # something actually moved (cornell is lit; grads are nonzero —
    # roughness excluded: it has no gradient under the lambert BSDF)
    for col in ("base_color", "emission"):
        assert not np.array_equal(np.asarray(getattr(s1.materials, col)),
                                  np.asarray(getattr(scene.materials, col)))
    np.testing.assert_allclose(np.asarray(s1.env.intensity),
                               np.asarray(s8.env.intensity), rtol=1e-4)


def test_ring_all_reduce_matches_pmean(setup):
    """The explicit ppermute ring (reduce-scatter + all-gather) computes
    the same mean-all-reduce as lax.pmean, for awkward leaf shapes."""
    import jax
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from truetrace_tpu.dist.sharding import shard_map
    from truetrace_tpu.dist.sharding import TILE_AXIS, ring_all_reduce

    mesh = make_mesh(8)
    n = 8
    rng = np.random.default_rng(5)
    for shape in ((3,), (5, 3), (17,), (2, 2, 2)):
        x = jnp.asarray(rng.normal(size=(n,) + shape).astype(np.float32))

        @partial(shard_map, mesh=mesh, in_specs=(P(TILE_AXIS),),
                 out_specs=(P(TILE_AXIS), P(TILE_AXIS)), check_rep=False)
        def both(xs):
            v = xs[0]
            a = ring_all_reduce(v, TILE_AXIS, n)
            b = jax.lax.pmean(v, TILE_AXIS)
            return a[None], b[None]

        a, b = both(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_optax_and_ring(setup):
    """Real optimizer state (optax adam) threads through the sharded
    step; the ring collective gives the same trajectory as psum; loss
    decreases over a short loop."""
    import optax
    scene, cam, cfg = setup
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    mesh = make_mesh(8)
    from truetrace_tpu.diff.render_grad import get_scene_params
    tx = optax.adam(0.05)

    losses = {}
    for coll in ("psum", "ring"):
        sc = scene
        params = get_scene_params(sc, keys=("base_color",),
                                  with_env=False, with_lights=False)
        opt_state = tx.init(params)
        ls = []
        for it in range(3):
            loss, sc, opt_state = train_step_sharded(
                sc, cam, cfg, mesh, target, spp=1,
                trainable=("base_color",), tx=tx, opt_state=opt_state,
                collective=coll)
            ls.append(float(loss))
        losses[coll] = ls
    np.testing.assert_allclose(losses["psum"], losses["ring"], rtol=1e-4)
    assert losses["psum"][-1] < losses["psum"][0]
