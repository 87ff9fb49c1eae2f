"""Composed-frame sharding parity (dist/composed.py): the FULL
Renderer.step — ReSTIR GI + DI + radiance cache + SVGF + TAAU + post —
run with row-sharded image state on the virtual 8-device mesh must match
the single-device step. GSPMD preserves program semantics, so any
mismatch is a real cross-tile bug (spatial taps, reprojection,
reservoir state)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.dist.composed import (composed_step_sharded,
                                         shard_frame_state)
from truetrace_tpu.dist.sharding import make_mesh
from truetrace_tpu.renderer import Renderer, RendererConfig
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import compile_scene


@pytest.fixture(scope="module")
def setup():
    from truetrace_tpu.scene import cornell
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats, with_cwbvh=True,
                          with_light_bvh=True)
    return scene, cam


def _run(scene, cam, n_dev, n_frames=3):
    cfg = RendererConfig(width=32, height=32, bounces=3, bsdf="disney",
                        traversal="wavefront", light_sampling="tree",
                        denoiser="svgf", use_restir=True,
                        use_restir_di=True, use_radiance_cache=True,
                        cache_query_bounce=2, cache_capacity=1 << 12,
                        upscale=1)
    r = Renderer(scene, cam, cfg)
    mesh = make_mesh(n_dev)
    frame = composed_step_sharded(r, mesh)
    st = shard_frame_state(r.init_state(), mesh, cfg.height, cfg.width)
    outs = []
    cams = [None, None,
            Camera.look_at(eye=(0.05, 1.0, 3.38), target=(0, 1, 0),
                           fov_y_deg=40)]   # frame 3: camera moves
    for i in range(n_frames):
        if cams[i] is not None:
            disp, rad, st = r.step(st, cam=cams[i])
        else:
            disp, rad, st = frame(st)
        outs.append((np.asarray(disp), np.asarray(rad)))
    return outs


def test_composed_step_sharded_matches_single(setup):
    scene, cam = setup
    o1 = _run(scene, cam, 1)
    o8 = _run(scene, cam, 8)
    for f, ((d1, r1), (d8, r8)) in enumerate(zip(o1, o8)):
        assert np.isfinite(d8).all() and np.isfinite(r8).all()
        np.testing.assert_allclose(d8, d1, atol=2e-5, rtol=1e-4,
                                   err_msg=f"display frame {f}")
        np.testing.assert_allclose(r8, r1, atol=2e-5, rtol=1e-4,
                                   err_msg=f"radiance frame {f}")


def test_sharded_state_placement(setup):
    """Image-space leaves actually land sharded (not silently
    replicated): the accumulator image must be split over the tile
    axis."""
    scene, cam = setup
    cfg = RendererConfig(width=32, height=32, bounces=2, bsdf="lambert",
                        traversal="wavefront", light_sampling="tree")
    r = Renderer(scene, cam, cfg)
    mesh = make_mesh(8)
    st = shard_frame_state(r.init_state(), mesh, 32, 32)
    sh = st.accum.image.sharding
    assert sh.spec[0] is not None, sh
    assert not sh.is_fully_replicated
