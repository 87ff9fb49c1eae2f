"""Radiance-cache camera-motion reprojection (reference
GetReprojectedHash, CommonData.cginc:1764 + sidelined-voxel pull,
RayGenKernels.compute:290-300).

Camera motion re-levels SHaRC cells (the distance level is part of the
key); without reprojection every re-leveled cell cold-starts its
confidence counter. The reprojection merge lets fresh entries inherit
the accumulation of their previous-level counterpart."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig
from truetrace_tpu.integrate.radiance_cache import (
    RadianceCache, _cell_hash, _pack_cell, _unpack_cell, cache_resolve,
    render_sample_cached)
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene


def test_pack_cell_roundtrip():
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.integers(-60000, 60000, (512, 3)), jnp.int32)
    level = jnp.asarray(rng.integers(0, 13, (512,)), jnp.int32)
    oct_n = jnp.asarray(rng.integers(0, 8, (512,)), jnp.int32)
    c2, l2, o2 = _unpack_cell(*_pack_cell(c, level, oct_n))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(level))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(oct_n))
    # the hash recomputed from the unpacked cell matches the packed one
    h, k = _cell_hash(c, level, oct_n)
    h2, k2 = _cell_hash(c2, l2, o2)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(k2))


def _frames(scene, cams, n, reproject):
    """Run n frames cycling `cams`; returns per-frame hit rates."""
    cfg = RenderConfig(width=16, height=16, bounces=2,
                       cache_capture=True, cache_query_bounce=1)
    pix = jnp.arange(16 * 16, dtype=jnp.uint32)
    cache = RadianceCache.create(1 << 13)
    rates = []
    prev = cams[0]
    for f in range(n):
        cam = cams[min(f, len(cams) - 1)]
        _, st, cache = render_sample_cached(scene, cam, cfg, cache, pix,
                                            jnp.uint32(f))
        if reproject:
            cache = cache_resolve(cache, cam_pos=cam.c2w[3, :3],
                                  prev_cam_pos=prev.c2w[3, :3])
        else:
            cache = cache_resolve(cache)
        rates.append(float(st["cache_hit_rate"]))
        prev = cam
    return rates


@pytest.mark.slow
def test_reprojection_survives_camera_jump():
    """Warm the cache with camera A, jump to camera B (re-levels most
    cells): with the reprojection merge the post-jump hit rate recovers
    faster than without."""
    import truetrace_tpu.integrate.radiance_cache as rc
    meshes, mats, cam_a = cornell.make()
    scene = compile_scene(meshes, mats)
    from truetrace_tpu.scene.ir import Camera
    # dolly out past the d=4 level boundary (the 0.55 m box sits ~1 m from
    # the default camera; at 5 m every cell re-levels 0 -> 1); narrow fov
    # keeps the box filling the frame
    c = 0.2764
    cam_b = Camera.look_at((c, c, -5.0), (c, c, c), fov_y_deg=7.0)
    warm, post = 14, 4
    cams = [cam_a] * warm + [cam_b] * post
    old_cell = rc.BASE_CELL
    rc.BASE_CELL = 0.2      # coarse cells warm within a few 16x16 frames
    try:
        plain = _frames(scene, cams, warm + post, reproject=False)
        rep = _frames(scene, cams, warm + post, reproject=True)
    finally:
        rc.BASE_CELL = old_cell
    # identical until the jump (reprojection is a no-op while static)
    np.testing.assert_allclose(plain[:warm], rep[:warm], atol=1e-6)
    assert max(plain[warm - 1], rep[warm - 1]) > 0.05   # cache warmed up
    post_plain = np.mean(plain[warm + 1:])
    post_rep = np.mean(rep[warm + 1:])
    # reprojection recovers hit-rate faster after the jump (measured:
    # first post-jump queryable frame 0.50 vs 0.36 plain)
    assert post_rep > post_plain + 0.02, (post_plain, post_rep)
