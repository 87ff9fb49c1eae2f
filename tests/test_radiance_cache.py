"""Radiance cache: hash behavior, insert/query roundtrip, e2e energy."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.integrate.radiance_cache import (
    RadianceCache, cache_cell, cache_query, cache_resolve, cache_update,
    render_sample_cached)
from truetrace_tpu.scene import cornell
from truetrace_tpu.scene.mesh import compile_scene

CAM = jnp.asarray([0.0, 0.0, -1.0])


def test_cell_locality_and_levels():
    # same voxel -> same key; far points -> coarser level (bigger cells)
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
    p_near = jnp.asarray([[0.501, 0.5, 0.5], [0.503, 0.5, 0.5]])
    h1, k1 = cache_cell(p_near, n, CAM)
    # 2mm apart at 1.5m distance: same 2cm cell
    assert int(k1[0]) == int(k1[1])
    # at ~100 m the cell is 0.02*2^5 = 0.64 m: pick two points inside one
    p_far = jnp.asarray([[100.0, 0.5, 0.5], [100.2, 0.5, 0.5]])
    h2, k2 = cache_cell(p_far, n, CAM)
    assert int(k2[0]) == int(k2[1])
    # and two points 1 cell apart differ
    p_far2 = jnp.asarray([[100.0, 0.5, 0.5], [101.0, 0.5, 0.5]])
    _, k2b = cache_cell(p_far2, n, CAM)
    assert int(k2b[0]) != int(k2b[1])
    # opposite normals split the cell
    _, k3 = cache_cell(p_near[:1], -n[:1], CAM)
    assert int(k3[0]) != int(k1[0])


def test_insert_query_roundtrip():
    cache = RadianceCache.create(1 << 12)
    p = jnp.asarray([[1.0, 2.0, 3.0]] * 16)
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 16)
    h, k = cache_cell(p, n, CAM)
    rad = jnp.broadcast_to(jnp.asarray([2.0, 4.0, 8.0]), (16, 3))
    cache = cache_update(cache, h, k, rad, jnp.ones((16,)))
    out, hit = cache_query(cache, p[:1], n[:1], CAM)
    assert bool(hit[0])          # 16 samples >= CONFIDENT_COUNT
    np.testing.assert_allclose(np.asarray(out[0]), [2.0, 4.0, 8.0],
                               rtol=1e-5)
    # unseen cell misses
    _, miss = cache_query(cache, p[:1] + 50.0, n[:1], CAM)
    assert not bool(miss[0])


def test_resolve_decays_and_ages():
    cache = RadianceCache.create(1 << 10)
    p = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 8)
    h, k = cache_cell(p, n, CAM)
    cache = cache_update(cache, h, k, jnp.ones((8, 3)), jnp.ones((8,)))
    c0 = float(cache.count.sum())
    cache = cache_resolve(cache)
    assert float(cache.count.sum()) < c0
    assert float(cache.age.max()) == 1.0


def test_e2e_cache_energy_close():
    """Warmed-up cached rendering must be close in mean to the plain
    estimator (cache adds bias bounded by its cell discretization)."""
    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    W = H = 24
    cfg_plain = RenderConfig(width=W, height=H, bounces=4)
    ref = np.asarray(render(scene, cam, cfg_plain, spp=64))

    cfg_cache = RenderConfig(width=W, height=H, bounces=4,
                             cache_capture=True, cache_query_bounce=2)
    cache = RadianceCache.create(1 << 16)
    pixel = jnp.arange(W * H, dtype=jnp.uint32)
    acc = np.zeros((W * H, 3), np.float32)
    n_acc = 0
    for s in range(24):
        rad, _, cache = render_sample_cached(scene, cam, cfg_cache, cache,
                                             pixel, s)
        cache = cache_resolve(cache, decay=1.0)
        if s >= 12:               # accumulate after warmup
            acc += np.asarray(rad)
            n_acc += 1
    img = (acc / n_acc).reshape(H, W, 3)
    assert np.isfinite(img).all()
    m_ref = float(np.median(ref.sum(-1)))
    m_cache = float(np.median(img.sum(-1)))
    assert abs(m_cache - m_ref) / m_ref < 0.3, (m_cache, m_ref)
    # the cache actually got hits
    assert float(cache.count.max()) >= 8.0


def test_probing_survives_contention():
    """Bounded linear probing (reference CommonData.cginc:1661-1700): at
    ~50% occupancy with colliding inserts, queries must still find most
    entries — the single-slot hash dropped colliding inserts for up to
    MAX_AGE frames."""
    import jax.numpy as jnp
    import numpy as np
    from truetrace_tpu.integrate.radiance_cache import (
        RadianceCache, cache_update, cache_query, cache_cell,
        CONFIDENT_COUNT)

    rng = np.random.default_rng(11)
    C = 1 << 12
    cache = RadianceCache.create(C)
    N = C // 2                      # 50% occupancy target
    pos = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
    nrm = np.zeros((N, 3), np.float32)
    nrm[:, 1] = 1.0
    nrm = jnp.asarray(nrm)
    cam = jnp.zeros((3,), jnp.float32)
    h, key = cache_cell(pos, nrm, cam)
    rad = jnp.ones((N, 3), jnp.float32)
    w = jnp.full((N,), float(CONFIDENT_COUNT), jnp.float32)
    for _ in range(2):              # two frames of inserts
        cache = cache_update(cache, h, key, rad, w)
    _, hit = cache_query(cache, pos, nrm, cam)
    rate = float(np.asarray(hit).mean())
    # birthday-collision losses at 50% occupancy with 4 probes are small
    assert rate > 0.9, rate


def test_cache_hit_rate_metric():
    """stats['cache_hit_rate'] reports the per-frame query hit fraction
    (RenderMetrics cache_hits input)."""
    import jax.numpy as jnp
    import numpy as np
    from truetrace_tpu.integrate.pathtrace import RenderConfig
    from truetrace_tpu.integrate.radiance_cache import (
        RadianceCache, cache_resolve, render_sample_cached)
    from truetrace_tpu.scene import cornell
    from truetrace_tpu.scene.mesh import compile_scene

    import truetrace_tpu.integrate.radiance_cache as rc

    meshes, mats, cam = cornell.make()
    scene = compile_scene(meshes, mats)
    cfg = RenderConfig(width=16, height=16, bounces=3, cache_capture=True,
                       cache_query_bounce=1)
    cache = RadianceCache.create(1 << 14)
    pixel = jnp.arange(16 * 16, dtype=jnp.uint32)
    rates = []
    old_cell = rc.BASE_CELL
    rc.BASE_CELL = 0.2        # coarse cells: cache warms within a few frames
    try:
        for s in range(16):
            _, st, cache = render_sample_cached(scene, cam, cfg, cache,
                                                pixel, s)
            cache = cache_resolve(cache, decay=1.0)
            rates.append(float(st["cache_hit_rate"]))
    finally:
        rc.BASE_CELL = old_cell
    assert rates[0] == 0.0                 # empty cache: no hits
    assert rates[-1] > 0.3, rates          # warm cache: real hit rate
