"""Light-BVH refit (reference LightBVHRefitter.compute): moved emissive
geometry keeps a valid, conservative light tree without a rebuild."""
import jax.numpy as jnp
import numpy as np

from truetrace_tpu.build.lightbvh import build_light_bvh
from truetrace_tpu.build.refit import light_level_worklists, refit_light_bvh


def _scene(n_lights=24, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(-5, 5, (n_lights, 3)).astype(np.float32)
    e1 = rng.uniform(-0.4, 0.4, (n_lights, 3)).astype(np.float32)
    e2 = rng.uniform(-0.4, 0.4, (n_lights, 3)).astype(np.float32)
    tris = dict(p0=p0, e1=e1, e2=e2)
    ids = np.arange(n_lights, dtype=np.int32)
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    power = (area * rng.uniform(1, 5, n_lights)).astype(np.float32)
    return tris, ids, power


def _check_conservative(nodes, info, prim, tris, ids):
    """Every light under a node must be inside its box and cone."""
    p0, e1, e2 = tris["p0"], tris["e1"], tris["e2"]
    gn = np.cross(e1, e2)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)

    def lights_under(n):
        if info[n, 1] > 0:
            return [prim[info[n, 0] + k] for k in range(info[n, 1])]
        return lights_under(info[n, 0]) + lights_under(-info[n, 1])

    for n in range(nodes.shape[0]):
        lo, hi = nodes[n, 0:3], nodes[n, 3:6]
        axis, cos_o = nodes[n, 6:9], nodes[n, 9]
        theta_o = np.arccos(np.clip(cos_o, -1, 1))
        phi = 0.0
        for li in lights_under(n):
            t = ids[li]
            verts = [p0[t], p0[t] + e1[t], p0[t] + e2[t]]
            for v in verts:
                assert (v >= lo - 1e-3).all() and (v <= hi + 1e-3).all()
            ang = np.arccos(np.clip(np.dot(axis, gn[t]), -1, 1))
            assert ang <= theta_o + 1e-3, (n, li, ang, theta_o)


def test_identity_refit_conservative_and_power_exact():
    tris, ids, power = _scene()
    lb = build_light_bvh(tris, ids, power)
    levels = light_level_worklists(lb.info)
    nodes2 = np.asarray(refit_light_bvh(
        jnp.asarray(lb.nodes), lb.info, lb.prim,
        jnp.asarray(tris["p0"]), jnp.asarray(tris["e1"]),
        jnp.asarray(tris["e2"]), ids, jnp.asarray(power), levels))
    _check_conservative(nodes2, lb.info, lb.prim, tris, ids)
    # root power = total power (exact sum)
    np.testing.assert_allclose(nodes2[0, 11], power.sum(), rtol=1e-5)


def test_refit_after_motion_stays_valid_and_samples():
    tris, ids, power = _scene(seed=3)
    lb = build_light_bvh(tris, ids, power)
    levels = light_level_worklists(lb.info)
    # move + rotate the lights
    ang = 0.5
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    tris2 = dict(p0=tris["p0"] @ R.T + np.array([1.0, 0.5, -2.0],
                                                np.float32),
                 e1=tris["e1"] @ R.T, e2=tris["e2"] @ R.T)
    nodes2 = np.asarray(refit_light_bvh(
        jnp.asarray(lb.nodes), lb.info, lb.prim,
        jnp.asarray(tris2["p0"]), jnp.asarray(tris2["e1"]),
        jnp.asarray(tris2["e2"]), ids, jnp.asarray(power), levels))
    _check_conservative(nodes2, lb.info, lb.prim, tris2, ids)

    # sampling through the refit tree still agrees with its own pdf
    # (pairs rebuilt device-side from the refit nodes — the light-refit
    # render path)
    from truetrace_tpu.build.lightbvh import build_pairs, build_pairs_jax
    from truetrace_tpu.kernels.lighttree import (light_tree_pdf,
                                                 sample_light_tree)
    pairs0, pair_children = build_pairs(lb.nodes, lb.info)
    pairs = build_pairs_jax(jnp.asarray(nodes2), jnp.asarray(pairs0),
                            jnp.asarray(pair_children))
    rng = np.random.default_rng(1)
    K = 128
    p = jnp.asarray(rng.uniform(-6, 6, (K, 3)).astype(np.float32))
    n = jnp.asarray(np.tile([0, 1, 0], (K, 1)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 1, K).astype(np.float32))
    idx, pmf, _ = sample_light_tree(pairs, jnp.asarray(lb.prim), p, n, u)
    pdf = light_tree_pdf(pairs, jnp.asarray(lb.trail), idx, p, n)
    np.testing.assert_allclose(np.asarray(pmf), np.asarray(pdf),
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(pmf) > 0).all()
