"""Tinted/cutout shadow transmittance through the two-level TLAS path.

Deletes the round-2 binary-occlusion fallback: instanced stained glass
must filter shadow rays exactly like the same geometry flattened into a
single world-space BLAS (reference handles instanced geometry in the
same any-hit, IntersectionKernels.compute:264-498)."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.kernels.cwbvh_tlas import transmit_tlas
from truetrace_tpu.kernels.traverse_ref import transmit_brute
from truetrace_tpu.scene.instances import (
    compile_scene_instanced, make_transform)
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import (
    HostMaterial, HostMesh, compile_scene, shadow_tint_table)


def _quad_xz(y, half, mat):
    pos = np.array([[-half, y, -half], [half, y, -half],
                    [half, y, half], [-half, y, half]], np.float32)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    return HostMesh(pos, idx, np.full(2, mat, np.int32))


@pytest.fixture(scope="module")
def scenes():
    mats = [HostMaterial(base_color=(0.7, 0.7, 0.7)),               # opaque
            HostMaterial(base_color=(0.9, 0.15, 0.1), alpha=1.0,
                         spec_trans=1.0),                           # red glass
            HostMaterial(base_color=(0.2, 0.9, 0.3), alpha=0.35,
                         spec_trans=1.0),                           # cutout glass
            HostMaterial(emission=(10.0, 10.0, 10.0))]              # light
    sources = [_quad_xz(0.0, 1.0, 1),      # glass panel source
               _quad_xz(0.0, 1.0, 2),      # cutout panel source
               _quad_xz(0.0, 4.0, 0),      # floor source
               _quad_xz(0.0, 0.5, 3)]      # light source
    instances = [
        (2, make_transform((0, 0, 0))),                         # floor
        (0, make_transform((0.0, 1.0, 0.0), rot_y=0.3)),        # glass A
        (0, make_transform((0.3, 1.8, 0.2), rot_y=-0.5,
                           scale=0.7)),                         # glass B
        (1, make_transform((-0.2, 2.4, -0.1), rot_y=0.9)),      # cutout
        (3, make_transform((0.0, 3.2, 0.0))),                   # light
    ]
    scene_i, _ = compile_scene_instanced(sources, mats, instances,
                                         with_light_bvh=False)
    flat = []
    for src_id, m in instances:
        src = sources[src_id]
        pos = src.positions @ m[:3, :3] + m[3, :3]
        flat.append(HostMesh(pos.astype(np.float32), src.indices,
                             src.mat_id))
    scene_f = compile_scene(flat, mats, with_cwbvh=True)
    return scene_i, scene_f


def test_tlas_transmit_matches_flattened(scenes):
    scene_i, scene_f = scenes
    assert scene_i.tri_shadow is not None
    rng = np.random.default_rng(7)
    R = 256
    ro = np.stack([rng.uniform(-1, 1, R), np.full(R, 0.05),
                   rng.uniform(-1, 1, R)], -1).astype(np.float32)
    # shoot up through the panel stack with some angular spread
    d = np.stack([rng.uniform(-0.3, 0.3, R), np.ones(R),
                  rng.uniform(-0.3, 0.3, R)], -1)
    rd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    t_max = jnp.full((R,), 3.0)

    tp_i = np.asarray(transmit_tlas(
        scene_i.cw_nodes, scene_i.cw_leaf_rows, scene_i.inst_rows,
        scene_i.tri_shadow, jnp.asarray(ro), jnp.asarray(rd), t_max))
    tp_f = np.asarray(transmit_brute(
        scene_f.tri_p0, scene_f.tri_e1, scene_f.tri_e2,
        scene_f.tri_shadow, jnp.asarray(ro), jnp.asarray(rd), t_max))
    np.testing.assert_allclose(tp_i, tp_f, atol=2e-5)
    # the rays actually cross tinted surfaces (non-trivial test)
    assert (tp_i < 0.99).any() and (tp_i > 0.01).any()
    assert not np.allclose(tp_i, tp_i.astype(bool).astype(np.float32))


def test_tlas_render_with_tinted_shadows(scenes):
    """Full integrator over the instanced scene: tinted shadows color the
    floor under the red glass (not binary black)."""
    scene_i, scene_f = scenes
    cam = Camera.look_at(eye=(0, 1.4, 4.5), target=(0, 0.8, 0),
                         fov_y_deg=45)
    kw = dict(width=32, height=32, bounces=2, bsdf="disney",
              light_sampling="cdf")
    img_i = np.asarray(render(scene_i, cam,
                              RenderConfig(traversal="tlas", **kw), spp=24))
    img_f = np.asarray(render(scene_f, cam,
                              RenderConfig(traversal="wavefront", **kw),
                              spp=24))
    assert np.isfinite(img_i).all()
    np.testing.assert_allclose(img_i.mean(axis=(0, 1)),
                               img_f.mean(axis=(0, 1)), rtol=0.08)
