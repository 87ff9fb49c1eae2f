"""Nested dielectrics via the per-lane medium stack (pathtrace MED_STACK).

Beyond the reference's backface heuristic (RayTracingShader.compute:
278-281), which loses the host medium's absorption on segments ending at
a nested object's front face. Verified against the analytic normal-
incidence slab chain: glass slab inside a water slab in front of an
emissive wall — transmitted radiance
    E * prod(1-R_i) * c_w * c_g * exp(-sig_w*d_w) * exp(-sig_g*d_g)
with the Fresnel R at the water->glass interface computed from the
RELATIVE eta n_g/n_w (the stack's job), not the absolute 1.5."""
import numpy as np

from tests.test_glass import _extinction, box_mesh, quad_mesh
from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera
from truetrace_tpu.scene.mesh import HostMaterial, compile_scene


def _r0(n1, n2):
    return ((n1 - n2) / (n1 + n2)) ** 2


def test_glass_in_water_matches_analytic():
    E = 4.0
    cw = np.array([0.85, 0.95, 0.7])     # water tint
    cg = np.array([0.9, 0.6, 0.8])       # glass tint
    n_w, n_g = 1.33, 1.5
    water = HostMaterial(base_color=tuple(cw), roughness=0.02,
                         spec_trans=1.0, ior=n_w, specular=0.0)
    glass = HostMaterial(base_color=tuple(cg), roughness=0.02,
                         spec_trans=1.0, ior=n_g, specular=0.0)
    wall = HostMaterial(base_color=(0, 0, 0), emission=(E, E, E))
    water_box = box_mesh((-6, -6, -3.0), (6, 6, -0.5), 0)
    glass_box = box_mesh((-5, -5, -2.0), (5, 5, -1.5), 1)
    back = quad_mesh((0, 0, -5.0), 20.0, 2, 2)
    scene = compile_scene([water_box, glass_box, back],
                          [water, glass, wall])
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=10, bsdf="disney",
                       use_nee=False, rr_start=10)
    img = np.asarray(render(scene, cam, cfg, spp=96)).mean(axis=(0, 1))

    sig_w = _extinction(cw, 1.0)         # scatter_dist 0 is treated as 1
    sig_g = _extinction(cg, 1.0)
    t_frc = ((1.0 - _r0(1.0, n_w)) ** 2          # air<->water x2
             * (1.0 - _r0(n_w, n_g)) ** 2)       # water<->glass x2 (REL)
    expect = (E * t_frc * cw * cg
              * np.exp(-sig_w * 2.0)             # 2 m of water
              * np.exp(-sig_g * 0.5))            # 0.5 m of glass
    np.testing.assert_allclose(img, expect, rtol=0.08)
    # the relative-eta Fresnel is what the stack buys: absolute 1.5 at
    # the water->glass interface would cost an extra ~7.5%
    wrong = expect / (1.0 - _r0(n_w, n_g)) ** 2 * (1.0 - _r0(1.0, n_g)) ** 2
    assert np.all(np.abs(img - expect) < np.abs(img - wrong))


def test_object_inside_water_gets_host_absorption():
    """An opaque emissive plate INSIDE a water volume: its radiance must
    arrive attenuated by the water above it — the case the backface
    heuristic gets wrong (segment ends on a front face)."""
    E = 4.0
    cw = np.array([0.6, 0.9, 0.7])
    water = HostMaterial(base_color=tuple(cw), roughness=0.02,
                         spec_trans=1.0, ior=1.33, specular=0.0)
    plate = HostMaterial(base_color=(0, 0, 0), emission=(E, E, E))
    water_box = box_mesh((-6, -6, -3.0), (6, 6, -0.5), 0)
    plate_quad = quad_mesh((0, 0, -2.5), 5.0, 2, 1)   # inside the water
    scene = compile_scene([water_box, plate_quad], [water, plate])
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=6, bsdf="disney",
                       use_nee=False, rr_start=6)
    img = np.asarray(render(scene, cam, cfg, spp=96)).mean(axis=(0, 1))
    sig_w = _extinction(cw, 1.0)
    # (1/n_w)^2: radiance of an emitter inside a dense medium compresses
    # crossing the single interface out (the BTDF's 1/eta^2 Jacobian —
    # it cancels only for paired enter+exit interfaces like closed slabs)
    expect = (E * (1.0 - _r0(1.0, 1.33)) * cw ** 0.5
              * np.exp(-sig_w * 2.0) / 1.33 ** 2)
    np.testing.assert_allclose(img, expect, rtol=0.08)


def test_closed_glass_unchanged():
    """Single closed slab: the stack reproduces the round-3 model (the
    analytic slab test in test_glass.py pins the absolute numbers; this
    pins stack == old heuristic on the simple case)."""
    color = (0.9, 0.5, 0.25)
    E = 4.0
    glass = HostMaterial(base_color=color, roughness=0.02, spec_trans=1.0,
                         ior=1.5, specular=0.0)
    wall = HostMaterial(base_color=(0, 0, 0), emission=(E, E, E))
    slab = box_mesh((-6, -6, -1.5), (6, 6, -1.0), 0)
    back = quad_mesh((0, 0, -4.0), 20.0, 2, 1)
    scene = compile_scene([slab, back], [glass, wall])
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=8, bsdf="disney",
                       use_nee=False, rr_start=8)
    img = np.asarray(render(scene, cam, cfg, spp=64)).mean(axis=(0, 1))
    sig = _extinction(np.asarray(color), 1.0)
    expect = (E * (1.0 - _r0(1.0, 1.5)) ** 2 * np.asarray(color)
              * np.exp(-sig * 0.5))
    np.testing.assert_allclose(img, expect, rtol=0.07)
