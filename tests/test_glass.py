"""Glass interior transport: Beer-Lambert absorption + exit-eta parity.

Counterpart of the reference's inside-dielectric attenuation
(RayTracingShader.compute:278-281: throughput *= exp(-t * extinction)
on backface hits of non-thin spec_trans materials; extinction formula
Materials.cginc:350 CalculateExtinction). Verified against an analytic
slab model (normal incidence, Fresnel + Beer-Lambert series) and a
white-furnace neutrality check.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import Camera, EnvMap
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene


def box_mesh(lo, hi, mat_id):
    """Axis-aligned box with outward-facing triangles."""
    lo, hi = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.array([
        [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
        [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
    ], np.float32)
    # CCW seen from outside (right-handed, geometric normal = cross(e1,e2))
    f = np.array([
        [0, 2, 1], [0, 3, 2],        # z = z0 (normal -z)
        [4, 5, 6], [4, 6, 7],        # z = z1 (normal +z)
        [0, 1, 5], [0, 5, 4],        # y = y0 (normal -y)
        [3, 6, 2], [3, 7, 6],        # y = y1 (normal +y)
        [0, 4, 7], [0, 7, 3],        # x = x0 (normal -x)
        [1, 2, 6], [1, 6, 5],        # x = x1 (normal +x)
    ], np.int32)
    return HostMesh(positions=v, indices=f,
                    mat_id=np.full((len(f),), mat_id, np.int32))


def quad_mesh(center, half, normal_axis, mat_id, flip=False):
    """Axis-aligned quad; normal along +axis (or -axis when flip)."""
    c = np.asarray(center, np.float32)
    axes = [0, 1, 2]
    axes.remove(normal_axis)
    a, b = axes
    v = np.zeros((4, 3), np.float32)
    for i, (sa, sb) in enumerate([(-1, -1), (1, -1), (1, 1), (-1, 1)]):
        v[i] = c
        v[i, a] += sa * half
        v[i, b] += sb * half
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    if flip:
        f = f[:, ::-1]
    return HostMesh(positions=v, indices=f,
                    mat_id=np.full((2,), mat_id, np.int32))


def _extinction(base_color, dist):
    app = np.clip(1.0 - np.asarray(base_color, np.float32), 0.0, 1.0)
    s = 1.9 - app + 3.5 * (app - 0.8) ** 2
    return np.where(app <= 0.0, 0.0, 1.0 / (s * max(dist, 1.0e-6)))


def test_slab_beer_lambert_matches_analytic():
    """Colored glass slab in front of a uniform emissive wall: transmitted
    radiance ~ E * (1-R0)^2 * c * exp(-sigma*d) (+ tiny internal series)."""
    color = (0.9, 0.5, 0.25)
    ior = 1.5
    thick = 0.5
    E = 4.0
    glass = HostMaterial(base_color=color, roughness=0.02, spec_trans=1.0,
                         ior=ior, specular=0.0, scatter_dist=0.0)
    wall = HostMaterial(base_color=(0, 0, 0), emission=(E, E, E))
    slab = box_mesh((-6, -6, -1.5), (6, 6, -1.0), 0)
    back = quad_mesh((0, 0, -4.0), 20.0, 2, 1)   # normal +z, faces camera
    scene = compile_scene([slab, back], [glass, wall])
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=8, bsdf="disney",
                       use_nee=False, rr_start=8)
    img = np.asarray(render(scene, cam, cfg, spp=512))
    assert np.isfinite(img).all()
    got = img.mean(axis=(0, 1))

    r0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    a = np.exp(-_extinction(color, 1.0) * thick)
    expect = E * (1.0 - r0) ** 2 * np.asarray(color) * a \
        / (1.0 - r0 ** 2 * a ** 2)
    np.testing.assert_allclose(got, expect, rtol=0.06)
    # sanity: the analytic target is NOT what a no-absorption render gives
    # (the green/blue channels absorb 26%/49% over the 0.5 m slab)
    no_abs = E * (1.0 - r0) ** 2 * np.asarray(color)
    assert got[2] < no_abs[2] * 0.75


def test_white_furnace_stays_neutral():
    """Closed white glass box in a constant env = 1 furnace: every path
    through the glass keeps unit weight (clear-glass sigma=0 deviation,
    see pathtrace.py)."""
    glass = HostMaterial(base_color=(1.0, 1.0, 1.0), roughness=0.02,
                         spec_trans=1.0, ior=1.5, specular=0.0)
    slab = box_mesh((-6, -6, -2.0), (6, 6, -1.0), 0)
    scene = compile_scene([slab], [glass],
                          env=EnvMap.constant((1.0, 1.0, 1.0)))
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=16, bsdf="disney",
                       use_nee=False, rr_start=16)
    img = np.asarray(render(scene, cam, cfg, spp=256))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, rtol=0.03)


def test_colored_glass_darker_than_white():
    """End-to-end regression: colored interior absorbs, white does not,
    and absorption grows with path length (thicker slab = darker)."""
    E = 4.0
    wall = HostMaterial(base_color=(0, 0, 0), emission=(E, E, E))
    back = quad_mesh((0, 0, -4.0), 20.0, 2, 1)
    cam = Camera.look_at((0, 0, 1.0), (0, 0, -1.0), fov_y_deg=2.0)
    cfg = RenderConfig(width=8, height=8, bounces=8, bsdf="disney",
                       use_nee=False, rr_start=8)

    def run(color, thick):
        glass = HostMaterial(base_color=color, roughness=0.02,
                             spec_trans=1.0, ior=1.5, specular=0.0)
        slab = box_mesh((-6, -6, -1.0 - thick), (6, 6, -1.0), 0)
        scene = compile_scene([slab, back], [glass, wall])
        return np.asarray(render(scene, cam, cfg, spp=256)).mean(axis=(0, 1))

    thin = run((0.6, 0.8, 0.9), 0.25)
    thicc = run((0.6, 0.8, 0.9), 1.0)
    assert (thicc < thin * 0.9).all()      # 4x path length absorbs more
