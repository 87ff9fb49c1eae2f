"""Analytic-light softness (penumbra) + quad Z-axis rotation parity
(reference LightData.Softness / ZAxisRotation, RayTracingLights.cs:23-48,
consumed at RayTracingShader.compute:361-375, CommonData.cginc:1826)."""
import jax.numpy as jnp
import numpy as np
import pytest

from truetrace_tpu.integrate.pathtrace import RenderConfig, render
from truetrace_tpu.scene.ir import AnalyticLights, Camera
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh, compile_scene


def _floor_and_blocker():
    floor = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]],
                     np.float32)
    fi = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    blk = np.array([[-0.5, 0.8, -0.5], [0.5, 0.8, -0.5],
                    [0.5, 0.8, 0.5], [-0.5, 0.8, 0.5]], np.float32)
    mats = [HostMaterial(base_color=(0.8, 0.8, 0.8), roughness=1.0)]
    return [HostMesh(floor, fi, np.zeros(2, np.int32)),
            HostMesh(blk, fi, np.zeros(2, np.int32))], mats


def _lights(ltype, softness=0.0, z_rot=0.0, extent=(0.3, 0.3),
            pos=(0.0, 2.5, 0.0), direction=(0.0, -1.0, 0.0)):
    one = lambda v: jnp.asarray([v], jnp.float32)
    return AnalyticLights(
        position=jnp.asarray([pos], jnp.float32),
        direction=jnp.asarray([list(direction)], jnp.float32),
        radiance=jnp.asarray([[30.0, 30.0, 30.0]], jnp.float32),
        ltype=jnp.asarray([ltype], jnp.int32),
        spot_cos=jnp.asarray([[0.9, 0.7]], jnp.float32),
        extent=jnp.asarray([extent], jnp.float32),
        softness=one(softness), z_rot=one(z_rot))


CAM = Camera.look_at((0, 5.5, 0.01), (0, 0, 0), fov_y_deg=50)
CFG = RenderConfig(width=48, height=48, bounces=1, bsdf="lambert")


def _render(lights, spp=96, blocker=True):
    meshes, mats = _floor_and_blocker()
    if not blocker:
        meshes = meshes[:1]
    scene = compile_scene(meshes, mats, lights=lights)
    return np.asarray(render(scene, CAM, CFG, spp=spp))


def _penumbra_px(lights, spp=96):
    """Per-pixel shadow visibility = blocked render / open render (exact
    for one-bounce lambert direct light); penumbra = pixels with
    fractional visibility."""
    img = _render(lights, spp)
    base = _render(lights, spp, blocker=False)
    lum, lum0 = img.mean(-1), base.mean(-1)
    ok = lum0 > 1e-3
    v = np.where(ok, lum / np.maximum(lum0, 1e-6), 1.0)
    return int(((v > 0.12) & (v < 0.88) & ok).sum()), v


def test_point_softness_widens_penumbra():
    # off-axis light displaces the shadow out from under the blocker
    hard = _lights(0, softness=0.0, pos=(2.0, 2.0, 0.0))
    soft = _lights(0, softness=6.0, pos=(2.0, 2.0, 0.0))
    nh, _ = _penumbra_px(hard)
    ns, _ = _penumbra_px(soft)
    assert ns > nh * 1.5 + 4, (nh, ns)
    # total illumination is roughly preserved (position jitter only)
    assert abs(_render(soft).mean() - _render(hard).mean()) \
        < 0.15 * _render(hard).mean()


def test_directional_softness_widens_penumbra():
    d = (-0.55, -1.0, 0.0)
    nh, _ = _penumbra_px(_lights(1, softness=0.0, direction=d))
    ns, _ = _penumbra_px(_lights(1, softness=45.0, direction=d))
    assert ns > nh * 1.5 + 4, (nh, ns)


def test_quad_z_rotation_rotates_footprint():
    """An elongated quad light (0.9 x 0.1) straight above the blocker:
    rotating it 90deg swaps the penumbra's long axis between image axes."""
    a = _render(_lights(3, extent=(0.9, 0.1)), spp=128)
    b = _render(_lights(3, extent=(0.9, 0.1), z_rot=np.pi / 2), spp=128)

    def axis_spread(img):
        lum = img.mean(-1)
        lit = np.percentile(lum[lum > 0], 90)
        soft = (lum > 0.2 * lit) & (lum < 0.8 * lit)
        ys, xs = np.nonzero(soft)
        return np.var(xs), np.var(ys)

    ax, ay = axis_spread(a)
    bx, by = axis_spread(b)
    # the long axis flips between the two renders
    assert (ax - ay) * (bx - by) < 0, (ax, ay, bx, by)
