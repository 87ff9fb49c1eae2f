"""PBRT importer (scene/pbrt_loader.py) — parse + render smoke, mirror
of the Mitsuba importer tests (the reference lineage includes a Mitsuba
parser; PBRT is the other interchange format its demo scenes use)."""
import numpy as np

from truetrace_tpu.scene.pbrt_loader import load_pbrt

PBRT = """
# cornell-ish
LookAt 0 1 3.4   0 1 0   0 1 0
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
WorldBegin
MakeNamedMaterial "red" "string type" "matte" "rgb Kd" [.6 .05 .05]
AttributeBegin
  Material "matte" "rgb Kd" [.73 .73 .73]
  Shape "trianglemesh"
    "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
AttributeBegin
  NamedMaterial "red"
  Translate -1 1 0
  Rotate 90 0 0 1
  Shape "trianglemesh"
    "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    "integer indices" [0 1 2 0 2 3]
AttributeEnd
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [12 12 10]
  Translate 0 1.99 0
  Scale -1 1 1
  Shape "trianglemesh"
    "point3 P" [-.4 0 -.4  .4 0 -.4  .4 0 .4  -.4 0 .4]
    "integer indices" [0 1 2 0 2 3]
AttributeEnd
AttributeBegin
  Material "glass" "float eta" [1.5]
  Translate 0.4 0.3 0.4
  Shape "sphere" "float radius" [0.3]
AttributeEnd
LightSource "point" "rgb I" [2 2 2] "point3 from" [0 1.5 1]
LightSource "infinite" "rgb L" [.05 .06 .08]
WorldEnd
"""


def _load(tmp_path, text=PBRT):
    p = tmp_path / "scene.pbrt"
    p.write_text(text)
    return load_pbrt(str(p))


def test_parse_structure(tmp_path):
    meshes, mats, cam, env, lights, skipped = _load(tmp_path)
    assert len(meshes) == 4
    # named material applied to wall 2
    assert np.allclose(mats[meshes[1].mat_id[0]].base_color,
                       (0.6, 0.05, 0.05))
    # area light mesh: emission set, base color black
    m_light = mats[meshes[2].mat_id[0]]
    assert np.allclose(m_light.emission, (12, 12, 10))
    assert np.allclose(m_light.base_color, (0, 0, 0))
    # glass sphere: transmissive, translated center
    sph = meshes[3]
    assert abs(float(mats[sph.mat_id[0]].spec_trans) - 1.0) < 1e-6
    c = sph.positions.mean(0)
    np.testing.assert_allclose(c, (0.4, 0.3, 0.4), atol=0.05)
    r = np.linalg.norm(sph.positions - c, axis=1).max()
    assert abs(r - 0.3) < 0.03
    # wall 2 rotated into a vertical plane at x=-1
    assert np.allclose(meshes[1].positions[:, 0], -1, atol=1e-5)
    # env + analytic point light
    assert env is not None
    assert lights is not None and int(lights.position.shape[0]) == 1
    assert int(lights.ltype[0]) == 0
    assert skipped == [], skipped


def test_negative_scale_restores_winding(tmp_path):
    """Scale -1 1 1 flips handedness: PBRT normals transform
    covariantly (a mirror leaves this patch's -y normal at -y), so the
    importer must flip winding to preserve the authored orientation —
    our renderer derives normals from world-space winding."""
    meshes, mats, *_ = _load(tmp_path)
    light = meshes[2]
    v = light.positions
    f = light.indices[0]
    n = np.cross(v[f[1]] - v[f[0]], v[f[2]] - v[f[0]])
    assert n[1] < 0, n


def test_render_smoke(tmp_path):
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.mesh import compile_scene

    meshes, mats, cam, env, lights, _ = _load(tmp_path)
    scene = compile_scene(meshes, mats, env=env, lights=lights,
                          with_cwbvh=True, with_light_bvh=True)
    cfg = RenderConfig(width=24, height=24, bounces=2, bsdf="disney",
                       traversal="wavefront", light_sampling="tree")
    img = np.asarray(render(scene, cam, cfg, spp=8))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3     # lit scene
    # red wall on the left side of the image
    left = img[8:16, :6].mean(0).mean(0)
    assert left[0] > left[1] * 1.3, left


def test_include_and_distant(tmp_path):
    (tmp_path / "inc.pbrt").write_text(
        'Material "metal" "float roughness" [.1]\n'
        'Shape "trianglemesh" "point3 P" [0 0 0 1 0 0 0 1 0] '
        '"integer indices" [0 1 2]\n')
    text = """
LookAt 0 0 3 0 0 0 0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point3 from" [0 5 0] "point3 to" [0 0 0]
Include "inc.pbrt"
WorldEnd
"""
    meshes, mats, cam, env, lights, skipped = _load(tmp_path, text)
    assert len(meshes) == 1
    assert mats[0].metallic == 1.0
    assert lights is not None and int(lights.ltype[0]) == 1
    d = np.asarray(lights.direction[0])
    np.testing.assert_allclose(d, (0, -1, 0), atol=1e-6)
    assert skipped == [], skipped


def _write_ply_ascii(path):
    path.write_text("""ply
format ascii 1.0
comment a quad
element vertex 4
property float x
property float y
property float z
property float nx
property float ny
property float nz
property float u
property float v
element face 2
property list uchar int vertex_indices
end_header
0 0 0 0 0 1 0 0
1 0 0 0 0 1 1 0
1 1 0 0 0 1 1 1
0 1 0 0 0 1 0 1
3 0 1 2
3 0 2 3
""")


def test_ply_ascii_and_binary(tmp_path):
    import struct
    from truetrace_tpu.scene.ply_loader import load_ply

    _write_ply_ascii(tmp_path / "q.ply")
    pos, idx, n, uv = load_ply(str(tmp_path / "q.ply"))
    assert pos.shape == (4, 3) and idx.shape == (2, 3)
    np.testing.assert_allclose(n, np.tile([0, 0, 1], (4, 1)))
    np.testing.assert_allclose(uv[2], (1, 1))

    # same mesh, binary little endian
    hdr = ("ply\nformat binary_little_endian 1.0\n"
           "element vertex 4\n"
           + "".join(f"property float {c}\n" for c in "xyz")
           + "element face 2\n"
           "property list uchar int vertex_indices\n"
           "end_header\n").encode()
    body = b""
    for v in pos:
        body += struct.pack("<3f", *v)
    for fc in idx:
        body += struct.pack("<B3i", 3, *fc)
    (tmp_path / "qb.ply").write_bytes(hdr + body)
    pos2, idx2, n2, uv2 = load_ply(str(tmp_path / "qb.ply"))
    np.testing.assert_allclose(pos2, pos)
    np.testing.assert_array_equal(idx2, idx)
    assert n2 is None and uv2 is None


def test_pbrt_plymesh(tmp_path):
    _write_ply_ascii(tmp_path / "mesh.ply")
    text = """
LookAt 0 0 3 0 0 0 0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
AttributeBegin
  Translate 1 2 0
  Shape "plymesh" "string filename" "mesh.ply"
AttributeEnd
WorldEnd
"""
    (tmp_path / "s.pbrt").write_text(text)
    from truetrace_tpu.scene.pbrt_loader import load_pbrt
    meshes, mats, cam, env, lights, skipped = load_pbrt(
        str(tmp_path / "s.pbrt"))
    assert skipped == [], skipped
    assert len(meshes) == 1 and meshes[0].indices.shape == (2, 3)
    np.testing.assert_allclose(meshes[0].positions[0], (1, 2, 0),
                               atol=1e-6)
