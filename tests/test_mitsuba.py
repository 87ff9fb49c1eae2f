"""Mitsuba XML importer (scene/mitsuba_loader.py): a Cornell-style XML
scene parses, compiles and renders with the expected physics."""
import os

import numpy as np

from truetrace_tpu.scene.mitsuba_loader import load_mitsuba

XML = """<scene version="2.0.0">
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0, 1, 4.5" target="0, 1, 0" up="0, 1, 0"/>
    </transform>
  </sensor>

  <bsdf type="diffuse" id="white">
    <rgb name="reflectance" value="0.75, 0.75, 0.75"/>
  </bsdf>
  <bsdf type="twosided" id="red">
    <bsdf type="diffuse">
      <rgb name="reflectance" value="0.75, 0.08, 0.08"/>
    </bsdf>
  </bsdf>
  <bsdf type="diffuse" id="green">
    <rgb name="reflectance" value="0.08, 0.75, 0.08"/>
  </bsdf>

  <!-- floor -->
  <shape type="rectangle">
    <transform name="to_world">
      <rotate x="1" angle="-90"/>
      <scale value="2"/>
    </transform>
    <ref id="white"/>
  </shape>
  <!-- back wall -->
  <shape type="rectangle">
    <transform name="to_world">
      <scale value="2"/>
      <translate z="-2"/>
    </transform>
    <ref id="white"/>
  </shape>
  <!-- left (red), right (green) walls -->
  <shape type="rectangle">
    <transform name="to_world">
      <rotate y="1" angle="90"/>
      <scale value="2"/>
      <translate x="-2"/>
    </transform>
    <ref id="red"/>
  </shape>
  <shape type="rectangle">
    <transform name="to_world">
      <rotate y="1" angle="-90"/>
      <scale value="2"/>
      <translate x="2"/>
    </transform>
    <ref id="green"/>
  </shape>
  <!-- glass sphere + metal cube -->
  <shape type="sphere">
    <float name="radius" value="0.5"/>
    <transform name="to_world">
      <translate x="-0.7" y="0.5" z="0"/>
    </transform>
    <bsdf type="dielectric">
      <float name="int_ior" value="1.5"/>
    </bsdf>
  </shape>
  <shape type="cube">
    <transform name="to_world">
      <scale value="0.4"/>
      <translate x="0.8" y="0.4" z="-0.5"/>
    </transform>
    <bsdf type="roughconductor">
      <float name="alpha" value="0.04"/>
      <rgb name="specular_reflectance" value="0.9, 0.7, 0.4"/>
    </bsdf>
  </shape>
  <!-- ceiling area light -->
  <shape type="rectangle">
    <transform name="to_world">
      <rotate x="1" angle="90"/>
      <scale value="0.6"/>
      <translate y="1.99"/>
    </transform>
    <ref id="white"/>
    <emitter type="area">
      <rgb name="radiance" value="15, 14, 12"/>
    </emitter>
  </shape>
</scene>
"""


def test_parse_and_render(tmp_path):
    p = tmp_path / "cornell.xml"
    p.write_text(XML)
    meshes, mats, cam, env = load_mitsuba(str(p))
    assert len(meshes) == 7
    assert cam is not None
    # materials carried through
    reds = [m for m in mats if m.base_color[0] > 0.5 > m.base_color[1]
            and m.emission[0] == 0 and m.metallic == 0
            and m.spec_trans == 0]
    assert reds, "red wall material missing"
    glass = [m for m in mats if m.spec_trans == 1.0]
    assert glass and abs(glass[0].ior - 1.5) < 1e-6
    metal = [m for m in mats if m.metallic == 1.0]
    assert metal
    lights = [m for m in mats if max(m.emission) > 10]
    assert lights

    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.mesh import compile_scene
    scene = compile_scene(meshes, mats, env=env, with_cwbvh=True)
    cfg = RenderConfig(width=32, height=32, bounces=3, bsdf="disney",
                       traversal="wavefront")
    img = np.asarray(render(scene, cam, cfg, spp=24))
    assert np.isfinite(img).all()
    mid = img[12:20]
    left = mid[:, 2:8].mean(axis=(0, 1))
    right = mid[:, 24:30].mean(axis=(0, 1))
    # red wall left, green wall right, lit scene
    assert left[0] > left[1], left
    assert right[1] > right[0], right
    assert img.mean() > 0.01


def test_camera_lookat_orientation(tmp_path):
    p = tmp_path / "min.xml"
    p.write_text("""<scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="35"/>
        <transform name="to_world">
          <lookat origin="1, 2, 3" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
      </sensor>
    </scene>""")
    _, _, cam, _ = load_mitsuba(str(p))
    eye = np.asarray(cam.c2w)[3, :3]
    np.testing.assert_allclose(eye, [1, 2, 3], atol=1e-5)


def test_bitmap_textures(tmp_path):
    """Bitmap textures (inline <texture> and scene-level <texture id> +
    <ref>) route into the atlas with per-texture UV scale, and shapes get
    UVs so the texture actually shows in a render."""
    from PIL import Image

    # left half red, right half blue (u in [0, 0.5) vs [0.5, 1))
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = (255, 0, 0)
    img[:, 4:] = (0, 0, 255)
    Image.fromarray(img).save(tmp_path / "half.png")

    (tmp_path / "tex.xml").write_text("""<scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="to_world">
          <lookat origin="0, 0, 3" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
      </sensor>
      <texture type="bitmap" id="shared">
        <string name="filename" value="half.png"/>
        <float name="uscale" value="2"/>
      </texture>
      <shape type="rectangle">
        <bsdf type="diffuse">
          <texture type="bitmap" name="reflectance">
            <string name="filename" value="half.png"/>
          </texture>
        </bsdf>
      </shape>
      <shape type="sphere">
        <float name="radius" value="0.25"/>
        <bsdf type="diffuse">
          <ref name="reflectance" id="shared"/>
        </bsdf>
      </shape>
      <emitter type="constant">
        <rgb name="radiance" value="1, 1, 1"/>
      </emitter>
    </scene>""")

    from truetrace_tpu.scene.atlas import AtlasBuilder
    ab = AtlasBuilder()
    meshes, mats, cam, env = load_mitsuba(str(tmp_path / "tex.xml"),
                                          atlas_builder=ab)
    assert len(ab.images) == 1, "same file should dedupe to one atlas slot"
    assert mats[0].tex_albedo == 0
    assert mats[1].tex_albedo == 0
    assert mats[1].uv_scale[0] == 2.0          # uscale carried
    assert meshes[0].uvs is not None and meshes[1].uvs is not None
    assert np.isfinite(meshes[1].uvs).all()

    atlas, rects, level_y = ab.build()
    from truetrace_tpu.integrate.pathtrace import RenderConfig, render
    from truetrace_tpu.scene.mesh import compile_scene
    scene = compile_scene(meshes, mats, env=env, atlas=atlas,
                          atlas_rects=rects, atlas_level_y=level_y,
                          with_cwbvh=True)
    cfg = RenderConfig(width=32, height=32, bounces=2, bsdf="disney",
                       traversal="wavefront")
    im = np.asarray(render(scene, cam, cfg, spp=8))
    assert np.isfinite(im).all()
    left = im[8:24, 2:10].mean(axis=(0, 1))
    right = im[8:24, 22:30].mean(axis=(0, 1))
    # rectangle u runs 0->1 left to right on screen: red left, blue right
    assert left[0] > left[2], left
    assert right[2] > right[0], right
