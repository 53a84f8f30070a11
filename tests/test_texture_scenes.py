"""End-to-end image-texture scenes through the full CLI pipeline.

The reference's earth.yaml / skybox.yaml need external texture downloads;
these tests generate tiny PPM textures and render structurally identical
scenes (same pattern kinds, uv mappings, material structure — reduced
resolution) through ``__main__.main``: YAML parse → --ppm file binding →
P3 decode → texture-map / cube-map sampling → render → PPM out.
Ref: /root/reference/samples/scenes/earth.yaml, skybox.yaml,
src/patterns/texture_map.rs:69-137, uv_pattern.rs:109-133.
"""

import numpy as np

from raytracer_tpu.__main__ import main
from raytracer_tpu.canvas import from_ppm_bytes

EARTH_SCENE = """
- add: camera
  width: 32
  height: 20
  field-of-view: 0.8
  from: [1, 2, -10]
  to: [0, 1.1, 0]
  up: [0, 1, 0]
- add: point-light
  at: [-100, 100, -100]
  intensity: [1, 1, 1]
- add: plane
  material:
    color: [1, 1, 1]
    diffuse: 0.1
    specular: 0
    ambient: 0
    reflective: 0.4
- add: sphere
  transform:
    - [ rotate-y, 1.9 ]
    - [ translate, 0, 1.1, 0 ]
  material:
    pattern:
      kind: texture-map
      uv-mapping: spherical
      uv-pattern:
        kind: image
        ppm: earthmap.ppm
    diffuse: 0.9
    specular: 0.1
    shininess: 10
    ambient: 0.1
"""

SKYBOX_SCENE = """
- add: camera
  width: 32
  height: 20
  field-of-view: 1.2
  from: [0, 0, 0]
  to: [0, 0, 5]
  up: [0, 1, 0]
- add: point-light
  at: [0, 100, 0]
  intensity: [1, 1, 1]
- add: sphere
  transform:
    - [ scale, 0.75, 0.75, 0.75 ]
    - [ translate, 0, 0, 5 ]
  material:
    diffuse: 0.4
    specular: 0.6
    shininess: 20
    reflective: 0.6
    ambient: 0
- add: cube
  transform:
    - [ scale, 1000, 1000, 1000 ]
  material:
    pattern:
      kind: cube-map
      left: {kind: image, ppm: negx.ppm}
      right: {kind: image, ppm: posx.ppm}
      front: {kind: image, ppm: posz.ppm}
      back: {kind: image, ppm: negz.ppm}
      up: {kind: image, ppm: posy.ppm}
      down: {kind: image, ppm: negy.ppm}
    diffuse: 0
    specular: 0
    ambient: 1
"""


def write_ppm(path, rgb_u8):
    h, w, _ = rgb_u8.shape
    body = " ".join(str(int(v)) for v in rgb_u8.reshape(-1))
    path.write_text(f"P3\n{w} {h}\n255\n{body}\n")


def test_earth_scene_end_to_end(tmp_path):
    # a 32x16 "earth": blue oceans with a green equator band
    tex = np.zeros((16, 32, 3), np.uint8)
    tex[:, :] = (20, 60, 200)
    tex[6:10, :] = (30, 180, 40)
    write_ppm(tmp_path / "earthmap.ppm", tex)
    scene_p = tmp_path / "earth.yaml"
    scene_p.write_text(EARTH_SCENE)
    out_p = tmp_path / "earth.ppm"
    rc = main(["--scene", str(scene_p), "--ppm", str(tmp_path / "earthmap.ppm"),
               "--out", str(out_p)])
    assert rc == 0
    img = from_ppm_bytes(out_p.read_bytes())
    assert img.shape == (20, 32, 3)
    # the sphere occupies the image center; the equator band is green-ish
    center = img[8:12, 12:20]
    assert center.max() > 0.05
    # both ocean blue and equator green appear somewhere on the sphere
    sphere_px = img[3:15, 10:22].reshape(-1, 3)
    assert (sphere_px[:, 2] > sphere_px[:, 0]).any()  # blue dominates red


def test_skybox_scene_end_to_end(tmp_path):
    # six 8x8 faces with distinct colors
    colors = {
        "posx": (255, 0, 0), "negx": (0, 255, 0),
        "posy": (0, 0, 255), "negy": (255, 255, 0),
        "posz": (255, 0, 255), "negz": (0, 255, 255),
    }
    for name, c in colors.items():
        tex = np.zeros((8, 8, 3), np.uint8)
        tex[:, :] = c
        write_ppm(tmp_path / f"{name}.ppm", tex)
    scene_p = tmp_path / "skybox.yaml"
    scene_p.write_text(SKYBOX_SCENE)
    out_p = tmp_path / "skybox.ppm"
    rc = main(
        ["--scene", str(scene_p)]
        + sum((["--ppm", str(tmp_path / f"{n}.ppm")] for n in colors), [])
        + ["--out", str(out_p)]
    )
    assert rc == 0
    img = from_ppm_bytes(out_p.read_bytes())
    assert img.shape == (20, 32, 3)
    # camera looks toward +z: corners of the frame show the front (posz =
    # magenta) face of the enormous cube
    corner = img[0, 0]
    assert corner[0] > 0.9 and corner[2] > 0.9 and corner[1] < 0.1
    # the mirrored sphere in the middle reflects surrounding faces; its
    # pixels differ from the pure front color
    mid = img[10, 16]
    assert not (mid[0] > 0.9 and mid[2] > 0.9 and mid[1] < 0.1)
