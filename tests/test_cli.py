"""CLI smoke test (in-process main(), mirrors main.rs flows)."""

import numpy as np

from raytracer_tpu.__main__ import main
from raytracer_tpu.canvas import from_ppm_bytes

SCENE = """
- add: camera
  width: 16
  height: 10
  field-of-view: PI/3
  from: [0, 1.5, -5]
  to: [0, 1, 0]
  up: [0, 1, 0]
- add: point-light
  at: [-10, 10, -10]
  intensity: [1, 1, 1]
- add: plane
- add: sphere
  transform:
    - [translate, -0.5, 1, 0.5]
  material:
    color: [0.1, 0.4, 0.9]
"""


def test_cli_render_to_file(tmp_path):
    scene_p = tmp_path / "scene.yaml"
    scene_p.write_text(SCENE)
    out_p = tmp_path / "out.ppm"
    rc = main(["--scene", str(scene_p), "--out", str(out_p)])
    assert rc == 0
    img = from_ppm_bytes(out_p.read_bytes())
    assert img.shape == (10, 16, 3)
    assert img.max() > 0.1


def test_cli_dithering(tmp_path):
    scene_p = tmp_path / "scene.yaml"
    scene_p.write_text(SCENE)
    out_p = tmp_path / "out.ppm"
    rc = main(["--scene", str(scene_p), "--dithering", "bayer2",
               "--out", str(out_p)])
    assert rc == 0
    img = from_ppm_bytes(out_p.read_bytes())
    assert set(np.unique(img)) <= {0.0, 1.0}
