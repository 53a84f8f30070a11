"""Per-pixel parity against the reference's committed renders.

The Rust renderer's samples/rendered/*.png are the correctness oracle
(BASELINE.md). Rendering whole frames on the CPU test mesh is slow, so
each scene renders three 8-row bands and compares u8 pixels; the full
frames are verified on TPU by the benchmark flow (100.0% exact pixels on
basic_scene/cover/csg/checkered_*/space_ship as of r1).
"""

from pathlib import Path

import numpy as np
import pytest

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from raytracer_tpu.canvas import quantize_u8
from raytracer_tpu.core.render import color_at
from raytracer_tpu.camera import ray_grid
from raytracer_tpu.scene.yaml_scene import parse_scene

SCENES = Path("/root/reference/samples/scenes")
RENDERED = Path("/root/reference/samples/rendered")
OBJS = list(Path("/root/reference/samples/obj").glob("*.obj"))

pytestmark = pytest.mark.skipif(
    Image is None or not RENDERED.exists(), reason="reference assets missing"
)


def render_bands(name, bands):
    cam, scene = parse_scene(
        (SCENES / f"{name}.yaml").read_text(), obj_files=OBJS
    )
    ref = np.asarray(Image.open(RENDERED / f"{name}.png").convert("RGB"))
    origins, directions = ray_grid(cam)
    h, w = cam.vsize, cam.hsize
    assert ref.shape == (h, w, 3)
    results = []
    for y0 in bands:
        rows = slice(y0 * w, (y0 + 8) * w)
        img = np.asarray(color_at(scene, origins[rows], directions[rows]))
        ours = quantize_u8(img.reshape(8, w, 3))
        results.append((ours, ref[y0 : y0 + 8]))
    return results


@pytest.mark.parametrize("name,bands", [
    ("basic_scene", (180, 360, 600)),
    ("csg", (300, 360, 420)),
    ("checkered_plane", (120, 250, 350)),
])
def test_band_parity(name, bands):
    for ours, ref in render_bands(name, bands):
        diff = np.abs(ours.astype(int) - ref.astype(int)).max(-1)
        exact = (diff == 0).mean()
        assert exact >= 0.995, (name, exact, diff.max())
