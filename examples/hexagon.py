"""Library-API demo: the hexagon group (mirrors examples/hexagon.rs)."""

import math
import sys

from raytracer_tpu import Camera, Canvas, transforms as tf
from raytracer_tpu.scene import PointLight, build_scene
from raytracer_tpu.scene.specs import hexagon
from raytracer_tpu.core.render import render

h = hexagon(tf.Transform().rotation_x(math.pi / 3).translation(0.0, 0.75, 0.0).matrix)
scene = build_scene([PointLight(position=(-10.0, 10.0, -10.0)), h])

# RAYTRACER_EXAMPLE_SIZE=WxH renders small (used by the smoke tests)
import os
_w, _h = map(int, os.environ.get("RAYTRACER_EXAMPLE_SIZE", "1280x720").split("x"))
camera = Camera(_w, _h, math.pi / 3).with_transform(
    tf.view_transform((0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
)
img = render(scene, camera)
Canvas(camera.hsize, camera.vsize, img).to_ppm(sys.stdout)  # pipe to a .ppm
