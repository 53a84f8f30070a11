"""Library-API demo: hand-built world (mirrors examples/basic_scene.rs)."""

import math
import sys

from raytracer_tpu import Camera, Canvas, transforms as tf
from raytracer_tpu.scene import Material, Plane, PointLight, Sphere, build_scene
from raytracer_tpu.core.render import render

floor = Plane(material=Material(color=(1.0, 0.9, 0.9), specular=0.0))
left_wall = Plane(
    transform=tf.Transform().rotation_x(math.pi / 2)
    .rotation_y(-math.pi / 4).translation(0.0, 0.0, 5.0).matrix,
    material=Material(color=(1.0, 0.9, 0.9), specular=0.0),
)
right_wall = Plane(
    transform=tf.Transform().rotation_x(math.pi / 2)
    .rotation_y(math.pi / 4).translation(0.0, 0.0, 5.0).matrix,
    material=Material(color=(1.0, 0.9, 0.9), specular=0.0),
)
middle = Sphere(
    transform=tf.translation(-0.5, 1.0, 0.5),
    material=Material(color=(0.1, 1.0, 0.5), diffuse=0.7, specular=0.3),
)
right = Sphere(
    transform=tf.Transform().scaling(0.5, 0.5, 0.5).translation(1.5, 0.5, -0.5).matrix,
    material=Material(color=(0.5, 1.0, 0.1), diffuse=0.7, specular=0.3),
)
left = Sphere(
    transform=tf.Transform().scaling(0.33, 0.33, 0.33).translation(-1.5, 0.33, -0.75).matrix,
    material=Material(color=(1.0, 0.8, 0.1), diffuse=0.7, specular=0.3),
)

scene = build_scene([
    PointLight(position=(-10.0, 10.0, -10.0)),
    floor, left_wall, right_wall, middle, right, left,
])
# RAYTRACER_EXAMPLE_SIZE=WxH renders small (used by the smoke tests)
import os
_w, _h = map(int, os.environ.get("RAYTRACER_EXAMPLE_SIZE", "1280x720").split("x"))
camera = Camera(_w, _h, math.pi / 3).with_transform(
    tf.view_transform((0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
)
img = render(scene, camera)
Canvas(camera.hsize, camera.vsize, img).to_ppm(sys.stdout)
