"""Library-API demo: nested CSG (mirrors examples/csg.rs)."""

import math
import sys

from raytracer_tpu import Camera, Canvas, transforms as tf
from raytracer_tpu.scene import Csg, Cube, Cylinder, Material, PointLight, Sphere, build_scene
from raytracer_tpu.core.render import render

PI = math.pi

outer = Csg(
    op="intersect",
    left=Sphere(transform=tf.scaling(1.3, 1.3, 1.3)),
    right=Cube(transform=tf.rotation_y(PI / 3)),
)
inner = Csg(
    op="union",
    left=Csg(
        op="union",
        left=Cylinder(
            transform=tf.Transform().scaling(0.6, 0.6, 0.6).rotation_y(PI / 3).matrix,
            material=Material(color=(1.0, 0.0, 0.0)),
        ),
        right=Cylinder(
            transform=tf.Transform().scaling(0.6, 0.6, 0.6)
            .rotation_x(PI / 2).rotation_y(PI / 3).matrix,
            material=Material(color=(0.0, 0.0, 1.0)),
        ),
    ),
    right=Cylinder(
        transform=tf.Transform().scaling(0.6, 0.6, 0.6)
        .rotation_z(PI / 2).rotation_y(PI / 3).matrix,
        material=Material(color=(0.0, 1.0, 0.0)),
    ),
)

scene = build_scene([
    PointLight(position=(-10.0, 10.0, -10.0)),
    Csg(op="difference", left=outer, right=inner),
])
# RAYTRACER_EXAMPLE_SIZE=WxH renders small (used by the smoke tests)
import os
_w, _h = map(int, os.environ.get("RAYTRACER_EXAMPLE_SIZE", "1280x720").split("x"))
camera = Camera(_w, _h, PI / 3).with_transform(
    tf.view_transform((0.0, 1.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
)
img = render(scene, camera)
Canvas(camera.hsize, camera.vsize, img).to_ppm(sys.stdout)
