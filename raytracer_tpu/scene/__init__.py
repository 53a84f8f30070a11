from raytracer_tpu.scene.specs import (
    Material,
    Pattern,
    UvPatternSpec,
    PointLight,
    AreaLight,
    Sphere,
    Plane,
    Cube,
    Cylinder,
    Cone,
    Triangle,
    SmoothTriangle,
    Group,
    Csg,
)
from raytracer_tpu.scene.builder import build_scene
