"""Host-side scene description (the "library API").

These light-weight specs mirror the reference's public shape/material/light
constructors (src/shapes/*.rs builders, src/materials.rs:19-33,
src/lights.rs:42-121, src/groups.rs, src/csg.rs) but are plain Python data;
:func:`raytracer_tpu.scene.builder.build_scene` compiles a list of them into
the device SoA :class:`~raytracer_tpu.core.types.Scene`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Union

import numpy as np

from raytracer_tpu import transforms


def _as_matrix(t) -> np.ndarray:
    if t is None:
        return transforms.identity()
    if isinstance(t, transforms.Transform):
        return t.matrix
    return np.asarray(t, dtype=np.float32)


@dataclass
class UvPatternSpec:
    """uv-checker / align-check / image (uv_pattern.rs)."""

    kind: str  # "checker" | "align_check" | "image"
    width: float = 0.0
    height: float = 0.0
    a: tuple = (0.0, 0.0, 0.0)
    b: tuple = (0.0, 0.0, 0.0)
    # align_check corner colors
    main: tuple = (0.0, 0.0, 0.0)
    ul: tuple = (0.0, 0.0, 0.0)
    ur: tuple = (0.0, 0.0, 0.0)
    bl: tuple = (0.0, 0.0, 0.0)
    br: tuple = (0.0, 0.0, 0.0)
    image: Optional[np.ndarray] = None  # f32 [h, w, 3]


@dataclass
class Pattern:
    """striped/gradient/ring/checker/xyz_rgb/texture_map/cube_map."""

    kind: str
    a: tuple = (1.0, 1.0, 1.0)
    b: tuple = (0.0, 0.0, 0.0)
    transform: Optional[np.ndarray] = None
    mapping: str = "spherical"  # texture_map only
    uv_pattern: Optional[UvPatternSpec] = None  # texture_map
    # cube_map faces
    left: Optional[UvPatternSpec] = None
    right: Optional[UvPatternSpec] = None
    front: Optional[UvPatternSpec] = None
    back: Optional[UvPatternSpec] = None
    up: Optional[UvPatternSpec] = None
    down: Optional[UvPatternSpec] = None


@dataclass
class Material:
    """Defaults match materials.rs:19-33."""

    color: tuple = (1.0, 1.0, 1.0)
    ambient: float = 0.1
    diffuse: float = 0.9
    specular: float = 0.9
    shininess: float = 200.0
    reflective: float = 0.0
    transparency: float = 0.0
    refractive_index: float = 1.0
    pattern: Optional[Pattern] = None

    def replace(self, **kw) -> "Material":
        return dataclasses.replace(self, **kw)


@dataclass
class PointLight:
    position: tuple
    intensity: tuple = (1.0, 1.0, 1.0)


@dataclass
class AreaLight:
    corner: tuple
    uvec: tuple  # FULL u vector (divided by usteps at build, lights.rs:95)
    usteps: int
    vvec: tuple
    vsteps: int
    intensity: tuple = (1.0, 1.0, 1.0)


@dataclass
class _ShapeBase:
    transform: Optional[np.ndarray] = None
    material: Material = field(default_factory=Material)
    shadow: bool = True

    @property
    def matrix(self) -> np.ndarray:
        return _as_matrix(self.transform)


@dataclass
class Sphere(_ShapeBase):
    pass


@dataclass
class Plane(_ShapeBase):
    pass


@dataclass
class Cube(_ShapeBase):
    pass


@dataclass
class Cylinder(_ShapeBase):
    min: float = -np.inf
    max: float = np.inf
    closed: bool = False


@dataclass
class Cone(_ShapeBase):
    min: float = -np.inf
    max: float = np.inf
    closed: bool = False


@dataclass
class Triangle(_ShapeBase):
    p1: tuple = (0.0, 0.0, 0.0)
    p2: tuple = (0.0, 0.0, 0.0)
    p3: tuple = (0.0, 0.0, 0.0)


@dataclass
class SmoothTriangle(_ShapeBase):
    p1: tuple = (0.0, 0.0, 0.0)
    p2: tuple = (0.0, 0.0, 0.0)
    p3: tuple = (0.0, 0.0, 0.0)
    n1: tuple = (0.0, 0.0, 1.0)
    n2: tuple = (0.0, 0.0, 1.0)
    n3: tuple = (0.0, 0.0, 1.0)


@dataclass
class Mesh(_ShapeBase):
    """A block of triangles as arrays — the scalable form of a triangle
    soup (OBJ meshes land here; per-triangle specs stay for small counts).

    p: [N, 3, 3] corner positions; n: [N, 3, 3] shading normals (rows
    meaningful where ``smooth``); smooth: [N] bool.
    """

    p: Optional[np.ndarray] = None
    n: Optional[np.ndarray] = None
    smooth: Optional[np.ndarray] = None

    def __post_init__(self):
        self.p = np.asarray(self.p, np.float32)
        nt = self.p.shape[0]
        if self.n is None:
            self.n = np.zeros((nt, 3, 3), np.float32)
        else:
            self.n = np.asarray(self.n, np.float32)
        if self.smooth is None:
            self.smooth = np.zeros(nt, bool)
        else:
            self.smooth = np.asarray(self.smooth, bool)


ShapeSpec = Union[Sphere, Plane, Cube, Cylinder, Cone, Triangle, SmoothTriangle, Mesh]


@dataclass
class Group:
    """Hierarchical transform node; flattened at compile time.

    ``children`` may contain shapes and nested Groups. Matches the
    semantics of groups.rs: the group's transform composes onto every
    descendant; it carries no material of its own (OBJ loading applies a
    material to the triangles it creates, see obj.rs:8-41).
    """

    transform: Optional[np.ndarray] = None
    children: list = field(default_factory=list)

    @property
    def matrix(self) -> np.ndarray:
        return _as_matrix(self.transform)

    def divide(self, threshold: int = 1) -> "Group":
        """API-parity no-op (groups.rs:284-299). Acceleration here is
        automatic: the builder Morton-orders triangles and the renderer
        culls chunk/supergroup AABBs — no explicit BVH build step."""
        return self

    def cache_bounds(self) -> "Group":
        """API-parity no-op (groups.rs:190-196); bounds are computed at
        scene compile time."""
        return self


def hexagon(transform=None) -> "Group":
    """The reference's demo hexagon builder (groups.rs:328-367): six
    sides, each a corner sphere + edge cylinder under a rotated group."""
    import math

    def corner():
        return Sphere(transform=transforms.Transform()
                      .scaling(0.25, 0.25, 0.25).translation(0.0, 0.0, -1.0).matrix)

    def edge():
        return Cylinder(
            transform=transforms.Transform()
            .scaling(0.25, 1.0, 0.25).rotation_z(-math.pi / 2)
            .rotation_y(-math.pi / 6).translation(0.0, 0.0, -1.0).matrix,
            min=0.0, max=1.0,
        )

    sides = [
        Group(transform=transforms.rotation_y(n * math.pi / 3),
              children=[corner(), edge()])
        for n in range(6)
    ]
    return Group(transform=_as_matrix(transform), children=sides)


@dataclass
class Csg:
    """CSG node: op in {"union","intersect","difference"}, children are
    shapes or nested Csg (csg.rs:6-11). Roots are intersected in world
    space (world.rs:44-49)."""

    op: str
    left: Union[ShapeSpec, "Csg"]
    right: Union[ShapeSpec, "Csg"]
