"""Affine transform builders (host-side, numpy float32).

Semantics match the reference builders (/root/reference/src/transformations.rs):
row-vector-on-the-right convention, i.e. a point is transformed as ``M @ p``
with ``p = [x, y, z, 1]`` a column. The fluent :class:`Transform` builder
LEFT-multiplies each new op onto the accumulated matrix, so

    Transform().scaling(2,2,2).translation(1,0,0)

first scales then translates, exactly like the reference's op-list order
(transformations.rs:63-91, scene.rs transform spec lists are applied in
order through the same builder).

These run at scene-compile time on the host; the device only ever sees the
final (inverse) matrices, so plain numpy is the right tool here.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "translation",
    "scaling",
    "rotation_x",
    "rotation_y",
    "rotation_z",
    "shearing",
    "view_transform",
    "Transform",
    "identity",
]


def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float32)


def translation(x: float, y: float, z: float) -> np.ndarray:
    m = identity()
    m[0, 3] = x
    m[1, 3] = y
    m[2, 3] = z
    return m


def scaling(x: float, y: float, z: float) -> np.ndarray:
    m = identity()
    m[0, 0] = x
    m[1, 1] = y
    m[2, 2] = z
    return m


def rotation_x(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    m = identity()
    m[1, 1] = c
    m[1, 2] = -s
    m[2, 1] = s
    m[2, 2] = c
    return m


def rotation_y(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    m = identity()
    m[0, 0] = c
    m[0, 2] = s
    m[2, 0] = -s
    m[2, 2] = c
    return m


def rotation_z(angle: float) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    m = identity()
    m[0, 0] = c
    m[0, 1] = -s
    m[1, 0] = s
    m[1, 1] = c
    return m


def shearing(x_y: float, x_z: float, y_x: float, y_z: float, z_x: float, z_y: float) -> np.ndarray:
    m = identity()
    m[0, 1] = x_y
    m[0, 2] = x_z
    m[1, 0] = y_x
    m[1, 2] = y_z
    m[2, 0] = z_x
    m[2, 1] = z_y
    return m


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def view_transform(from_p, to_p, up) -> np.ndarray:
    """World->camera matrix (transformations.rs:122-134 semantics)."""
    from_p = np.asarray(from_p, dtype=np.float32)
    to_p = np.asarray(to_p, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)

    forward = _normalize(to_p - from_p)
    upn = _normalize(up)
    left = np.cross(forward, upn)
    true_up = np.cross(left, forward)
    orientation = np.array(
        [
            [left[0], left[1], left[2], 0.0],
            [true_up[0], true_up[1], true_up[2], 0.0],
            [-forward[0], -forward[1], -forward[2], 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )
    return orientation @ translation(-from_p[0], -from_p[1], -from_p[2])


class Transform:
    """Fluent builder; each op left-multiplies (applied after prior ops)."""

    def __init__(self, matrix: np.ndarray | None = None):
        self.matrix = identity() if matrix is None else np.asarray(matrix, np.float32)

    def _apply(self, m: np.ndarray) -> "Transform":
        return Transform(m @ self.matrix)

    def translation(self, x, y, z):
        return self._apply(translation(x, y, z))

    def scaling(self, x, y, z):
        return self._apply(scaling(x, y, z))

    def rotation_x(self, angle):
        return self._apply(rotation_x(angle))

    def rotation_y(self, angle):
        return self._apply(rotation_y(angle))

    def rotation_z(self, angle):
        return self._apply(rotation_z(angle))

    def shearing(self, x_y, x_z, y_x, y_z, z_x, z_y):
        return self._apply(shearing(x_y, x_z, y_x, y_z, z_x, z_y))
