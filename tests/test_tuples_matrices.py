"""Book-oracle tests for the L0 math vocabulary
(reference src/tuples.rs and src/matrices.rs inline tests)."""

import math

import numpy as np

from raytracer_tpu import matrices as M
from raytracer_tpu import tuples as TU


def test_point_vector():
    p = TU.point(4.3, -4.2, 3.1)
    assert TU.is_point(p) and not TU.is_vector(p)
    v = TU.vector(4.3, -4.2, 3.1)
    assert TU.is_vector(v) and not TU.is_point(v)


def test_magnitude_normalize():
    assert float(TU.magnitude(TU.vector(1, 0, 0))) == 1.0
    assert abs(float(TU.magnitude(TU.vector(1, 2, 3))) - math.sqrt(14)) < 1e-6
    n = TU.normalize(TU.vector(4, 0, 0))
    assert np.allclose(np.asarray(n)[:3], [1, 0, 0])
    n = TU.normalize(TU.vector(1, 2, 3))
    assert abs(float(TU.magnitude(n)) - 1.0) < 1e-6


def test_dot_cross():
    a = TU.vector(1, 2, 3)
    b = TU.vector(2, 3, 4)
    assert float(TU.dot(a, b)) == 20.0
    assert np.allclose(TU.cross(a, b), [-1, 2, -1])
    assert np.allclose(TU.cross(b, a), [1, -2, 1])


def test_reflect():
    r = TU.reflect(TU.vector(1, -1, 0), TU.vector(0, 1, 0))
    assert np.allclose(r, [1, 1, 0])
    s2 = math.sqrt(2) / 2
    r = TU.reflect(TU.vector(0, -1, 0), TU.vector(s2, s2, 0))
    assert np.allclose(r, [1, 0, 0], atol=1e-6)


def test_color_ops():
    c = TU.hadamard(TU.color(1, 0.2, 0.4), TU.color(0.9, 1, 0.1))
    assert np.allclose(c, [0.9, 0.2, 0.04])
    q = TU.to_u8(TU.color(1.5, 0.5, -0.5))
    assert list(np.asarray(q)) == [255, 128, 0]


def test_determinants():
    m = [[1.0, 5.0], [-3.0, 2.0]]
    assert abs(float(M.determinant(m)) - 17.0) < 1e-5
    m3 = [[1.0, 2.0, 6.0], [-5.0, 8.0, -4.0], [2.0, 6.0, 4.0]]
    assert abs(float(M.cofactor(m3, 0, 0)) - 56.0) < 1e-4
    assert abs(float(M.cofactor(m3, 0, 1)) - 12.0) < 1e-4
    assert abs(float(M.cofactor(m3, 0, 2)) + 46.0) < 1e-4
    assert abs(float(M.determinant(m3)) + 196.0) < 1e-3
    m4 = [[-2.0, -8.0, 3.0, 5.0], [-3.0, 1.0, 7.0, 3.0],
          [1.0, 2.0, -9.0, 6.0], [-6.0, 7.0, 7.0, -9.0]]
    assert abs(float(M.determinant(m4)) + 4071.0) < 1e-2


def test_submatrix_minor():
    m3 = [[3.0, 5.0, 0.0], [2.0, -1.0, -7.0], [6.0, -1.0, 5.0]]
    sub = M.submatrix(m3, 1, 0)
    assert np.allclose(sub, [[5, 0], [-1, 5]])
    assert abs(float(M.minor(m3, 1, 0)) - 25.0) < 1e-5
    assert abs(float(M.cofactor(m3, 1, 0)) + 25.0) < 1e-5


def test_inverse_oracle():
    m = [[-5.0, 2.0, 6.0, -8.0], [1.0, -5.0, 1.0, 8.0],
         [7.0, 7.0, -6.0, -7.0], [1.0, -3.0, 7.0, 4.0]]
    inv = np.asarray(M.inverse(m))
    expected = [
        [0.21805, 0.45113, 0.24060, -0.04511],
        [-0.80827, -1.45677, -0.44361, 0.52068],
        [-0.07895, -0.22368, -0.05263, 0.19737],
        [-0.52256, -0.81391, -0.30075, 0.30639],
    ]
    assert np.allclose(inv, expected, atol=1e-4)
    assert M.is_invertible(m)
    assert not M.is_invertible([[0.0, 0.0], [0.0, 0.0]])
    # A * B * inverse(B) == A
    a = np.asarray(m, np.float64)
    b = np.asarray([[8.0, 2.0, 2.0, 2.0], [3.0, -1.0, 7.0, 0.0],
                    [7.0, 0.0, 5.0, 4.0], [6.0, -2.0, 0.0, 5.0]])
    c = a @ b
    assert np.allclose(c @ np.asarray(M.inverse(b)), a, atol=1e-3)
