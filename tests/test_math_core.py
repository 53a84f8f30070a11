"""Book-oracle tests for transforms, camera and canvas.

Oracle values from the reference's inline tests
(transformations.rs, camera.rs, canvas.rs, effects/dithering.rs).
"""

import io
import math

import numpy as np

from raytracer_tpu import transforms as tf
from raytracer_tpu.camera import Camera, ray_for_pixel
from raytracer_tpu.canvas import Canvas, bayer_matrix, from_ppm_bytes, to_ppm_bytes


def _pt(x, y, z):
    return np.array([x, y, z], np.float32)


def test_transform_builders():
    p = np.array([-3.0, 4.0, 5.0, 1.0], np.float32)
    assert np.allclose(tf.translation(5, -3, 2) @ p, [2, 1, 7, 1])
    inv = np.linalg.inv(tf.translation(5, -3, 2))
    assert np.allclose(inv @ p, [-8, 7, 3, 1])

    p = np.array([-4.0, 6.0, 8.0, 1.0], np.float32)
    assert np.allclose(tf.scaling(2, 3, 4) @ p, [-8, 18, 32, 1])

    p = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    half = tf.rotation_x(math.pi / 4) @ p
    assert np.allclose(half, [0, math.sqrt(2) / 2, math.sqrt(2) / 2, 1], atol=1e-6)

    p = np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    assert np.allclose(
        tf.rotation_y(math.pi / 2) @ p, [1, 0, 0, 1], atol=1e-6
    )
    p = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    assert np.allclose(
        tf.rotation_z(math.pi / 2) @ p, [-1, 0, 0, 1], atol=1e-6
    )

    p = np.array([2.0, 3.0, 4.0, 1.0], np.float32)
    assert np.allclose(tf.shearing(1, 0, 0, 0, 0, 0) @ p, [5, 3, 4, 1])
    assert np.allclose(tf.shearing(0, 0, 1, 0, 0, 0) @ p, [2, 5, 4, 1])


def test_builder_order():
    # The fluent builder applies ops in sequence (left-multiplied), matching
    # transformations.rs:63-118's chained test.
    p = np.array([1.0, 0.0, 1.0, 1.0], np.float32)
    m = (
        tf.Transform()
        .rotation_x(math.pi / 2)
        .scaling(5, 5, 5)
        .translation(10, 5, 7)
        .matrix
    )
    assert np.allclose(m @ p, [15, 0, 7, 1], atol=1e-5)


def test_view_transform():
    # transformations.rs:233-263
    m = tf.view_transform(_pt(0, 0, 0), _pt(0, 0, -1), _pt(0, 1, 0))
    assert np.allclose(m, np.eye(4))

    m = tf.view_transform(_pt(0, 0, 0), _pt(0, 0, 1), _pt(0, 1, 0))
    assert np.allclose(m, tf.scaling(-1, 1, -1))

    m = tf.view_transform(_pt(0, 0, 8), _pt(0, 0, 0), _pt(0, 1, 0))
    assert np.allclose(m, tf.translation(0, 0, -8))

    m = tf.view_transform(_pt(1, 3, 2), _pt(4, -2, 8), _pt(1, 1, 0))
    expected = np.array(
        [
            [-0.50709, 0.50709, 0.67612, -2.36643],
            [0.76772, 0.60609, 0.12122, -2.82843],
            [-0.35857, 0.59761, -0.71714, 0.00000],
            [0.00000, 0.00000, 0.00000, 1.00000],
        ]
    )
    assert np.allclose(m, expected, atol=1e-5)


def test_camera_pixel_size():
    c = Camera(200, 125, math.pi / 2)
    assert abs(c.pixel_size - 0.01) < 1e-6
    c = Camera(125, 200, math.pi / 2)
    assert abs(c.pixel_size - 0.01) < 1e-6


def test_camera_rays():
    c = Camera(201, 101, math.pi / 2)
    o, d = ray_for_pixel(c, 100, 50)
    assert np.allclose(o, [0, 0, 0], atol=1e-5)
    assert np.allclose(d, [0, 0, -1], atol=1e-4)

    o, d = ray_for_pixel(c, 0, 0)
    assert np.allclose(d, [0.66519, 0.33259, -0.66851], atol=1e-4)

    # camera.rs:116-119: translation first, then rotation (left-multiplied)
    c = c.with_transform(
        tf.Transform().translation(0, -2, 5).rotation_y(math.pi / 4)
    )
    o, d = ray_for_pixel(c, 100, 50)
    assert np.allclose(o, [0, 2, -5], atol=1e-4)
    s2 = math.sqrt(2) / 2
    assert np.allclose(d, [s2, 0, -s2], atol=1e-4)


def test_ppm_roundtrip():
    img = np.random.RandomState(0).rand(7, 5, 3).astype(np.float32)
    data = to_ppm_bytes(img)
    assert data.startswith(b"P3\n5 7\n255\n")
    back = from_ppm_bytes(data)
    assert back.shape == (7, 5, 3)
    assert np.abs(back - np.clip(img, 0, 1)).max() <= (0.5 / 255 + 1e-6)


def test_ppm_quantization_rounding():
    # clamp + round-half-away-from-zero (canvas.rs:70-76)
    img = np.array([[[-0.5, 0.0, 1.5], [0.5, 0.25196078, 1.0]]], np.float32)
    data = to_ppm_bytes(img)
    vals = [int(v) for v in data.split(b"\n", 3)[3].split()]
    assert vals[:3] == [0, 0, 255]
    # 0.5*255 = 127.5 -> 128 (not banker's 127); 0.25196*255 = 64.25 -> 64
    assert vals[3:6] == [128, 64, 255]


def test_bayer_matrix():
    b2 = bayer_matrix(2)
    assert np.allclose(b2 * 4, [[0, 2], [3, 1]])
    b4 = bayer_matrix(4)
    assert np.allclose(
        b4 * 16,
        [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]],
    )
    assert bayer_matrix(8).shape == (8, 8)
    assert np.isclose(bayer_matrix(16).sum(), (256 - 1) * 256 / 2 / 256)


def test_dithering_modes():
    c = Canvas(4, 4, np.full((4, 4, 3), 0.5, np.float32))
    c.apply_dithering(2, colored=True)
    assert c.pixels[0, 0, 0] == 0.5  # bayer[0][0] == 0
    c2 = Canvas(4, 4, np.full((4, 4, 3), 0.5, np.float32))
    c2.apply_dithering(2, colored=False)
    assert set(np.unique(c2.pixels)) <= {0.0, 1.0}
