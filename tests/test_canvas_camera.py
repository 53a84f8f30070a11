"""Canvas/PPM, dithering and camera oracles (reference src/canvas.rs,
src/effects/dithering.rs, src/camera.rs tests)."""

import io
import math

import numpy as np

from raytracer_tpu import transforms as tf
from raytracer_tpu.camera import Camera, ray_for_pixel
from raytracer_tpu.canvas import (
    Canvas, bayer_matrix, from_ppm_bytes, to_ppm_bytes, quantize_u8,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.random((7, 5, 3)).astype(np.float32)
    back = from_ppm_bytes(to_ppm_bytes(img))
    assert back.shape == img.shape
    assert np.abs(back - np.clip(img, 0, 1)).max() <= 1 / 510 + 1e-6


def test_ppm_quantization():
    # canvas.rs:70-76: clamp then round-half-up
    px = np.array([[-0.5, 0.0, 1.5], [0.5, 0.998, 0.002]], np.float32)
    q = quantize_u8(px)
    assert list(q[0]) == [0, 0, 255]
    assert list(q[1]) == [128, 254, 1]


def test_ppm_header_and_maxval_normalization():
    data = to_ppm_bytes(np.ones((2, 3, 3), np.float32))
    assert data.startswith(b"P3\n3 2\n255\n")
    # decode normalizes by header maxval (canvas.rs:86-107)
    ppm = b"P3\n1 1\n100\n50 100 0\n"
    img = from_ppm_bytes(ppm)
    assert np.allclose(img[0, 0], [0.5, 1.0, 0.0])


def test_bayer_matrices():
    # dithering.rs:12-37: recursive Bayer, normalized by n*n
    b2 = bayer_matrix(2)
    assert np.allclose(b2 * 4, [[0, 2], [3, 1]])
    b4 = bayer_matrix(4)
    assert np.allclose(b4 * 16, [
        [0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5],
    ])


def test_dithering_threshold_and_color():
    c = Canvas(4, 4, np.full((4, 4, 3), 0.5, np.float32))
    c.apply_dithering(2, colored=False)
    # threshold mode: strictly 0/1, shape preserved (canvas.rs:40-53)
    assert c.pixels.shape == (4, 4, 3)
    assert set(np.unique(c.pixels)) <= {0.0, 1.0}
    # bayer[x%2][y%2] at (0,0)=0 -> 0.5 >= 0 stays white
    assert c.pixels[0, 0, 0] == 1.0

    c = Canvas(2, 2, np.zeros((2, 2, 3), np.float32))
    c.apply_dithering(2, colored=True)
    b2 = bayer_matrix(2)
    # additive color mode indexes bayer[x][y] with x = column
    assert np.allclose(c.pixels[0, 1, 0], b2[1, 0])


def test_camera_pixel_size():
    # camera.rs tests: 200x125 hfov pi/2 -> 0.01; 125x200 -> 0.01
    assert abs(Camera(200, 125, math.pi / 2).pixel_size - 0.01) < 1e-5
    assert abs(Camera(125, 200, math.pi / 2).pixel_size - 0.01) < 1e-5


def test_ray_through_canvas():
    cam = Camera(201, 101, math.pi / 2)
    o, d = ray_for_pixel(cam, 100, 50)
    assert np.allclose(o, [0, 0, 0], atol=1e-5)
    assert np.allclose(d, [0, 0, -1], atol=1e-5)

    o, d = ray_for_pixel(cam, 0, 0)
    assert np.allclose(d, [0.66519, 0.33259, -0.66851], atol=1e-4)

    cam = Camera(201, 101, math.pi / 2).with_transform(
        tf.Transform().translation(0.0, -2.0, 5.0).rotation_y(math.pi / 4).matrix
    )
    o, d = ray_for_pixel(cam, 100, 50)
    s2 = math.sqrt(2) / 2
    assert np.allclose(o, [0, 2, -5], atol=1e-4)
    assert np.allclose(d, [s2, 0, -s2], atol=1e-4)


def test_render_default_world_center_pixel(default_world):
    # camera.rs:106-126: 11x11 render, pixel (5,5)
    from raytracer_tpu.core.render import render
    cam = Camera(11, 11, math.pi / 2).with_transform(
        tf.view_transform((0, 0, -5), (0, 0, 0), (0, 1, 0))
    )
    img = render(default_world, cam)
    assert np.allclose(img[5, 5], [0.38066, 0.47583, 0.2855], atol=1e-4)


def test_canvas_io_helpers():
    c = Canvas(3, 2)
    c.write_pixel(1, 0, (0.25, 0.5, 0.75))
    assert np.allclose(c.pixel_at(1, 0), [0.25, 0.5, 0.75])
    buf = io.BytesIO()
    c.to_ppm(buf)
    c2 = Canvas.from_ppm(io.BytesIO(buf.getvalue()))
    assert c2.width == 3 and c2.height == 2
    assert np.allclose(c2.pixel_at(1, 0), [0.25, 0.5, 0.75], atol=1 / 255)


def test_render_quantize_matches_host_quantization(default_world):
    """render(quantize=True) must be bit-identical to host quantize_u8 of
    the float render, and u8/255 must round-trip through quantize_u8 (the
    CLI path converts the u8 image back to a float canvas)."""
    import math

    from raytracer_tpu import transforms as tf
    from raytracer_tpu.camera import Camera
    from raytracer_tpu.canvas import quantize_u8
    from raytracer_tpu.core.render import render

    cam = Camera(32, 24, math.pi / 3).with_transform(
        tf.view_transform((0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0))
    )
    f = render(default_world, cam)
    q = render(default_world, cam, quantize=True)
    assert q.dtype == np.uint8
    assert (quantize_u8(f) == q).all()
    # exact u8 -> float -> u8 round trip for all 256 values
    k = np.arange(256, dtype=np.uint8)
    assert (quantize_u8(k.astype(np.float32) / 255.0) == k).all()


def test_megapixel_ascii_decode_native_and_fallback():
    """from_ppm_bytes on a megapixel ASCII P3 texture: the native
    integer-stream scanner (native.ppm_decode_samples, wired as the fast
    path) and the pure-Python tokenizer must agree exactly, including
    '#' comments and a non-255 maxval."""
    from raytracer_tpu import native
    from raytracer_tpu.canvas import from_ppm_bytes, to_ppm_bytes

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (640, 520, 3), dtype=np.uint8)  # ~1.0 Msample
    data = to_ppm_bytes(img.astype(np.float32) / 255.0)
    # inject a comment line after the header to exercise comment skipping
    head, _, rest = data.partition(b"\n255\n")
    data = head + b"\n# a comment\n255\n" + rest
    out = from_ppm_bytes(data)
    assert out.shape == (640, 520, 3)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)

    if native.available():
        # force the pure-Python path and compare
        vals = native.ppm_decode_samples(data[2:], 3 + 640 * 520 * 3)
        assert vals is not None and len(vals) == 3 + 640 * 520 * 3
        import raytracer_tpu.canvas as C
        tokens = C._ppm_tokens(data)
        w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
        py = np.array(tokens[4:4 + w * h * 3], dtype=np.float32) / maxval
        np.testing.assert_array_equal(out.reshape(-1), py)

    # maxval normalization through the fast path
    small = b"P3\n2 1\n100\n100 50 0  25 75 100\n"
    out = from_ppm_bytes(small)
    np.testing.assert_allclose(
        out.reshape(-1), [1.0, 0.5, 0.0, 0.25, 0.75, 1.0], atol=1e-6)
