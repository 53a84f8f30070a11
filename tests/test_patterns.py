"""Pattern oracles (reference src/patterns/*.rs tests)."""

import math

import numpy as np
import jax.numpy as jnp

from raytracer_tpu import transforms as tf
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core import patterns as P
from raytracer_tpu.core import types as T
from raytracer_tpu.core.patterns import pattern_color

WHITE = (1.0, 1.0, 1.0)
BLACK = (0.0, 0.0, 0.0)


def scene_with_pattern(pattern, shape_transform=None):
    return build_scene([
        S.PointLight(position=(0, 0, 0)),
        S.Sphere(transform=shape_transform, material=S.Material(pattern=pattern)),
    ])


def pat_at(sc, *points):
    pts = jnp.asarray(points, jnp.float32)
    gid = jnp.zeros(len(points), jnp.int32)
    return np.asarray(pattern_color(sc, gid, pts))


def test_striped():
    sc = scene_with_pattern(S.Pattern("striped", a=WHITE, b=BLACK))
    got = pat_at(sc, (0, 0, 0), (0, 1, 0), (0, 0, 2),   # constant in y, z
                 (0.9, 0, 0), (1, 0, 0), (-0.1, 0, 0), (-1, 0, 0), (-1.1, 0, 0))
    exp = [WHITE, WHITE, WHITE, WHITE, BLACK, BLACK, BLACK, WHITE]
    assert np.allclose(got, exp)


def test_gradient():
    sc = scene_with_pattern(S.Pattern("gradient", a=WHITE, b=BLACK))
    got = pat_at(sc, (0, 0, 0), (0.25, 0, 0), (0.5, 0, 0), (0.75, 0, 0))
    exp = [[1, 1, 1], [0.75, 0.75, 0.75], [0.5, 0.5, 0.5], [0.25, 0.25, 0.25]]
    assert np.allclose(got, exp, atol=1e-6)


def test_ring():
    sc = scene_with_pattern(S.Pattern("ring", a=WHITE, b=BLACK))
    got = pat_at(sc, (0, 0, 0), (1, 0, 0), (0, 0, 1), (0.708, 0, 0.708))
    exp = [WHITE, BLACK, BLACK, BLACK]
    assert np.allclose(got, exp)


def test_checker():
    sc = scene_with_pattern(S.Pattern("checker", a=WHITE, b=BLACK))
    got = pat_at(sc, (0, 0, 0), (0.99, 0, 0), (1.01, 0, 0),
                 (0, 0.99, 0), (0, 1.01, 0), (0, 0, 0.99), (0, 0, 1.01))
    exp = [WHITE, WHITE, BLACK, WHITE, BLACK, WHITE, BLACK]
    assert np.allclose(got, exp)


def test_xyz_rgb():
    sc = scene_with_pattern(S.Pattern("xyz_rgb"))
    got = pat_at(sc, (0.2, 0.3, 0.4))
    assert np.allclose(got, [[0.2, 0.3, 0.4]], atol=1e-6)


def test_pattern_transforms():
    # patterns.rs:79-91: object transform then pattern transform
    sc = scene_with_pattern(
        S.Pattern("striped", a=WHITE, b=BLACK),
        shape_transform=tf.scaling(2.0, 2.0, 2.0),
    )
    assert np.allclose(pat_at(sc, (1.5, 0, 0)), [WHITE])

    sc = scene_with_pattern(
        S.Pattern("striped", a=WHITE, b=BLACK, transform=tf.scaling(2.0, 2.0, 2.0)),
    )
    assert np.allclose(pat_at(sc, (1.5, 0, 0)), [WHITE])

    sc = scene_with_pattern(
        S.Pattern("striped", a=WHITE, b=BLACK,
                  transform=tf.translation(0.5, 0.0, 0.0)),
        shape_transform=tf.scaling(2.0, 2.0, 2.0),
    )
    assert np.allclose(pat_at(sc, (2.5, 0, 0)), [WHITE])


def test_spherical_mapping():
    # texture_map.rs:123-143
    s2 = math.sqrt(2.0) / 2.0
    cases = [
        ((0, 0, -1), 0.0, 0.5), ((1, 0, 0), 0.25, 0.5), ((0, 0, 1), 0.5, 0.5),
        ((-1, 0, 0), 0.75, 0.5), ((0, 1, 0), 0.5, 1.0), ((0, -1, 0), 0.5, 0.0),
        ((s2, s2, 0), 0.25, 0.75),
    ]
    pts = jnp.asarray([c[0] for c in cases], jnp.float32)
    u, v = P._uv_map(jnp.full(len(cases), T.MAP_SPHERICAL), pts)
    assert np.allclose(np.asarray(u), [c[1] for c in cases], atol=1e-4)
    assert np.allclose(np.asarray(v), [c[2] for c in cases], atol=1e-4)


def test_planar_cylindrical_mapping():
    # texture_map.rs:168-199
    cases_p = [
        ((0.25, 0, 0.5), 0.25, 0.5), ((0.25, 0, -0.25), 0.25, 0.75),
        ((0.25, 0.5, -0.25), 0.25, 0.75), ((1.25, 0, 0.5), 0.25, 0.5),
        ((0.25, 0, -1.75), 0.25, 0.25), ((1, 0, -1), 0.0, 0.0),
        ((0, 0, 0), 0.0, 0.0),
    ]
    pts = jnp.asarray([c[0] for c in cases_p], jnp.float32)
    u, v = P._uv_map(jnp.full(len(cases_p), T.MAP_PLANAR), pts)
    assert np.allclose(np.asarray(u), [c[1] for c in cases_p], atol=1e-5)
    assert np.allclose(np.asarray(v), [c[2] for c in cases_p], atol=1e-5)

    cases_c = [
        ((0, 0, -1), 0.0, 0.0), ((0, 0.5, -1), 0.0, 0.5), ((0, 1, -1), 0.0, 0.0),
        ((0.70711, 0.5, -0.70711), 0.125, 0.5), ((1, 0.5, 0), 0.25, 0.5),
        ((0.70711, 0.5, 0.70711), 0.375, 0.5), ((0, -0.25, 1), 0.5, 0.75),
        ((-0.70711, 0.5, 0.70711), 0.625, 0.5), ((-1, 1.25, 0), 0.75, 0.25),
        ((-0.70711, 0.5, -0.70711), 0.875, 0.5),
    ]
    pts = jnp.asarray([c[0] for c in cases_c], jnp.float32)
    u, v = P._uv_map(jnp.full(len(cases_c), T.MAP_CYLINDRICAL), pts)
    assert np.allclose(np.asarray(u), [c[1] for c in cases_c], atol=1e-4)
    assert np.allclose(np.asarray(v), [c[2] for c in cases_c], atol=1e-4)


def test_texture_map_spherical_checker():
    # texture_map.rs:145-166
    pat = S.Pattern("texture_map", mapping="spherical",
                    uv_pattern=S.UvPatternSpec("checker", width=16, height=8,
                                               a=BLACK, b=WHITE))
    sc = scene_with_pattern(pat)
    cases = [
        ((0.4315, 0.4670, 0.7719), WHITE), ((-0.9654, 0.2552, -0.0534), BLACK),
        ((0.1039, 0.7090, 0.6975), WHITE), ((-0.4986, -0.7856, -0.3663), BLACK),
        ((-0.0317, -0.9395, 0.3411), BLACK), ((0.4809, -0.7721, 0.4154), BLACK),
        ((0.0285, -0.9612, -0.2745), BLACK), ((-0.5734, -0.2162, -0.7903), WHITE),
        ((0.7688, -0.1470, 0.6223), BLACK), ((-0.7652, 0.2175, 0.6060), BLACK),
    ]
    got = pat_at(sc, *[c[0] for c in cases])
    assert np.allclose(got, [c[1] for c in cases])


def test_uv_checker_align_oracles():
    # uv_pattern.rs:150-183
    sc = scene_with_pattern(
        S.Pattern("texture_map", mapping="planar",
                  uv_pattern=S.UvPatternSpec("checker", width=2, height=2,
                                             a=BLACK, b=WHITE)))
    uv = jnp.asarray([0.0, 0.5, 0.0, 0.5], jnp.float32), jnp.asarray(
        [0.0, 0.0, 0.5, 0.5], jnp.float32)
    from raytracer_tpu.core.patterns import _uv_pattern_at
    got = np.asarray(_uv_pattern_at(sc, jnp.zeros(4, jnp.int32), uv[0], uv[1]))
    assert np.allclose(got, [BLACK, WHITE, WHITE, BLACK])

    main, ul, ur = WHITE, (1, 0, 0), (1, 1, 0)
    bl, br = (0, 1, 0), (0, 1, 1)
    sc = scene_with_pattern(
        S.Pattern("texture_map", mapping="planar",
                  uv_pattern=S.UvPatternSpec("align_check", main=main, ul=ul,
                                             ur=ur, bl=bl, br=br)))
    u = jnp.asarray([0.5, 0.1, 0.9, 0.1, 0.9], jnp.float32)
    v = jnp.asarray([0.5, 0.9, 0.9, 0.1, 0.1], jnp.float32)
    got = np.asarray(_uv_pattern_at(sc, jnp.zeros(5, jnp.int32), u, v))
    assert np.allclose(got, [main, ul, ur, bl, br])


def test_uv_image():
    # uv_pattern.rs:185-212: 10x10 gradient image, nearest with v-flip
    img = np.zeros((10, 10, 3), np.float32)
    for y in range(10):
        for x in range(10):
            img[y, x] = ((x + y) % 10) / 10.0
    sc = scene_with_pattern(
        S.Pattern("texture_map", mapping="planar",
                  uv_pattern=S.UvPatternSpec("image", image=img)))
    from raytracer_tpu.core.patterns import _uv_pattern_at
    u = jnp.asarray([0.0, 0.3, 0.6, 1.0], jnp.float32)
    v = jnp.asarray([0.0, 0.0, 0.3, 1.0], jnp.float32)
    got = np.asarray(_uv_pattern_at(sc, jnp.zeros(4, jnp.int32), u, v))
    exp = [[0.9] * 3, [0.2] * 3, [0.1] * 3, [0.9] * 3]
    assert np.allclose(got, exp, atol=1e-6)


def test_cube_map_faces():
    # cube_map.rs:143-193 uv tables + face selection
    faces = {}
    colors = dict(
        left=(1, 0, 0), right=(0, 1, 0), front=(0, 0, 1),
        back=(1, 1, 0), up=(1, 0, 1), down=(0, 1, 1),
    )
    for name, c in colors.items():
        faces[name] = S.UvPatternSpec("align_check", main=c, ul=c, ur=c, bl=c, br=c)
    sc = scene_with_pattern(S.Pattern("cube_map", **faces))
    cases = [
        ((-1, 0.5, -0.5), colors["left"]), ((1, 0.5, 0.5), colors["right"]),
        ((-0.5, 0.5, 1), colors["front"]), ((0.5, 0.5, -1), colors["back"]),
        ((-0.5, 1, -0.5), colors["up"]), ((-0.5, -1, 0.5), colors["down"]),
    ]
    got = pat_at(sc, *[c[0] for c in cases])
    assert np.allclose(got, [c[1] for c in cases])
