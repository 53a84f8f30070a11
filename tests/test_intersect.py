"""Book-oracle intersection tests (sphere/plane/cube/cylinder/cone/triangle),
values from the reference's inline tests in src/shapes/*.rs."""

import math

import numpy as np
import jax.numpy as jnp

from raytracer_tpu import transforms as tf
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core import intersect as I


import jax

_sorted_hits = jax.jit(I.sorted_hits)


def hits(scene, origin, direction):
    o = jnp.asarray([origin], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    ts, gid, u, v = _sorted_hits(scene, o, d)
    ts = np.asarray(ts[0])
    return ts[np.isfinite(ts)]


def one(shape, **kw):
    light = S.PointLight(position=(0, 0, 0))
    return build_scene([light, shape], **kw)


def test_sphere_hits():
    sc = one(S.Sphere())
    assert np.allclose(hits(sc, (0, 0, -5), (0, 0, 1)), [4.0, 6.0])
    assert np.allclose(hits(sc, (0, 1, -5), (0, 0, 1)), [5.0, 5.0])
    assert hits(sc, (0, 2, -5), (0, 0, 1)).size == 0
    assert np.allclose(hits(sc, (0, 0, 0), (0, 0, 1)), [-1.0, 1.0])
    assert np.allclose(hits(sc, (0, 0, 5), (0, 0, 1)), [-6.0, -4.0])


def test_sphere_transformed():
    sc = one(S.Sphere(transform=tf.scaling(2, 2, 2)))
    assert np.allclose(hits(sc, (0, 0, -5), (0, 0, 1)), [3.0, 7.0])
    sc = one(S.Sphere(transform=tf.translation(5, 0, 0)))
    assert hits(sc, (0, 0, -5), (0, 0, 1)).size == 0


def test_plane_hits():
    sc = one(S.Plane())
    assert hits(sc, (0, 10, 0), (0, 0, 1)).size == 0  # parallel
    assert hits(sc, (0, 0, 0), (0, 0, 1)).size == 0   # coplanar
    assert np.allclose(hits(sc, (0, 1, 0), (0, -1, 0)), [1.0])
    assert np.allclose(hits(sc, (0, -1, 0), (0, 1, 0)), [1.0])


def test_cube_hits():
    # cube.rs:172-217 table
    sc = one(S.Cube())
    cases = [
        ((5, 0.5, 0), (-1, 0, 0), 4, 6),
        ((-5, 0.5, 0), (1, 0, 0), 4, 6),
        ((0.5, 5, 0), (0, -1, 0), 4, 6),
        ((0.5, -5, 0), (0, 1, 0), 4, 6),
        ((0.5, 0, 5), (0, 0, -1), 4, 6),
        ((0.5, 0, -5), (0, 0, 1), 4, 6),
        ((0, 0.5, 0), (0, 0, 1), -1, 1),
    ]
    for o, d, t1, t2 in cases:
        assert np.allclose(hits(sc, o, d), [t1, t2]), (o, d)
    misses = [
        ((-2, 0, 0), (0.2673, 0.5345, 0.8018)),
        ((0, -2, 0), (0.8018, 0.2673, 0.5345)),
        ((0, 0, -2), (0.5345, 0.8018, 0.2673)),
        ((2, 0, 2), (0, 0, -1)),
        ((0, 2, 2), (0, -1, 0)),
        ((2, 2, 0), (-1, 0, 0)),
    ]
    for o, d in misses:
        assert hits(sc, o, d).size == 0, (o, d)


def _norm(v):
    v = np.asarray(v, np.float64)
    return tuple(v / np.linalg.norm(v))


def test_cylinder_hits():
    # cylinder.rs tests: misses, exact hits, truncation, caps
    sc = one(S.Cylinder())
    assert hits(sc, (1, 0, 0), (0, 1, 0)).size == 0
    assert hits(sc, (0, 0, 0), (0, 1, 0)).size == 0
    assert hits(sc, (0, 0, -5), _norm((1, 1, 1))).size == 0
    assert np.allclose(hits(sc, (1, 0, -5), (0, 0, 1)), [5.0, 5.0])
    assert np.allclose(hits(sc, (0, 0, -5), (0, 0, 1)), [4.0, 6.0])
    got = hits(sc, (0.5, 0, -5), _norm((0.1, 1, 1)))
    assert np.allclose(got, [6.80798, 7.08872], atol=1e-4)

    trunc = one(S.Cylinder(min=1.0, max=2.0))
    assert hits(trunc, (0, 1.5, 0), _norm((0.1, 1, 0))).size == 0
    assert hits(trunc, (0, 3, -5), (0, 0, 1)).size == 0
    assert hits(trunc, (0, 0, -5), (0, 0, 1)).size == 0
    assert hits(trunc, (0, 2, -5), (0, 0, 1)).size == 0
    assert hits(trunc, (0, 1, -5), (0, 0, 1)).size == 0
    assert hits(trunc, (0, 1.5, -2), (0, 0, 1)).size == 2

    closed = one(S.Cylinder(min=1.0, max=2.0, closed=True))
    assert hits(closed, (0, 3, 0), (0, -1, 0)).size == 2
    assert hits(closed, (0, 3, -2), _norm((0, -1, 2))).size == 2
    # Corner cases: the ray passes exactly through the cap edge (y and the
    # radius are both on the boundary); FMA rounding may duplicate the
    # corner hit, so compare distinct t values instead of counts.
    got = np.unique(np.round(hits(closed, (0, 4, -2), _norm((0, -1, 1))), 4))
    assert np.allclose(got, [2.8284, 4.2426], atol=1e-3)
    assert hits(closed, (0, 0, -2), _norm((0, 1, 2))).size == 2
    got = np.unique(np.round(hits(closed, (0, -1, -2), _norm((0, 1, 1))), 4))
    assert np.allclose(got, [2.8284, 4.2426], atol=1e-3)


def test_cone_hits():
    sc = one(S.Cone())
    assert np.allclose(hits(sc, (0, 0, -5), (0, 0, 1)), [5.0, 5.0])
    # (0,0,-5)/(1,1,1) dropped: discriminant lands at -4e-6 in f32; the
    # reference disables the same case (cone.rs:231-236).
    got = hits(sc, (1, 1, -5), _norm((-0.5, -1, 1)))
    assert np.allclose(got, [4.55006, 49.44994], atol=1e-3)
    # parallel to one half: single hit (cone.rs:131-141)
    got = hits(sc, (0, 0, -1), _norm((0, 1, 1)))
    assert np.allclose(got, [0.35355], atol=1e-4)

    closed = one(S.Cone(min=-0.5, max=0.5, closed=True))
    assert hits(closed, (0, 0, -5), (0, 1, 0)).size == 0
    assert hits(closed, (0, 0, -0.25), _norm((0, 1, 1))).size == 2
    assert hits(closed, (0, 0, -0.25), (0, 1, 0)).size == 4


def test_triangle_hits():
    tri = S.Triangle(p1=(0, 1, 0), p2=(-1, 0, 0), p3=(1, 0, 0))
    sc = one(tri)
    # parallel ray misses
    assert hits(sc, (0, -1, -2), (0, 1, 0)).size == 0
    # misses p1-p3 edge / p1-p2 edge / p2-p3 edge
    assert hits(sc, (1, 1, -2), (0, 0, 1)).size == 0
    assert hits(sc, (-1, 1, -2), (0, 0, 1)).size == 0
    assert hits(sc, (0, -1, -2), (0, 0, 1)).size == 0
    # strikes
    assert np.allclose(hits(sc, (0, 0.5, -2), (0, 0, 1)), [2.0])


def test_smooth_triangle_uv():
    tri = S.SmoothTriangle(
        p1=(0, 1, 0), p2=(-1, 0, 0), p3=(1, 0, 0),
        n1=(0, 1, 0), n2=(-1, 0, 0), n3=(1, 0, 0),
    )
    sc = one(tri)
    import jax.numpy as jnp
    o = jnp.asarray([(-0.2, 0.3, -2.0)], jnp.float32)
    d = jnp.asarray([(0.0, 0.0, 1.0)], jnp.float32)
    ts, gid, u, v = I.sorted_hits(sc, o, d)
    has, t, g, uu, vv, slot = I.first_hit(ts, gid, u, v)
    assert bool(has[0])
    assert abs(float(uu[0]) - 0.45) < 1e-4
    assert abs(float(vv[0]) - 0.25) < 1e-4


def test_world_intersect(default_world):
    # world.rs:169-177: 4 hits at 4, 4.5, 5.5, 6
    got = hits(default_world, (0, 0, -5), (0, 0, 1))
    assert np.allclose(got, [4.0, 4.5, 5.5, 6.0])


def test_scaled_instance_det_epsilon():
    """The MT parallel test runs in OBJECT space in the reference
    (triangle.rs:96): a triangle from a scaled-DOWN instance must still
    be hit even when its world-space det falls below the fixed EPSILON.
    (r5 regression: a fixed world-space 1e-4 erased entire dragons-scale
    meshes — every |e1 x e2| ~ 1e-5.)"""
    import jax.numpy as jnp
    from raytracer_tpu import transforms as tf
    from raytracer_tpu.constants import EPSILON

    # unit triangle scaled down: world |e1 x e2| = 2*s^2 < EPSILON
    s = 0.005
    tri = S.Triangle(p1=(0, 1, 0), p2=(-1, 0, 0), p3=(1, 0, 0),
                     transform=tf.scaling(s, s, s))
    sc = one(tri)
    # world-space normal magnitude |e1 x e2| = 2*area = s^2 * 2*area_obj
    e1 = np.asarray(sc.tri_e1[0]); e2 = np.asarray(sc.tri_e2[0])
    assert np.linalg.norm(np.cross(e1, e2)) < EPSILON  # would fail old test
    # per-instance threshold stored: EPSILON * |det(scale)| = 1e-4 * 8e-6
    assert float(sc.tri_det_eps[0]) < EPSILON
    np.testing.assert_allclose(float(sc.tri_det_eps[0]), EPSILON * s**3,
                               rtol=1e-5)

    o = jnp.asarray([(0.0, s * 0.3, -2.0)], jnp.float32)
    d = jnp.asarray([(0.0, 0.0, 1.0)], jnp.float32)
    ts, gid, u, v = I.sorted_hits(sc, o, d)
    has, t, g, uu, vv, slot = I.first_hit(ts, gid, u, v)
    assert bool(has[0]), "scaled-down triangle must be hit (reference does)"
    assert abs(float(t[0]) - 2.0) < 1e-3

    # a truly grazing ray (parallel to the triangle plane) still misses
    d_par = jnp.asarray([(1.0, 0.0, 0.0)], jnp.float32)
    o_in = jnp.asarray([(-2.0, s * 0.3, 0.0)], jnp.float32)
    ts2, gid2, u2, v2 = I.sorted_hits(sc, o_in, d_par)
    has2, *_ = I.first_hit(ts2, gid2, u2, v2)
    assert not bool(has2[0])
