"""CSG oracles (reference src/csg.rs tests)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu import transforms as tf
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core import intersect as I
from raytracer_tpu.core import types as T
from raytracer_tpu.core.csg import _op_allowed


def hits(scene, origin, direction):
    o = jnp.asarray([origin], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    ts, gid, u, v = I.sorted_hits(scene, o, d)
    ts_np = np.asarray(ts[0])
    gid_np = np.asarray(gid[0])
    keep = np.isfinite(ts_np)
    return ts_np[keep], gid_np[keep]


def test_truth_table():
    # csg.rs:187-217: 24-row intersection_allowed table
    cases = [
        (T.CSG_UNION, True, True, True, False),
        (T.CSG_UNION, True, True, False, True),
        (T.CSG_UNION, True, False, True, False),
        (T.CSG_UNION, True, False, False, True),
        (T.CSG_UNION, False, True, True, False),
        (T.CSG_UNION, False, True, False, False),
        (T.CSG_UNION, False, False, True, True),
        (T.CSG_UNION, False, False, False, True),
        (T.CSG_INTERSECT, True, True, True, True),
        (T.CSG_INTERSECT, True, True, False, False),
        (T.CSG_INTERSECT, True, False, True, True),
        (T.CSG_INTERSECT, True, False, False, False),
        (T.CSG_INTERSECT, False, True, True, True),
        (T.CSG_INTERSECT, False, True, False, True),
        (T.CSG_INTERSECT, False, False, True, False),
        (T.CSG_INTERSECT, False, False, False, False),
        (T.CSG_DIFFERENCE, True, True, True, False),
        (T.CSG_DIFFERENCE, True, True, False, True),
        (T.CSG_DIFFERENCE, True, False, True, False),
        (T.CSG_DIFFERENCE, True, False, False, True),
        (T.CSG_DIFFERENCE, False, True, True, True),
        (T.CSG_DIFFERENCE, False, True, False, True),
        (T.CSG_DIFFERENCE, False, False, True, False),
        (T.CSG_DIFFERENCE, False, False, False, False),
    ]
    for op, lhit, inl, inr, expected in cases:
        got = _op_allowed(
            op, jnp.asarray([lhit]), jnp.asarray([inl]), jnp.asarray([inr])
        )
        assert bool(got[0]) == expected, (op, lhit, inl, inr)


def csg_scene(op, right_transform=None):
    """csg.rs:233-267: sphere (left) op sphere translated (0,0,0.5) (right)."""
    return build_scene([
        S.PointLight(position=(0, 0, 0)),
        S.Csg(op=op,
              left=S.Sphere(),
              right=S.Sphere(transform=right_transform
                             if right_transform is not None
                             else tf.translation(0.0, 0.0, 0.5))),
    ])


def test_union_filter():
    # csg.rs: union keeps xs[0] (t=4, s1) and xs[3] (t=6.5, s2)
    sc = csg_scene("union")
    ts, gid = hits(sc, (0, 0, -5), (0, 0, 1))
    assert np.allclose(ts, [4.0, 6.5], atol=1e-4), ts
    assert gid[0] == 0 and gid[1] == 1


def test_intersect_filter():
    # intersect keeps xs[1] (t=4.5, s2) and xs[2] (t=6, s1) — the overlap
    sc = csg_scene("intersect")
    ts, gid = hits(sc, (0, 0, -5), (0, 0, 1))
    assert np.allclose(ts, [4.5, 6.0], atol=1e-4), ts
    assert gid[0] == 1 and gid[1] == 0


def test_difference_filter():
    # difference keeps xs[0] (t=4, s1) and xs[1] (t=4.5, s2)
    sc = csg_scene("difference")
    ts, gid = hits(sc, (0, 0, -5), (0, 0, 1))
    assert np.allclose(ts, [4.0, 4.5], atol=1e-4), ts
    assert gid[0] == 0 and gid[1] == 1


def test_csg_miss():
    # csg.rs:219-231: ray that misses everything
    sc = csg_scene("union")
    ts, _ = hits(sc, (0, 2, -5), (0, 0, 1))
    assert ts.size == 0


def test_nested_csg():
    # difference of (union of two overlapping spheres) and a thin slab
    # cube at the middle: the slab's faces become surface, the sphere
    # hits inside the slab vanish.
    sc = build_scene([
        S.PointLight(position=(0, 0, 0)),
        S.Csg(op="difference",
              left=S.Csg(op="union",
                         left=S.Sphere(),
                         right=S.Sphere(transform=tf.translation(1.0, 0.0, 0.0))),
              right=S.Cube(transform=tf.Transform()
                           .scaling(2.0, 2.0, 0.2).translation(0.5, 0.0, 0.0).matrix)),
    ])
    # ray at x=0.25 (asymmetric so sphere hits don't coincide):
    # union surface enters t=4.0318 / exits 5.9682; slab faces 4.8 / 5.2
    ts, _ = hits(sc, (0.25, 0.0, -5.0), (0.0, 0.0, 1.0))
    assert ts.size == 4, ts
    assert np.allclose(ts, [4.03175, 4.8, 5.2, 5.96825], atol=1e-3)


def test_csg_sphere_cube_render():
    # End-to-end: sphere minus cube leaves visible sphere at off-cut rays
    sc = build_scene([
        S.PointLight(position=(-10, 10, -10)),
        S.Csg(op="difference",
              left=S.Sphere(material=S.Material(color=(1, 0, 0))),
              right=S.Cube(transform=tf.Transform()
                           .scaling(0.5, 0.5, 0.5).translation(0.7, 0.0, -0.7).matrix)),
    ])
    from raytracer_tpu.core.render import color_at
    # through sphere center: hit
    col = np.asarray(color_at(
        sc, jnp.asarray([[0.0, 0.0, -5.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
        limit=0)[0])
    assert col[0] > 0.5 and col[1] < 0.3
