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


def test_csg_area_light_shadow_matches_bruteforce():
    """shadow_blocked's factored CSG path (quadric columns + dense CSG
    triangle columns + apply_csg on the flattened [R*S, C] table) must
    match the brute-force per-sample oracle: generic nearest_hit per
    flattened shadow ray, nearest positive hit's shadow flag deciding
    (world.rs:101-111). Covers the CSG x area-light combination, incl.
    a shadow:false CSG and a free mesh in the same scene."""
    import math

    sc = build_scene([
        S.AreaLight(corner=(-1.0, 4.0, -1.0), uvec=(2.0, 0.0, 0.0), usteps=3,
                    vvec=(0.0, 0.0, 2.0), vsteps=3),
        S.Plane(material=S.Material(specular=0.0)),
        S.Csg(op="difference",
              left=S.Sphere(transform=tf.translation(0.0, 1.5, 0.0)),
              right=S.Cube(transform=tf.Transform()
                           .scaling(0.6, 0.6, 0.6)
                           .translation(0.7, 1.9, -0.4).matrix)),
        S.Csg(op="intersect",
              left=S.Sphere(transform=tf.translation(-2.0, 1.2, 1.0),
                            shadow=False),
              right=S.Cube(transform=tf.Transform().scaling(0.8, 0.8, 0.8)
                           .translation(-2.0, 1.2, 1.0).matrix,
                           shadow=False)),
    ], jitter=(0.5,))

    # receiver points on the floor under/near the csg solids
    xs = np.linspace(-3.0, 3.0, 9, dtype=np.float32)
    zs = np.linspace(-2.0, 2.0, 5, dtype=np.float32)
    pts = np.array([[x, 1e-3, z] for x in xs for z in zs], np.float32)
    over = jnp.asarray(pts)
    r = over.shape[0]

    # the 3x3 jittered sample positions (cell centers with jitter 0.5)
    corner = np.array([-1.0, 4.0, -1.0], np.float32)
    uvec = np.array([2.0, 0.0, 0.0], np.float32) / 3
    vvec = np.array([0.0, 0.0, 2.0], np.float32) / 3
    samples = np.array([
        corner + (u + 0.5) * uvec + (v + 0.5) * vvec
        for u in range(3) for v in range(3)
    ], np.float32)
    pos = jnp.broadcast_to(jnp.asarray(samples)[None], (r, 9, 3))

    got = np.asarray(I.shadow_blocked(sc, over, pos))

    # brute force: one generic nearest_hit per flattened shadow ray
    v = np.asarray(pos) - pts[:, None]
    dist = np.linalg.norm(v, axis=-1)
    dirs = v / dist[..., None]
    flat_o = np.broadcast_to(pts[:, None], (r, 9, 3)).reshape(-1, 3)
    has, t, g, _, _ = I.nearest_hit(
        sc, jnp.asarray(flat_o), jnp.asarray(dirs.reshape(-1, 3)))
    flag = I.table_gather(sc.shadow, I.transform_row(sc, g))
    ref = (np.asarray(has) & (np.asarray(t) < dist.reshape(-1))
           & np.asarray(flag)).reshape(r, 9)

    np.testing.assert_array_equal(got, ref)
    assert got.any() and not got.all()  # scene exercises both outcomes


def test_csg_64_nodes_builds_and_renders():
    """The membership masks are uint64 words: a 64-node tree (the cap;
    csg.rs:26-49 is unbounded but no sample scene exceeds 5) must build
    and filter correctly through the highest bit."""
    # left-leaning chain of 64 unions over 65 disjoint unit spheres laid
    # out along x: the union of disjoint solids keeps every surface.
    tree = S.Sphere()
    for i in range(64):
        tree = S.Csg(op="union", left=tree,
                     right=S.Sphere(transform=tf.translation(
                         3.0 * (i + 1), 0.0, 0.0)))
    sc = build_scene([S.PointLight(position=(0, 0, 0)), tree])
    assert len(sc.static.csg_nodes) == 64
    # bit 63 really is in use on the deepest leaves
    assert max(u for _, u, _ in sc.static.csg_members) >> 63 == 1

    # a ray down z through sphere k of the chain must still hit it
    for k in (0, 1, 63, 64):
        ts, _ = hits(sc, (3.0 * k, 0.0, -5.0), (0.0, 0.0, 1.0))
        assert ts.size == 2 and np.allclose(ts, [4.0, 6.0], atol=1e-4), (k, ts)

    # and 65 nodes still raises
    import pytest
    over = tree
    for i in range(1):
        over = S.Csg(op="union", left=over,
                     right=S.Sphere(transform=tf.translation(-3.0, 0.0, 0.0)))
    with pytest.raises(ValueError, match="64 CSG nodes"):
        build_scene([S.PointLight(position=(0, 0, 0)), over])


def test_pairwise_filter_matches_sorted_fallback():
    """The sortless pairwise path (small trees) and the argsort+prefix
    fallback (wide trees) are two implementations of the same filter —
    they must agree column-for-column on random t-tables, including
    duplicate t values (tie-break by column index = stable sort)."""
    from raytracer_tpu.core.csg import _filter_pairwise, _filter_sorted

    rng = np.random.default_rng(7)
    # a nested tree: 3 nodes, 8 columns with interleaved memberships
    nodes = [(T.CSG_UNION, 2, 0), (T.CSG_INTERSECT, 1, 0), (T.CSG_DIFFERENCE, 0, 0)]
    under = np.array([0b111, 0b111, 0b101, 0b101, 0b011, 0b011, 0b001, 0b001],
                     np.uint64)
    left = np.array([0b110, 0b010, 0b100, 0b000, 0b011, 0b001, 0b001, 0b000],
                    np.uint64)
    for trial in range(5):
        ts = rng.normal(size=(64, 8)).astype(np.float32)
        # inject duplicates and infinities
        ts[ts > 1.0] = np.inf
        ts[:, 3] = ts[:, 1]  # exact duplicate column -> exercises tie-break
        sub = jnp.asarray(ts)
        got_p = np.asarray(_filter_pairwise(sub, nodes, under, left))
        got_s = np.asarray(_filter_sorted(sub, nodes, under, left))
        np.testing.assert_array_equal(got_p, got_s)
