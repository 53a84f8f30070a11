"""Transparent-mesh refraction parity.

The reference's n1/n2 container walk consumes ALL intersections including
negative t (intersections.rs:141-160), and each triangle is its own
container object. The production candidate table keeps only two
free-triangle columns (nearest-positive + nearest-behind); these tests
prove that truncation exact against a DENSE per-triangle table fed to the
generic container walk (the reference-faithful oracle).
"""

import math

import numpy as np
import jax.numpy as jnp

from raytracer_tpu import transforms as tf
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core import intersect as I
from raytracer_tpu.core import shading as SH
from raytracer_tpu.core import types as T


GLASS = S.Material(transparency=1.0, refractive_index=1.5, reflective=0.0)


def tri_cube(material, scale=1.0):
    """A closed unit cube triangulated into 12 S.Triangle specs."""
    c = []
    s = scale
    # 8 corners
    P = {}
    for i, (x, y, z) in enumerate(
        [(x, y, z) for x in (-s, s) for y in (-s, s) for z in (-s, s)]
    ):
        P[i] = (x, y, z)
    # faces as corner-index quads (x-,x+,y-,y+,z-,z+), wound outward
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),
        (0, 4, 5, 1), (2, 3, 7, 6),
        (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    for a, b, d, e in quads:
        c.append(S.Triangle(p1=P[a], p2=P[b], p3=P[d], material=material))
        c.append(S.Triangle(p1=P[a], p2=P[d], p3=P[e], material=material))
    return c


def glass_scene():
    return build_scene(
        [S.PointLight(position=(-10.0, 10.0, -10.0)),
         S.Plane(transform=tf.translation(0, -3.0, 0),
                 material=S.Material(color=(0.8, 0.2, 0.2), specular=0.0)),
         S.Sphere(transform=tf.translation(5.0, 0.0, 0.0),
                  material=S.Material(transparency=0.9, refractive_index=1.3)),
         ]
        + tri_cube(GLASS)
    )


def dense_walk(scene, o, d):
    """Reference-faithful oracle: DENSE per-triangle candidate columns
    (every triangle, raw t incl. negative) + the generic container walk."""
    st = scene.static
    ts_s, gid_s, u_s, v_s = I._static_hits(scene, o, d)
    nt = st.counts[5]
    tri_off = sum(st.counts[:5])
    tts, tu, tv = I._tri_moller_trumbore(
        o, d, scene.tri_p1, scene.tri_e1, scene.tri_e2
    )
    gids = jnp.broadcast_to(
        jnp.arange(tri_off, tri_off + nt)[None, :], tts.shape
    )
    ts = jnp.concatenate([ts_s, tts], -1)
    gid = jnp.concatenate([gid_s, gids], -1)
    u = jnp.concatenate([u_s, tu], -1)
    v = jnp.concatenate([v_s, tv], -1)
    has, t, g, uu, vv, slot = I.first_hit(ts, gid, u, v)
    n1, n2 = SH.refraction_indices(scene, ts, gid, slot)
    return has, t, g, n1, n2


def fast_walk(scene, o, d):
    ts, gids, us, vs = I.candidate_hits(scene, o, d)
    has, t, g, uu, vv, slot = I.first_hit(ts, gids, us, vs)
    n1, n2 = SH.refraction_indices_fast(scene, ts, gids, slot)
    return has, t, g, n1, n2


def test_mesh_transparent_flag_and_layout():
    scene = glass_scene()
    assert scene.static.mesh_transparent
    o = jnp.zeros((4, 3))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    ts, gids, us, vs = I.candidate_hits(scene, o, d)
    obj, siblings, _ = I.candidate_meta(scene.static)
    assert ts.shape[-1] == len(obj)
    # opaque-mesh scenes keep the single nearest column
    sc2 = build_scene(
        [S.PointLight(position=(0, 5, 0)), S.Plane()]
        + tri_cube(S.Material())
    )
    assert not sc2.static.mesh_transparent
    ts2, g2, u2, v2 = I.candidate_hits(sc2, o, d)
    assert ts2.shape[-1] == ts.shape[-1] - 1 - 2  # no behind col, no sphere


def test_inside_mesh_ray_sees_glass_n1():
    """A ray spawned inside the glass tri-cube (the refracted continuation
    of an entry hit) must see n1 = n2 = 1.5 at the exit triangle — the
    entry triangle sits at negative t and is the open container."""
    scene = glass_scene()
    o = jnp.array([[0.0, 0.0, -0.999], [0.3, 0.2, -0.5]])
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 3))
    has, t, g, n1, n2 = fast_walk(scene, o, d)
    assert bool(has.all())
    np.testing.assert_allclose(np.asarray(n1), 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n2), 1.5, rtol=1e-6)

    # entering from outside: n1 = 1.0 (air), n2 = 1.5
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    has, t, g, n1, n2 = fast_walk(scene, o, d)
    assert bool(has.all())
    np.testing.assert_allclose(np.asarray(n1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n2), 1.5, rtol=1e-6)


def test_fast_walk_matches_dense_oracle_fuzz():
    """Production two-column path == dense all-triangles oracle, over a
    fuzzed ray set covering outside/inside/behind configurations."""
    scene = glass_scene()
    rng = np.random.default_rng(7)
    n = 256
    o = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    has_o, t_o, g_o, n1_o, n2_o = dense_walk(scene, o_j, d_j)
    has_f, t_f, g_f, n1_f, n2_f = fast_walk(scene, o_j, d_j)

    np.testing.assert_array_equal(np.asarray(has_o), np.asarray(has_f))
    m = np.asarray(has_o)
    np.testing.assert_allclose(
        np.asarray(t_o)[m], np.asarray(t_f)[m], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g_o)[m], np.asarray(g_f)[m])
    np.testing.assert_allclose(
        np.asarray(n1_o)[m], np.asarray(n1_f)[m], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(n2_o)[m], np.asarray(n2_f)[m], rtol=1e-6)


def test_glass_mesh_renders_straight_through():
    """Head-on through an axis-aligned glass tri-cube: entry is normal
    incidence (no bend) and exit has n1 == n2 (reference per-triangle
    semantics: no bend), so the see-through path is exactly straight and
    the red floor behind/below is reached where it would be without the
    cube. Smoke: the render is finite and the center pixel carries the
    refracted contribution."""
    import jax

    from raytracer_tpu.camera import Camera
    from raytracer_tpu.core.render import render

    items = (
        [S.PointLight(position=(-10.0, 10.0, -10.0)),
         S.Plane(transform=tf.translation(0, 0, 4.0) @ tf.rotation_x(math.pi / 2),
                 material=S.Material(color=(0.1, 0.9, 0.1), specular=0.0,
                                     ambient=0.5))]
        + tri_cube(GLASS)
    )
    scene = build_scene(items)
    cam = Camera(9, 9, math.pi / 4).with_transform(
        tf.view_transform((0, 0, -6), (0, 0, 0), (0, 1, 0)))
    img = render(scene, cam, tile_rays=128)
    assert np.isfinite(img).all()
    # center ray passes straight through to the green wall
    assert img[4, 4, 1] > 0.2
