"""World-level shading oracles (reference src/world.rs tests), driven
through the public wavefront color_at over 1-ray batches."""

import math

import numpy as np
import jax.numpy as jnp

from raytracer_tpu import transforms as tf
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core.render import color_at, shadowed

S2 = math.sqrt(2.0)


def default_items(**mat1):
    m1 = dict(color=(0.8, 1.0, 0.6), diffuse=0.7, specular=0.2)
    m1.update(mat1)
    return [
        S.PointLight(position=(-10.0, 10.0, -10.0)),
        S.Sphere(material=S.Material(**m1)),
        S.Sphere(transform=tf.scaling(0.5, 0.5, 0.5)),
    ]


def shade(scene, origin, direction, limit=4):
    o = jnp.asarray([origin], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    return np.asarray(color_at(scene, o, d, limit=limit)[0])


def test_color_at_miss_and_hit(default_world):
    # world.rs:198-206
    assert np.allclose(shade(default_world, (0, 0, -5), (0, 1, 0), 1), 0.0)
    got = shade(default_world, (0, 0, -5), (0, 0, 1), 1)
    assert np.allclose(got, [0.38066, 0.47583, 0.2855], atol=1e-4)


def test_shading_inside(default_world):
    # world.rs:186-195: light moved inside, hit on the inner sphere
    items = default_items()
    items[0] = S.PointLight(position=(0.0, 0.25, 0.0))
    sc = build_scene(items)
    got = shade(sc, (0, 0, 0), (0, 0, 1), 1)
    assert np.allclose(got, [0.90498, 0.90498, 0.90498], atol=1e-4)


def test_color_at_behind_ray():
    # world.rs:206-213: ambient=1 everywhere, ray hits inner sphere's back
    items = default_items(ambient=1.0)
    items[2] = S.Sphere(
        transform=tf.scaling(0.5, 0.5, 0.5), material=S.Material(ambient=1.0)
    )
    sc = build_scene(items)
    got = shade(sc, (0, 0, 0.75), (0, 0, -1), 1)
    assert np.allclose(got, [1.0, 1.0, 1.0], atol=1e-4)  # inner color (white)


def test_shade_hit_in_shadow():
    # world.rs:214-228: sphere shadowed by another sphere
    sc = build_scene([
        S.PointLight(position=(0.0, 0.0, -10.0)),
        S.Sphere(),
        S.Sphere(transform=tf.translation(0.0, 0.0, 10.0)),
    ])
    got = shade(sc, (0, 0, 5), (0, 0, 1), 1)
    assert np.allclose(got, [0.1, 0.1, 0.1], atol=1e-4)


def test_is_shadowed(default_world):
    # world.rs:229-243 (light position (-10,-10,-10) variant)
    light = jnp.asarray([[-10.0, -10.0, -10.0]])
    cases = [
        ((-10.0, -10.0, 10.0), False),
        ((10.0, 10.0, 10.0), True),
        ((-20.0, -20.0, -20.0), False),
        ((-5.0, -5.0, -5.0), False),
    ]
    pts = jnp.asarray([c[0] for c in cases], jnp.float32)
    got = np.asarray(shadowed(default_world, pts, light))
    assert list(got) == [c[1] for c in cases]


def test_reflected_color_and_shade():
    # world.rs:246-284: reflective plane under the default world
    items = default_items() + [
        S.Plane(transform=tf.translation(0.0, -1.0, 0.0),
                material=S.Material(reflective=0.5)),
    ]
    sc = build_scene(items)
    got = shade(sc, (0, 0, -3), (0, -S2 / 2, S2 / 2), 1)
    assert np.allclose(got, [0.87677, 0.92436, 0.82918], atol=1e-3)


def test_infinite_mirrors_terminate():
    # world.rs:285-299: two facing mirrors must not recurse forever
    sc = build_scene([
        S.PointLight(position=(0.0, 0.0, 0.0)),
        S.Plane(transform=tf.translation(0.0, -1.0, 0.0),
                material=S.Material(reflective=1.0)),
        S.Plane(transform=tf.translation(0.0, 1.0, 0.0),
                material=S.Material(reflective=1.0)),
    ])
    got = shade(sc, (0, 0, 0), (0, 1, 0), 4)
    assert np.isfinite(got).all()


def test_refracted_floor_shade():
    # world.rs:344-369: half-transparent floor over a red ball
    items = default_items() + [
        S.Plane(transform=tf.translation(0.0, -1.0, 0.0),
                material=S.Material(transparency=0.5, refractive_index=1.5)),
        S.Sphere(transform=tf.translation(0.0, -3.5, -0.5),
                 material=S.Material(color=(1.0, 0.0, 0.0), ambient=0.5)),
    ]
    sc = build_scene(items)
    got = shade(sc, (0, 0, -3), (0, -S2 / 2, S2 / 2), 1)
    assert np.allclose(got, [0.93642, 0.68642, 0.68642], atol=1e-3)


def test_schlick_blended_floor_shade():
    # world.rs:370-401: reflective AND transparent floor -> Schlick blend
    items = default_items() + [
        S.Plane(transform=tf.translation(0.0, -1.0, 0.0),
                material=S.Material(reflective=0.5, transparency=0.5,
                                    refractive_index=1.5)),
        S.Sphere(transform=tf.translation(0.0, -3.5, -0.5),
                 material=S.Material(color=(1.0, 0.0, 0.0), ambient=0.5)),
    ]
    sc = build_scene(items)
    got = shade(sc, (0, 0, -3), (0, -S2 / 2, S2 / 2), 1)
    assert np.allclose(got, [0.93391, 0.69643, 0.69243], atol=1e-3)


def test_shadow_opt_out():
    # world.rs:107 / scene.rs:313: shadow:false shapes don't cast shadows
    blocker = S.Sphere(transform=tf.translation(0.0, 0.0, 10.0))
    for shadow, expect_dark in ((True, True), (False, False)):
        sc = build_scene([
            S.PointLight(position=(0.0, 0.0, -10.0)),
            S.Sphere(shadow=shadow),
            blocker,
        ])
        got = shade(sc, (0, 0, 5), (0, 0, 1), 1)
        if expect_dark:
            assert np.allclose(got, [0.1, 0.1, 0.1], atol=1e-4)


def test_group_transform_composition():
    # groups.rs:398-405: sphere t(5,0,0) inside group scaled 2x
    sc = build_scene([
        S.PointLight(position=(0, 0, 0)),
        S.Group(transform=tf.scaling(2.0, 2.0, 2.0),
                children=[S.Sphere(transform=tf.translation(5.0, 0.0, 0.0))]),
    ])
    from raytracer_tpu.core import intersect as I
    o = jnp.asarray([(10.0, 0.0, -10.0)], jnp.float32)
    d = jnp.asarray([(0.0, 0.0, 1.0)], jnp.float32)
    ts, gid, u, v = I.sorted_hits(sc, o, d)
    ts = np.asarray(ts[0])
    assert np.isfinite(ts).sum() == 2


def test_group_normal_composition():
    # groups.rs:408-441: nested groups rot_y(pi/2) * scale(1,2,3) * t(5,0,0)
    from raytracer_tpu.core import shading as SH
    sc = build_scene([
        S.PointLight(position=(0, 0, 0)),
        S.Group(transform=tf.rotation_y(math.pi / 2), children=[
            S.Group(transform=tf.scaling(1.0, 2.0, 3.0), children=[
                S.Sphere(transform=tf.translation(5.0, 0.0, 0.0)),
            ]),
        ]),
    ])
    p = jnp.asarray([(1.7321, 1.1547, -5.5774)], jnp.float32)
    n = SH.normal_at(sc, jnp.asarray([0]), p, jnp.zeros(1), jnp.zeros(1))
    assert np.allclose(np.asarray(n[0]), [0.2857, 0.4286, -0.8571], atol=1e-3)


def test_merged_spawn_matches_concatenated_tree():
    """A scene with reflective AND transparent materials on DIFFERENT
    objects takes the constant-width merged-spawn path (has_blend=False);
    forcing has_blend=True replays the same rays through the doubling
    concatenated tree. Both must agree exactly at every depth."""
    import dataclasses

    items = default_items() + [
        S.Plane(transform=tf.translation(0.0, -1.0, 0.0),
                material=S.Material(reflective=0.5)),
        S.Sphere(transform=tf.translation(0.0, 0.0, -2.0),
                 material=S.Material(transparency=0.9, refractive_index=1.5,
                                     color=(0.1, 0.1, 0.1), diffuse=0.1)),
    ]
    sc = build_scene(items)
    assert not sc.static.has_blend
    sc_tree = dataclasses.replace(
        sc, static=dataclasses.replace(sc.static, has_blend=True)
    )

    n = 33
    ang = np.linspace(0.0, 2 * np.pi, n, dtype=np.float32)
    o = jnp.asarray(np.stack([np.sin(ang), 0.3 * np.cos(ang),
                              np.full(n, -4.0, np.float32)], -1))
    d = jnp.asarray(np.stack([0.2 * np.sin(3 * ang), -0.2 * np.cos(2 * ang),
                              np.ones(n, np.float32)], -1))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    for limit in (1, 2, 4):
        merged = np.asarray(color_at(sc, o, d, limit=limit))
        tree = np.asarray(color_at(sc_tree, o, d, limit=limit))
        np.testing.assert_allclose(merged, tree, rtol=1e-5, atol=1e-6)


def test_packed_shade_level_matches_plain():
    """_packed_shade_level (live-compaction + narrow-width lax.cond) must
    be EXACTLY shade_level up to the parked tail: identical weighted
    surface color, identical spawn weights, and identical spawn rays
    wherever the spawn weight is non-zero (zero-weight spawns are parked
    by color_at either way). Tolerance is 1-2 ULP: XLA lowers the same
    per-ray math slightly differently at different batch widths."""
    from raytracer_tpu.core.render import shade_level, _packed_shade_level

    items = default_items() + [
        S.Plane(transform=tf.translation(0.0, -1.0, 0.0),
                material=S.Material(reflective=0.5)),
    ]
    sc = build_scene(items)

    r = 4096
    rng = np.random.default_rng(7)
    ang = rng.uniform(0.0, 2 * np.pi, r).astype(np.float32)
    o = jnp.asarray(np.stack([np.sin(ang), 0.3 * np.cos(ang),
                              np.full(r, -4.0, np.float32)], -1))
    d = np.stack([0.2 * np.sin(3 * ang), -0.2 * np.cos(2 * ang),
                  np.ones(r, np.float32)], -1)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    # sparse liveness patterns covering all three width branches
    for frac in (0.01, 0.2, 0.9):
        w = np.where(rng.uniform(size=(r, 1)) < frac,
                     rng.uniform(0.2, 1.0, (r, 3)), 0.0).astype(np.float32)
        w = jnp.asarray(w)
        tight = dict(rtol=1e-5, atol=1e-7)
        col_a, refl_a, refr_a = shade_level(sc, o, d, w, None)
        col_b, refl_b, refr_b = _packed_shade_level(sc, o, d, w, None)
        np.testing.assert_allclose(np.asarray(col_a), np.asarray(col_b), **tight)
        for (ao, ad, aw), (bo, bd, bw) in ((refl_a, refl_b), (refr_a, refr_b)):
            np.testing.assert_allclose(np.asarray(aw), np.asarray(bw), **tight)
            live = np.asarray(aw).any(-1)
            np.testing.assert_allclose(
                np.asarray(ao)[live], np.asarray(bo)[live], **tight)
            np.testing.assert_allclose(
                np.asarray(ad)[live], np.asarray(bd)[live], **tight)
