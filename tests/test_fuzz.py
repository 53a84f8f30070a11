"""Seeded property tests: random scenes over the full feature matrix
must render finite colors and finite gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu import transforms as tf
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core.render import color_at


def random_material(rng):
    pattern = None
    kind = rng.choice([None, "striped", "gradient", "ring", "checker",
                       "xyz_rgb", "texture_map", "cube_map"])
    if kind == "texture_map":
        pattern = S.Pattern(
            "texture_map",
            mapping=str(rng.choice(["spherical", "planar", "cylindrical"])),
            uv_pattern=S.UvPatternSpec("checker", width=4, height=4,
                                       a=(1, 1, 1), b=(0, 0, 0)),
        )
    elif kind == "cube_map":
        face = S.UvPatternSpec("align_check", main=(1, 1, 0), ul=(0, 1, 1),
                               ur=(1, 0, 0), bl=(0, 0, 1), br=(1, 0.5, 0))
        pattern = S.Pattern("cube_map", **{
            f: face for f in ("left", "right", "front", "back", "up", "down")})
    elif kind is not None:
        pattern = S.Pattern(kind, a=tuple(rng.random(3)), b=tuple(rng.random(3)),
                            transform=tf.scaling(*(0.5 + rng.random(3))))
    return S.Material(
        color=tuple(rng.random(3)),
        ambient=float(rng.random() * 0.3),
        diffuse=float(rng.random()),
        specular=float(rng.random()),
        shininess=float(10 + rng.random() * 300),
        reflective=float(rng.choice([0.0, rng.random()])),
        transparency=float(rng.choice([0.0, rng.random()])),
        refractive_index=float(1.0 + rng.random()),
        pattern=pattern,
    )


def random_shape(rng):
    m = tf.Transform().scaling(*(0.3 + rng.random(3))) \
        .rotation_y(float(rng.random() * 6.28)) \
        .translation(*(rng.uniform(-3, 3, 3))).matrix
    mat = random_material(rng)
    kind = rng.integers(0, 6)
    if kind == 0:
        return S.Sphere(transform=m, material=mat)
    if kind == 1:
        return S.Plane(transform=m, material=mat, shadow=bool(rng.integers(2)))
    if kind == 2:
        return S.Cube(transform=m, material=mat)
    if kind == 3:
        return S.Cylinder(transform=m, material=mat, min=-1.0, max=1.0,
                          closed=bool(rng.integers(2)))
    if kind == 4:
        return S.Cone(transform=m, material=mat, min=-1.0, max=0.0,
                      closed=bool(rng.integers(2)))
    p = rng.uniform(-2, 2, (3, 3))
    return S.Triangle(transform=m, material=mat,
                      p1=tuple(p[0]), p2=tuple(p[1]), p3=tuple(p[2]))


@pytest.mark.parametrize("seed", [1, 2])
def test_random_scene_renders_finite(seed):
    rng = np.random.default_rng(seed)
    items = [S.PointLight(position=tuple(rng.uniform(-10, 10, 3)))]
    if seed % 2:
        items.append(S.AreaLight(
            corner=tuple(rng.uniform(-3, 3, 3)), uvec=(1.0, 0.0, 0.0),
            usteps=2, vvec=(0.0, 1.0, 0.0), vsteps=2))
    for _ in range(int(rng.integers(3, 9))):
        items.append(random_shape(rng))
    if seed == 2:
        items.append(S.Csg(op="difference", left=S.Sphere(),
                           right=S.Cube(transform=tf.translation(0.5, 0, 0))))
    scene = build_scene(items, recursion_limit=2)

    n = 64
    o = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
    d = rng.normal(0, 1, (n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    img = np.asarray(color_at(scene, o, d, key=jax.random.PRNGKey(seed)))
    assert np.isfinite(img).all(), f"non-finite colors, seed={seed}"

    # gradients of every float table stay finite too (one seed: the
    # grad graph of an area-light scene is compile-heavy)
    if seed == 2:
        from raytracer_tpu.parallel.train import partition_scene, render_loss
        params, recombine = partition_scene(scene)
        grads = jax.grad(render_loss)(
            params, recombine, o, d, jnp.zeros((n, 3)), jax.random.PRNGKey(seed))
        for k, gv in grads.items():
            assert np.isfinite(np.asarray(gv)).all(), f"non-finite grad {k}, seed={seed}"
