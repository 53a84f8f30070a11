"""Inverse rendering demo: recover a sphere's color from a target image.

No reference analogue — the whole renderer is one differentiable XLA
program, so scene parameters optimize by gradient descent against a
rendered target (SURVEY §7.7).

Run: python examples/inverse_render.py
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu import Camera, transforms as tf
from raytracer_tpu.camera import ray_grid
from raytracer_tpu.scene import Material, Plane, PointLight, Sphere, build_scene
from raytracer_tpu.parallel.train import partition_scene, render_loss


def make_scene(color):
    return build_scene([
        PointLight(position=(-10.0, 10.0, -10.0)),
        Plane(material=Material(specular=0.0)),
        Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
               material=Material(color=color, diffuse=0.7)),
    ], recursion_limit=1)


cam = Camera(64, 36, math.pi / 3).with_transform(
    tf.view_transform((0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0)))
origins, directions = ray_grid(cam)

# ground truth: a red sphere
truth = make_scene((0.9, 0.1, 0.1))
t_params, t_recombine = partition_scene(truth)
from raytracer_tpu.core.render import color_at
target = color_at(truth, origins, directions)

# start from a blue guess and descend
guess = make_scene((0.1, 0.2, 0.8))
params, recombine = partition_scene(guess)
value_and_grad = jax.jit(jax.value_and_grad(
    lambda p: render_loss(p, recombine, origins, directions, target)))

lr = 2.0
for step in range(120):
    loss, grads = value_and_grad(params)
    # optimize just the unknown (the sphere color) — everything else of
    # the scene is known here; full-scene optimization works the same way
    # with a per-parameter optimizer (optax) instead of plain SGD
    params["mat"] = params["mat"].at[0, :3].add(-lr * grads["mat"][0, :3])
    if step % 20 == 0:
        print(f"step {step:3d}  loss {float(loss):.6f}  "
              f"sphere color {np.asarray(params['mat'][0, :3]).round(3)}")

final = np.asarray(params["mat"][0, :3])
print(f"recovered color: {final.round(3)}  (truth: [0.9 0.1 0.1])")
assert np.allclose(final, [0.9, 0.1, 0.1], atol=0.05), final
print("OK")
