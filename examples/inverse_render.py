"""Inverse rendering demo: recover a sphere's color from a target image.

No reference analogue — the whole renderer is one differentiable XLA
program, so scene parameters optimize by gradient descent against a
rendered target (SURVEY §7.7).

Run: python examples/inverse_render.py          (64x36 smoke, any backend)
     python examples/inverse_render.py --hd     (1280x720 on one TPU chip)

The --hd mode optimizes against a full 921,600-ray frame: per-level
rematerialization (render_loss's default) plus 8-way gradient-accumulation
microbatches (``n_micro``) keep the backward pass inside one chip's HBM —
the full-frame gradient without them needs several times the chip.
"""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu import Camera, transforms as tf
from raytracer_tpu.camera import ray_grid
from raytracer_tpu.scene import Material, Plane, PointLight, Sphere, build_scene
from raytracer_tpu.core.render import color_at
from raytracer_tpu.parallel.train import (
    partition_scene, render_loss_and_grad,
)


def make_scene(color):
    return build_scene([
        PointLight(position=(-10.0, 10.0, -10.0)),
        Plane(material=Material(specular=0.0)),
        Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
               material=Material(color=color, diffuse=0.7)),
    ], recursion_limit=1)


hd = "--hd" in sys.argv
hsize, vsize = (1280, 720) if hd else (64, 36)
n_micro = 8 if hd else None
steps = 60 if hd else 120

cam = Camera(hsize, vsize, math.pi / 3).with_transform(
    tf.view_transform((0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0)))
origins, directions = (jnp.asarray(a) for a in ray_grid(cam))

# ground truth: a red sphere. The target frame renders tile-by-tile (the
# production forward path) so even the 720p target needs no special care.
truth = make_scene((0.9, 0.1, 0.1))
if hd:
    from raytracer_tpu.core.render import render
    target = jnp.asarray(render(truth, cam).reshape(-1, 3))
else:
    target = color_at(truth, origins, directions)

# start from a blue guess and descend
guess = make_scene((0.1, 0.2, 0.8))
params, recombine = partition_scene(guess)
value_and_grad = jax.jit(lambda p: render_loss_and_grad(
    p, recombine, origins, directions, target, n_micro=n_micro))

lr = 2.0
losses = []
for step in range(steps):
    loss, grads = value_and_grad(params)
    losses.append(float(loss))
    # optimize just the unknown (the sphere color) — everything else of
    # the scene is known here; full-scene optimization works the same way
    # with a per-parameter optimizer (optax) instead of plain SGD
    params["mat"] = params["mat"].at[0, :3].add(-lr * grads["mat"][0, :3])
    if step % (4 if hd else 20) == 0:
        print(f"step {step:3d}  loss {float(loss):.6f}  "
              f"sphere color {np.asarray(params['mat'][0, :3]).round(3)}")

final = np.asarray(params["mat"][0, :3])
print(f"recovered color: {final.round(3)}  (truth: [0.9 0.1 0.1])")
head = losses[:21]
assert all(b < a for a, b in zip(head, head[1:])), (
    "loss not strictly decreasing over the first 20 steps")
assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
tol = 0.1 if hd else 0.05
assert np.allclose(final, [0.9, 0.1, 0.1], atol=tol), final
print(f"OK ({hsize}x{vsize}; loss {losses[0]:.5f} -> {losses[-1]:.5f} "
      f"over {len(losses)} steps)")
