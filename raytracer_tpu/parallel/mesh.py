"""Mesh construction and sharded rendering.

Sharding layout (scaling-book style, pure DP over rays):

  * rays: ``NamedSharding(mesh, P("rays"))`` on axis 0 — each device owns a
    contiguous slab of the pixel grid;
  * scene: fully replicated (``P()``) — scene tables are small relative to
    HBM; meshes up to millions of triangles still fit replicated, and
    replication makes the forward pass collective-free.

The render itself is the same jitted program as single-chip
(:func:`raytracer_tpu.core.render.color_at`); only the shardings differ.
XLA partitions everything elementwise along the ray axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracer_tpu.core import types as T
from raytracer_tpu.core.render import color_at

RAY_AXIS = "rays"


def make_mesh(devices=None, axis: str = RAY_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate_scene(scene: T.Scene, mesh: Mesh) -> T.Scene:
    """Place every scene array on the mesh fully replicated."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), scene)


def shard_rays(origins, directions, mesh: Mesh, axis: str = RAY_AXIS):
    """Pad the ray batch to a multiple of the mesh size and shard axis 0."""
    n_dev = mesh.devices.size
    n = origins.shape[0]
    pad = -n % n_dev
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        # pad directions with a unit vector so normalize/intersect stay finite
        directions = jnp.concatenate(
            [directions, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))]
        )
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(origins, sh), jax.device_put(directions, sh), n


def render_sharded(scene: T.Scene, camera, mesh: Mesh | None = None, *, key=None):
    """Full-frame render with the ray axis sharded over ``mesh``.

    Returns a float32 numpy image [vsize, hsize, 3] gathered to the host.
    """
    from raytracer_tpu.camera import ray_grid

    if mesh is None:
        mesh = make_mesh()
    if key is None:
        key = jax.random.PRNGKey(0)

    origins, directions = ray_grid(camera)
    o, d, n = shard_rays(origins, directions, mesh)
    scene = replicate_scene(scene, mesh)

    out_sh = NamedSharding(mesh, P(RAY_AXIS))

    @jax.jit
    def run(scene, o, d, key):
        img = color_at(scene, o, d, key)
        return jax.lax.with_sharding_constraint(img, out_sh)

    img = run(scene, o, d, key)
    img = np.asarray(img)[:n]
    return img.reshape(camera.vsize, camera.hsize, 3).astype(np.float32)
