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


def render_sharded(scene: T.Scene, camera, mesh: Mesh | None = None, *,
                   key=None, tile_rays=None):
    """Full-frame render with the ray axis sharded over ``mesh``.

    Tiles like the single-chip renderer (the depth-4 spawn tree of a
    whole frame does not fit HBM), with each tile's rays split across
    the mesh; tiles keep the screen-block ordering so every device gets
    a spatially coherent sub-block. Returns a float32 numpy image.
    """
    from raytracer_tpu.camera import ray_grid
    from raytracer_tpu.core.render import _block_order

    if mesh is None:
        mesh = make_mesh()
    if key is None:
        key = jax.random.PRNGKey(0)
    n_dev = mesh.devices.size
    if tile_rays is None:
        n_free_tris = scene.static.counts[5] - scene.static.n_csg_tris
        per_dev = 1 << 13 if n_free_tris > 20000 else 1 << 16
        tile_rays = per_dev * n_dev

    origins, directions = ray_grid(camera)
    n = origins.shape[0]
    tile = min(tile_rays, n)
    order = _block_order(
        camera.vsize, camera.hsize, max(int((tile // n_dev) ** 0.5), 1)
    )
    order_j = jnp.asarray(order)
    origins = origins[order_j]
    directions = directions[order_j]
    n_pad = -n % tile
    if n_pad:
        origins = jnp.pad(origins, ((0, n_pad), (0, 0)))
        directions = jnp.pad(
            directions, ((0, n_pad), (0, 0)), constant_values=1.0
        )

    scene = replicate_scene(scene, mesh)
    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    limit = scene.static.recursion_limit

    @jax.jit
    def run(scene, o, d, key):
        o = jax.lax.with_sharding_constraint(o, ray_sh)
        d = jax.lax.with_sharding_constraint(d, ray_sh)
        img = color_at(scene, o, d, key, limit)
        return jax.lax.with_sharding_constraint(img, ray_sh)

    parts = []
    for i in range(0, n + n_pad, tile):
        tkey = jax.random.fold_in(key, i)
        parts.append(run(scene, origins[i : i + tile],
                         directions[i : i + tile], tkey))
    img = np.asarray(jnp.concatenate(parts, 0)[:n], np.float32)
    out = np.empty_like(img)
    out[order] = img
    return out.reshape(camera.vsize, camera.hsize, 3)
