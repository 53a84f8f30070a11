"""Differentiable rendering: loss + sharded training step.

New capability vs the reference (which is forward-only): the whole render is
one differentiable JAX program, so scene parameters (material tables, light
intensities, pattern colors, transforms...) can be optimized against a
target image. Under a sharded ray axis XLA turns the parameter gradients
into a single ``psum`` (all-reduce) over ICI — the canonical data-parallel
training layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracer_tpu.core import types as T
from raytracer_tpu.core.render import color_at


# Float tables that are DERIVED from (or coupled to) other tables at scene
# build time: inv_tf pairs with normal_mat, the triangle vertex/edge tables
# pair with their precomputed world-space normals, pat_inv is the inverse of
# the pattern transform, and alight_pos is computed from corner/uvec/vvec.
# Optimizing one of these without recomputing its partners silently desyncs
# geometry from its shading normals, so they are excluded from the default
# grad surface (opt in with include_geometry=True and keep them consistent
# yourself, e.g. by reparameterizing on the source transform).
DERIVED_GEOMETRY = frozenset({
    "inv_tf", "normal_mat",
    "tri_p1", "tri_e1", "tri_e2",
    "tri_shade",
    "pat_inv",
    "alight_corner", "alight_uvec", "alight_vvec", "alight_pos",
    # packed copies of the triangle tables (builder.finish)
    "mesh_planes", "mesh_bb_chunk", "mesh_bb_super",
})


def partition_scene(scene: T.Scene, *, include_geometry: bool = False):
    """Split the scene into (diff_params, recombine_fn).

    ``diff_params`` is a dict of float-dtype array fields — the grad-able
    surface: materials, light intensities/positions, pattern colors, images.
    Integer/bool tables (ids, flags) stay static, and so do the
    :data:`DERIVED_GEOMETRY` tables unless ``include_geometry`` is set.
    """
    params, rest = {}, {}
    for f in dataclasses.fields(scene):
        if f.name == "static":
            continue
        val = getattr(scene, f.name)
        is_float = hasattr(val, "dtype") and jnp.issubdtype(val.dtype, jnp.floating)
        if is_float and (include_geometry or f.name not in DERIVED_GEOMETRY):
            params[f.name] = val
        else:
            rest[f.name] = val

    def recombine(p):
        return T.Scene(**p, **rest, static=scene.static)

    return params, recombine


def render_loss(params, recombine, origins, directions, target, key=None):
    """Mean-squared error between the rendered ray colors and ``target``."""
    scene = recombine(params)
    img = color_at(scene, origins, directions, key)
    return jnp.mean((img - target) ** 2)


def train_step(scene: T.Scene, origins, directions, target, *, lr=1e-2, key=None):
    """One SGD step on all float scene parameters. Returns (loss, scene')."""
    params, recombine = partition_scene(scene)
    loss, grads = jax.value_and_grad(render_loss)(
        params, recombine, origins, directions, target, key
    )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return loss, recombine(new_params)


def make_optax_step(optimizer, *, param_filter=None):
    """A jitted optax training step over the scene's float tables.

    ``optimizer`` is any optax GradientTransformation (adam, sgd, ...).
    ``param_filter``: optional predicate ``name -> bool`` choosing which
    scene tables to optimize (others stay frozen). Returns
    ``(init_fn(scene) -> opt_state, step_fn(scene, opt_state, o, d,
    target, key) -> (loss, scene', opt_state'))``.
    """
    import optax  # baked into the image; imported lazily

    def split(scene):
        params, recombine = partition_scene(scene)
        if param_filter is None:
            return params, {}, recombine
        train = {k: v for k, v in params.items() if param_filter(k)}
        frozen = {k: v for k, v in params.items() if not param_filter(k)}
        return train, frozen, recombine

    def init_fn(scene):
        train, _, _ = split(scene)
        return optimizer.init(train)

    @jax.jit
    def step_fn(scene, opt_state, origins, directions, target, key=None):
        train, frozen, recombine = split(scene)

        def loss_fn(p):
            return render_loss({**p, **frozen}, recombine, origins,
                               directions, target, key)

        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = optimizer.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)
        return loss, recombine({**train, **frozen}), opt_state

    return init_fn, step_fn


def make_sharded_train_step(mesh: Mesh, *, lr=1e-2):
    """A jitted train step with rays/targets sharded and params replicated.

    The returned fn has signature ``(scene, origins, directions, target,
    key) -> (loss, scene')``. Gradients of the replicated scene parameters
    against the sharded ray batch become one all-reduce, inserted by XLA.
    On a 2-D host x chip mesh (make_host_mesh) rays shard over both axes
    and the grad reduction happens chip-first (ICI) then host (DCN).
    """
    ray_sh = NamedSharding(mesh, P(mesh.axis_names))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(scene, origins, directions, target, key):
        origins = jax.lax.with_sharding_constraint(origins, ray_sh)
        directions = jax.lax.with_sharding_constraint(directions, ray_sh)
        target = jax.lax.with_sharding_constraint(target, ray_sh)
        params, recombine = partition_scene(scene)
        params = jax.tree.map(
            lambda p: jax.lax.with_sharding_constraint(p, rep), params
        )
        loss, grads = jax.value_and_grad(render_loss)(
            params, recombine, origins, directions, target, key
        )
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return loss, recombine(new_params)

    return step


def with_prim_transform(scene: T.Scene, gid: int, matrix):
    """Scene with primitive ``gid``'s world transform replaced,
    DIFFERENTIABLY: the world->object inverse and the normal matrix are
    recomputed from ``matrix`` inside the trace, so ``jax.grad`` w.r.t.
    the 4x4 (or a pose parameterization producing it) stays consistent —
    the raw-table alternative desyncs inv_tf from normal_mat (see
    DERIVED_GEOMETRY).

    Non-triangle primitives only (a mesh's vertices are pre-transformed
    to world space at build; reposing a mesh needs a scene rebuild).
    ``gid`` is the primitive's global id — for a single-shape family use
    ``sum(static.counts[:family_index]) + index_in_family``.
    """
    g_nt = sum(scene.static.counts[:5])
    if not 0 <= gid < g_nt:
        raise ValueError(
            f"gid {gid} is not a non-triangle primitive (0..{g_nt - 1})"
        )
    matrix = jnp.asarray(matrix, jnp.float32)
    inv = jnp.linalg.inv(matrix)
    nm = jnp.transpose(inv)[:3, :3]
    return dataclasses.replace(
        scene,
        inv_tf=scene.inv_tf.at[gid].set(inv),
        normal_mat=scene.normal_mat.at[gid].set(nm),
    )
