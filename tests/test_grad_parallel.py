"""Differentiability (finite-difference checks) and multi-device sharding
tests — capabilities beyond the reference (forward-only, single process)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu import transforms as tf
from raytracer_tpu.camera import Camera, ray_grid
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core.render import color_at
from raytracer_tpu.parallel.mesh import make_mesh, render_sharded
from raytracer_tpu.parallel.train import (
    partition_scene, render_loss, train_step, make_sharded_train_step,
)


def small_setup():
    scene = build_scene([
        S.PointLight(position=(-10.0, 10.0, -10.0)),
        S.Plane(material=S.Material(specular=0.0, reflective=0.2)),
        S.Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
                 material=S.Material(color=(0.1, 0.4, 0.9), diffuse=0.7)),
    ])
    cam = Camera(16, 8, math.pi / 3).with_transform(
        tf.view_transform((0, 1.5, -5), (0, 1, 0), (0, 1, 0))
    )
    o, d = ray_grid(cam)
    return scene, cam, o, d


def test_gradient_matches_finite_difference():
    scene, _, o, d = small_setup()
    target = jnp.zeros((o.shape[0], 3))
    params, recombine = partition_scene(scene)

    loss_fn = lambda p: render_loss(p, recombine, o, d, target)
    grads = jax.grad(loss_fn)(params)

    # finite differences on a handful of material entries
    eps = 1e-3
    checked = 0
    # gid 0 = the sphere (family order), gid 1 = the plane
    for (g_idx, col) in [(0, 0), (0, 3), (1, 4)]:  # color.r, ambient, diffuse
        base = params["mat"]
        g_analytic = float(grads["mat"][g_idx, col])
        pp = dict(params)
        pp["mat"] = base.at[g_idx, col].add(eps)
        up = float(loss_fn(pp))
        pp["mat"] = base.at[g_idx, col].add(-eps)
        dn = float(loss_fn(pp))
        g_numeric = (up - dn) / (2 * eps)
        assert abs(g_analytic - g_numeric) < 5e-3 * max(1.0, abs(g_numeric)), (
            g_idx, col, g_analytic, g_numeric)
        checked += 1
    assert checked == 3

    # light intensity gradient
    g_analytic = float(grads["plight_intensity"][0, 0])
    base = params["plight_intensity"]
    pp = dict(params)
    pp["plight_intensity"] = base.at[0, 0].add(eps)
    up = float(loss_fn(pp))
    pp["plight_intensity"] = base.at[0, 0].add(-eps)
    dn = float(loss_fn(pp))
    g_numeric = (up - dn) / (2 * eps)
    assert abs(g_analytic - g_numeric) < 5e-3 * max(1.0, abs(g_numeric))


def test_camera_rays_jax_match_and_grad():
    from raytracer_tpu.camera import ray_grid, ray_grid_jax, view_transform_jax

    scene, cam, _, _ = small_setup()
    o_np, d_np = ray_grid(cam)
    cam_inv = jnp.linalg.inv(view_transform_jax(
        (0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0)))
    o_j, d_j = ray_grid_jax(cam_inv, cam.hsize, cam.vsize, cam.field_of_view)
    assert np.allclose(np.asarray(o_j), np.asarray(o_np), atol=1e-5)
    assert np.allclose(np.asarray(d_j), np.asarray(d_np), atol=1e-5)

    # camera-pose gradient: loss of rendered image w.r.t. eye position
    target = jnp.zeros((cam.hsize * cam.vsize, 3))

    def loss(from_p):
        inv = jnp.linalg.inv(view_transform_jax(
            from_p, jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0])))
        o, d = ray_grid_jax(inv, cam.hsize, cam.vsize, cam.field_of_view)
        img = color_at(scene, o, d, limit=0)
        return jnp.mean((img - target) ** 2)

    f0 = jnp.asarray([0.0, 1.5, -5.0])
    g = jax.grad(loss)(f0)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-2
    for k in range(3):
        up = float(loss(f0.at[k].add(eps)))
        dn = float(loss(f0.at[k].add(-eps)))
        num = (up - dn) / (2 * eps)
        assert abs(float(g[k]) - num) < max(0.3 * abs(num), 5e-3), (k, float(g[k]), num)


def test_train_step_reduces_loss():
    scene, _, o, d = small_setup()
    target = jnp.full((o.shape[0], 3), 0.3)
    loss0, scene1 = train_step(scene, o, d, target, lr=0.005)
    loss1, _ = train_step(scene1, o, d, target, lr=0.005)
    assert float(loss1) < float(loss0)


def test_optax_step():
    import optax
    from raytracer_tpu.parallel.train import make_optax_step

    scene, _, o, d = small_setup()
    target = jnp.full((o.shape[0], 3), 0.25)
    init_fn, step_fn = make_optax_step(
        optax.adam(1e-2), param_filter=lambda k: k == "mat")
    opt_state = init_fn(scene)
    loss0, scene, opt_state = step_fn(scene, opt_state, o, d, target)
    for _ in range(4):
        loss, scene, opt_state = step_fn(scene, opt_state, o, d, target)
    assert float(loss) < float(loss0)


def test_sharded_render_matches_single_device():
    scene, cam, o, d = small_setup()
    img_single = np.asarray(color_at(scene, o, d)).reshape(cam.vsize, cam.hsize, 3)
    mesh = make_mesh(jax.devices()[:8])
    img_sharded = render_sharded(scene, cam, mesh)
    assert np.allclose(img_single, img_sharded, atol=1e-5)


def test_sharded_train_step():
    scene, cam, o, d = small_setup()
    mesh = make_mesh(jax.devices()[:8])
    from raytracer_tpu.parallel.mesh import replicate_scene, shard_rays
    so, sd, _ = shard_rays(o, d, mesh)
    scene_r = replicate_scene(scene, mesh)
    target = jnp.zeros((so.shape[0], 3))
    step = make_sharded_train_step(mesh, lr=1e-2)
    loss, scene2 = step(scene_r, so, sd, target, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params actually moved
    assert not np.allclose(np.asarray(scene2.mat), np.asarray(scene_r.mat))


def test_host_mesh_and_multihost_render_path():
    """make_host_mesh shapes (processes, chips); the multihost render path
    (per-host shard materialization + process allgather) must match the
    single-device render even on one process."""
    from raytracer_tpu.parallel.mesh import (
        make_host_mesh, render_sharded, init_distributed,
    )

    pid, pcount = init_distributed()  # no cluster env: safe no-op
    assert pid == 0 and pcount == 1

    scene, cam, o, d = small_setup()
    mesh = make_host_mesh()
    assert mesh.devices.shape[0] == 1  # one process
    img_single = np.asarray(color_at(scene, o, d)).reshape(cam.vsize, cam.hsize, 3)
    img_mh = render_sharded(scene, cam, mesh, multihost=True)
    assert np.allclose(img_single, img_mh, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    g.dryrun_multichip(min(8, len(jax.devices())))


def test_pose_gradient_consistency():
    """with_prim_transform: gradients flow through a primitive's 4x4
    world transform with the inverse and normal matrix recomputed
    in-trace (shading normals stay consistent with the geometry — the
    raw-table gradient surface cannot guarantee that). The analytic
    gradient is the LOCAL shading derivative: it matches central
    finite differences, while silhouette (visibility) changes are
    non-differentiable jumps — full pose recovery from an image loss
    needs visibility-aware gradients (soft rasterization et al.),
    documented as out of scope."""
    import math

    from raytracer_tpu import transforms as tf
    from raytracer_tpu.camera import Camera, ray_grid
    from raytracer_tpu.parallel.train import with_prim_transform

    scene = build_scene([
        S.PointLight(position=(-10.0, 10.0, -10.0)),
        S.Plane(material=S.Material(specular=0.0)),
        S.Sphere(transform=tf.translation(0.0, 1.0, 0.0),
                 material=S.Material(color=(0.8, 0.2, 0.2), diffuse=0.7)),
    ], recursion_limit=1)
    sphere_gid = scene.static.family_range("sphere")[0]

    cam = Camera(48, 32, math.pi / 3).with_transform(
        tf.view_transform((0.0, 1.5, -5.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0)))
    o, d = ray_grid(cam)
    target = color_at(scene, o, d, limit=1)

    def loss(tx):
        m = jnp.eye(4).at[0, 3].set(tx).at[1, 3].set(1.0)
        sc = with_prim_transform(scene, sphere_gid, m)
        img = color_at(sc, o, d, limit=1)
        return jnp.mean((img - target) ** 2)

    # FD only makes sense where the +-eps window does not cross a
    # silhouette jump; tx=0.4 is such a point for this fixed scene/grid
    eps = 1e-3
    tx = 0.4
    g = float(jax.grad(loss)(tx))
    fd = float((loss(tx + eps) - loss(tx - eps)) / (2 * eps))
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=0.15, atol=2e-4)

    # mesh gids are rejected (their vertices are world-space-baked)
    import pytest
    g_nt = sum(scene.static.counts[:5])
    with pytest.raises(ValueError):
        with_prim_transform(scene, g_nt, jnp.eye(4))
