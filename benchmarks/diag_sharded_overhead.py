"""Diagnose the r4 sharded-train retention regression (VERDICT r5 item 3).

Times the sharded train step at 1 and 8 virtual CPU devices across the
remat/microbatch grid, and the sharded forward with/without sharding
constraints, to attribute the r02->r04 retention drop (0.732 -> 0.544).

Run: python benchmarks/diag_sharded_overhead.py
"""

import math
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import transforms as tf
from raytracer_tpu.camera import Camera, ray_grid
from raytracer_tpu.parallel.mesh import make_mesh, replicate_scene, shard_rays
from raytracer_tpu.parallel.train import make_sharded_train_step, train_step
from raytracer_tpu.core.render import color_at
from jax.sharding import NamedSharding, PartitionSpec as P
from benchmarks.bench_scaling import flagship_scene

PER_DEV = 1 << 15


def timed(fn, iters=5):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    devices = jax.devices()
    scene = flagship_scene()
    cam = Camera(512, 512, math.pi / 3).with_transform(
        tf.view_transform((0, 1.5, -5), (0, 1, 0), (0, 1, 0)))
    o_full, d_full = (np.asarray(x) for x in ray_grid(cam))

    print("== train step grid (seconds; rays/s) ==")
    for n_micro, remat in [(None, True), (None, False), (2, False), (2, True)]:
        rows = []
        for n_dev in (1, 8):
            mesh = make_mesh(devices[:n_dev])
            n = PER_DEV * n_dev
            o, d = jnp.asarray(o_full[:n]), jnp.asarray(d_full[:n])
            so, sd, _ = shard_rays(o, d, mesh)
            scene_r = replicate_scene(scene, mesh)
            tgt = jnp.zeros((n, 3))
            step = make_sharded_train_step(
                mesh, lr=1e-2, n_micro=n_micro, remat=remat)
            key = jax.random.PRNGKey(0)
            dt = timed(lambda: float(step(scene_r, so, sd, tgt, key)[0]))
            rows.append((n_dev, dt, n / dt))
        r1, r8 = rows
        print(f"n_micro={n_micro} remat={remat}: "
              f"1dev {r1[1]:.4f}s ({r1[2]:,.0f} r/s)  "
              f"8dev {r8[1]:.4f}s ({r8[2]:,.0f} r/s)  "
              f"retention {r8[2] / r1[2]:.3f}")

    print("== plain (unsharded) train step 1 dev ==")
    o1, d1 = jnp.asarray(o_full[:PER_DEV]), jnp.asarray(d_full[:PER_DEV])
    t1 = jnp.zeros((PER_DEV, 3))
    for n_micro, remat in [(None, True), (None, False), (2, False)]:
        f = jax.jit(lambda sc, o, d, t: train_step(
            sc, o, d, t, lr=1e-2, n_micro=n_micro, remat=remat))
        dt = timed(lambda: float(f(scene, o1, d1, t1)[0]))
        print(f"plain n_micro={n_micro} remat={remat}: {dt:.4f}s")

    print("== forward variants 1 dev ==")
    limit = scene.static.recursion_limit
    plain = jax.jit(lambda sc, o, d: color_at(sc, o, d, None, limit))
    dt = timed(lambda: np.asarray(plain(scene, o1, d1)))
    print(f"plain jit              : {dt:.4f}s")

    mesh = make_mesh(devices[:1])
    so, sd, _ = shard_rays(o1, d1, mesh)
    scene_r = replicate_scene(scene, mesh)
    ray_sh = NamedSharding(mesh, P(mesh.axis_names))

    @jax.jit
    def fwd_con(sc, o, d):
        o = jax.lax.with_sharding_constraint(o, ray_sh)
        d = jax.lax.with_sharding_constraint(d, ray_sh)
        return jax.lax.with_sharding_constraint(
            color_at(sc, o, d, None, limit), ray_sh)

    dt = timed(lambda: np.asarray(fwd_con(scene_r, so, sd)))
    print(f"sharded + constraints  : {dt:.4f}s")

    @jax.jit
    def fwd_nocon(sc, o, d):
        return color_at(sc, o, d, None, limit)

    dt = timed(lambda: np.asarray(fwd_nocon(scene_r, so, sd)))
    print(f"sharded, no constraints: {dt:.4f}s")


if __name__ == "__main__":
    main()
