"""Multi-device scaling measurement (VERDICT r1 item 5).

Weak-scaling sweep of the sharded renderer and the sharded train step
over 1/2/4/8 devices of a virtual CPU mesh
(xla_force_host_platform_device_count). On this machine the virtual
devices SHARE the same physical cores, so wall-clock efficiency here is
a *machinery smoke*, not a hardware scaling claim — the artifact records
it as mode="cpu_virtual_smoke". On a real pod slice the same script
measures true ICI scaling (mode="tpu").

Writes SCALING_r{N}.json at the repo root.

Run: python benchmarks/bench_scaling.py [--out SCALING_r02.json]
"""

import json
import math
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# Force the virtual CPU mesh unless explicitly benchmarking a real multi-
# chip TPU slice. (Touching jax.devices() first would initialize the
# backend and make the platform switch a no-op.)
if os.environ.get("RAYTRACER_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import transforms as tf  # noqa: E402
from raytracer_tpu.camera import Camera, ray_grid  # noqa: E402
from raytracer_tpu.scene import specs as S  # noqa: E402
from raytracer_tpu.scene.builder import build_scene  # noqa: E402
from raytracer_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, replicate_scene, shard_rays,
)
from raytracer_tpu.parallel.train import make_sharded_train_step  # noqa: E402
from raytracer_tpu.core.render import color_at  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

# Large enough that per-size timings are compute- not dispatch-dominated
# (4096 rays ran in ~3 ms on CPU — pure noise).
PER_DEVICE_RAYS = 1 << 15


def flagship_scene():
    return build_scene([
        S.PointLight(position=(-10.0, 10.0, -10.0)),
        S.Plane(material=S.Material(specular=0.0, reflective=0.3)),
        S.Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
                 material=S.Material(color=(0.1, 0.4, 0.9), diffuse=0.7,
                                     reflective=0.1)),
        S.Sphere(transform=tf.translation(1.5, 0.5, -0.5) @ tf.scaling(0.5, 0.5, 0.5),
                 material=S.Material(color=(0.9, 0.2, 0.2))),
    ])


def timed(fn, iters=5):
    fn()  # warm-up / compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


# The per-chip production train config (r4 measured grid, train.py:
# render_loss_and_grad docstring): gradient accumulation over 4
# microbatches with remat off is the fastest config that fits HBM at the
# 131k-ray flagship batch — it is what a user would actually run, so the
# retention headline measures IT, at the production per-device batch.
PROD_PER_DEV = 1 << 17
PROD_TRAIN_KW = dict(n_micro=4, remat=False)
RETENTION_REPEATS = 5


def _interleaved_retention(devices, scene, o_full, d_full, train_kw,
                           per_dev):
    """Median-of-repeats total-throughput retention (8 dev vs 1 dev),
    with the 1-dev and 8-dev measurements INTERLEAVED per repeat so a
    load transient on the shared host hits both sides — r4 measured the
    two sides minutes apart and shipped a 0.54 'regression' that was
    sampling noise (r5 study: identical code spans 0.53-0.71)."""
    setups = {}
    for n_dev in (1, 8):
        if n_dev > len(devices):
            return None, [], {}
        mesh = make_mesh(devices[:n_dev])
        n = per_dev * n_dev
        so, sd, _ = shard_rays(
            jnp.asarray(o_full[:n]), jnp.asarray(d_full[:n]), mesh)
        scene_r = replicate_scene(scene, mesh)
        tgt = jnp.zeros((n, 3))
        key = jax.random.PRNGKey(0)
        step = make_sharded_train_step(mesh, lr=1e-2, **train_kw)
        float(step(scene_r, so, sd, tgt, key)[0])  # compile
        setups[n_dev] = (step, scene_r, so, sd, tgt, key, n)

    rets, rps_last = [], {}
    for _ in range(RETENTION_REPEATS):
        rps = {}
        for n_dev in (1, 8):
            step, scene_r, so, sd, tgt, key, n = setups[n_dev]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(step(scene_r, so, sd, tgt, key)[0])
                ts.append(time.perf_counter() - t0)
            rps[n_dev] = n / sorted(ts)[1]
        rets.append(round(rps[8] / rps[1], 3))
        rps_last = rps
    return float(np.median(rets)), rets, {
        k: round(v, 1) for k, v in rps_last.items()
    }


def main():
    out_path = "SCALING_r05.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    devices = jax.devices()
    mode = "tpu" if jax.default_backend() == "tpu" else "cpu_virtual_smoke"
    scene = flagship_scene()
    cam = Camera(1024, 1024, math.pi / 3).with_transform(
        tf.view_transform((0, 1.5, -5), (0, 1, 0), (0, 1, 0)))
    o_full, d_full = ray_grid(cam)
    o_full = np.asarray(o_full)
    d_full = np.asarray(d_full)

    rows_fwd, rows_train = [], []
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    for n_dev in sizes:
        mesh = make_mesh(devices[:n_dev])
        n_rays = PER_DEVICE_RAYS * n_dev  # weak scaling: work ∝ devices
        o = jnp.asarray(o_full[:n_rays])
        d = jnp.asarray(d_full[:n_rays])
        so, sd, _ = shard_rays(o, d, mesh)
        scene_r = replicate_scene(scene, mesh)
        ray_sh = NamedSharding(mesh, P(mesh.axis_names))
        limit = scene.static.recursion_limit

        @jax.jit
        def fwd(sc, o, d):
            o = jax.lax.with_sharding_constraint(o, ray_sh)
            d = jax.lax.with_sharding_constraint(d, ray_sh)
            return jax.lax.with_sharding_constraint(
                color_at(sc, o, d, None, limit), ray_sh)

        dt = timed(lambda: np.asarray(fwd(scene_r, so, sd)))
        rows_fwd.append(dict(devices=n_dev, rays=n_rays,
                             seconds=round(dt, 4),
                             rays_per_sec=round(n_rays / dt, 1)))

        target = jnp.zeros((so.shape[0], 3))
        step = make_sharded_train_step(mesh, lr=1e-2)
        key = jax.random.PRNGKey(0)

        def one_step():
            loss, _ = step(scene_r, so, sd, target, key)
            return float(loss)

        dt = timed(one_step)
        rows_train.append(dict(devices=n_dev, rays=n_rays,
                               seconds=round(dt, 4),
                               rays_per_sec=round(n_rays / dt, 1)))

    # Machinery overhead at n=1: the 1-device SHARDED program vs a plain
    # jit of the same computation with no mesh/sharding constraints at
    # all. This isolates what the sharding machinery itself costs
    # (constraint ops, replicated-param layout) from the core-sharing
    # caveat below — the overhead trend the retention number can't show.
    o1 = jnp.asarray(o_full[:PER_DEVICE_RAYS])
    d1 = jnp.asarray(d_full[:PER_DEVICE_RAYS])
    limit = scene.static.recursion_limit
    plain_fwd = jax.jit(lambda sc, o, d: color_at(sc, o, d, None, limit))
    dt_plain_fwd = timed(lambda: np.asarray(plain_fwd(scene, o1, d1)))

    from raytracer_tpu.parallel.train import train_step

    t1 = jnp.zeros((PER_DEVICE_RAYS, 3))
    plain_step = jax.jit(
        lambda sc, o, d, t: train_step(sc, o, d, t, lr=1e-2)
    )

    def plain_train():
        loss, _ = plain_step(scene, o1, d1, t1)
        return float(loss)

    dt_plain_train = timed(plain_train)

    def overhead(rows, plain_dt):
        return round(rows[0]["seconds"] / plain_dt - 1.0, 3)

    def efficiency(rows):
        if len(rows) < 2:
            return None
        base = rows[0]["rays_per_sec"]  # per-device throughput at n=1
        last = rows[-1]
        return round(last["rays_per_sec"] / (base * last["devices"]), 3)

    def retention(rows):
        # Total-throughput retention: on SHARED host cores an n-device
        # weak-scaling run cannot beat the single-device total (1 device
        # already saturates every core), so per-device "efficiency" is
        # capped at 1/n. total_n / total_1 is the number that isolates
        # the sharding machinery's overhead on this setup.
        if len(rows) < 2:
            return None
        return round(rows[-1]["rays_per_sec"] / rows[0]["rays_per_sec"], 3)

    # Headline retention: production config at production batch,
    # interleaved median-of-5 (see _interleaved_retention).
    ret_prod, ret_prod_reps, rps_prod = _interleaved_retention(
        devices, scene, o_full, d_full, PROD_TRAIN_KW, PROD_PER_DEV)
    ret_def, ret_def_reps, _ = _interleaved_retention(
        devices, scene, o_full, d_full, {}, PER_DEVICE_RAYS)

    artifact = dict(
        mode=mode,
        backend=jax.default_backend(),
        n_devices=len(devices),
        per_device_rays=PER_DEVICE_RAYS,
        weak_scaling_forward=rows_fwd,
        weak_scaling_train_step=rows_train,
        efficiency_forward=efficiency(rows_fwd),
        efficiency_train=efficiency(rows_train),
        total_throughput_retention_forward=retention(rows_fwd),
        # continuity field: same config r02/r04 measured (default train
        # step at 32k rays/dev), now interleaved median-of-5
        total_throughput_retention_train=ret_def,
        retention_train_repeats=ret_def_reps,
        # stricter: the production per-chip config (its 1-dev baseline
        # runs ~3x faster, so the ratio is lower at the same absolute
        # 8-dev throughput — see retention_train_production_rays_per_sec)
        retention_train_production=ret_prod,
        retention_train_production_config=dict(
            per_device_rays=PROD_PER_DEV, **PROD_TRAIN_KW),
        retention_train_production_repeats=ret_prod_reps,
        retention_train_production_rays_per_sec=rps_prod,
        host_cores=os.cpu_count(),
        plain_single_device_forward_s=round(dt_plain_fwd, 4),
        plain_single_device_train_s=round(dt_plain_train, 4),
        sharding_overhead_forward=overhead(rows_fwd, dt_plain_fwd),
        sharding_overhead_train=overhead(rows_train, dt_plain_train),
        note=(
            "cpu_virtual_smoke: the 8 virtual devices SHARE the host's "
            f"{os.cpu_count()} physical cores (2x oversubscribed), so "
            "retention measures scheduler/cache contention, not ICI. "
            "r5 diagnosis of the r02->r04 'regression' (0.732->0.544): "
            "identical code + config spans 0.53-0.71 run-to-run on this "
            "host, and the r4 pair was measured minutes apart under "
            "concurrent load — sampling noise, not machinery (the 65% "
            "sharded-forward overhead r4 reported reproduces as 1.5% on "
            "an idle host, see sharding_overhead_forward). The headline "
            "retention_train keeps r02/r04's config (default train step, "
            "32k rays/device) with the 1-dev/8-dev pair interleaved per "
            "repeat, median of 5; retention_train_production measures "
            "the recommended per-chip config (n_micro=4, remat=False, "
            "131k rays/device), whose ~3x faster 1-dev baseline lowers "
            "the ratio at the same absolute 8-dev throughput — absolute "
            "rays/s is the number that matters there. Run on a pod slice "
            "(RAYTRACER_SCALING_TPU=1) for the real curve (target >= "
            "0.8 per BASELINE.md)."
            if mode != "tpu" else "real TPU devices over ICI"
        ),
    )
    Path(out_path).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
