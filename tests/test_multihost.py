"""Real multi-process execution of the multi-host render path.

Launches TWO OS processes (4 virtual CPU devices each) that form one
jax.distributed runtime over a localhost coordinator — the same wiring a
TPU pod uses (SURVEY §7.8: host x chip) — and renders through
render_sharded's multihost branch: per-host addressable shards, gloo
collectives, final image via process allgather. Both hosts must produce
the same image, and it must match the single-process renderer.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out_dir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from raytracer_tpu.parallel.mesh import (
    init_distributed, make_host_mesh, render_sharded,
)
pi, pc = init_distributed(coordinator_address="127.0.0.1:" + port,
                          num_processes=nproc, process_id=pid)
assert (pi, pc) == (pid, nproc), (pi, pc)
assert jax.device_count() == 4 * nproc

import math
import numpy as np
from raytracer_tpu import transforms as tf
from raytracer_tpu.camera import Camera
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene

scene = build_scene([
    S.PointLight(position=(-10.0, 10.0, -10.0)),
    S.Plane(material=S.Material(specular=0.0)),
    S.Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
             material=S.Material(color=(0.1, 0.4, 0.9), diffuse=0.7)),
])
cam = Camera(64, 32, math.pi / 3).with_transform(
    tf.view_transform((0, 1.5, -5), (0, 1, 0), (0, 1, 0)))
mesh = make_host_mesh()
assert mesh.devices.shape == (nproc, 4)
img = render_sharded(scene, cam, mesh)
np.save(os.path.join(out_dir, "img_%d.npy" % pid), img)

# one distributed training step: rays sharded over (hosts, chips),
# scene replicated, grad psum over both mesh axes (ICI then DCN)
import jax.numpy as jnp
from raytracer_tpu.camera import ray_grid
from raytracer_tpu.parallel.mesh import replicate_scene, shard_rays
from raytracer_tpu.parallel.train import make_sharded_train_step

o, d = ray_grid(cam)
o, d, n = shard_rays(jnp.asarray(o), jnp.asarray(d), mesh)
scene_r = replicate_scene(scene, mesh)
target = jax.device_put(
    jnp.zeros((o.shape[0], 3)),
    jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(mesh.axis_names)),
)
step = make_sharded_train_step(mesh, lr=1e-3)
loss, scene2 = step(scene_r, o, d, target, jax.random.PRNGKey(0))
np.save(os.path.join(out_dir, "loss_%d.npy" % pid),
        np.asarray(loss, np.float64))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost_render(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=str(REPO)))
    port = str(_free_port())

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    img0 = np.load(tmp_path / "img_0.npy")
    img1 = np.load(tmp_path / "img_1.npy")
    # every host assembles the SAME full image
    np.testing.assert_array_equal(img0, img1)
    assert img0.shape == (32, 64, 3) and np.isfinite(img0).all()

    # the distributed train step psums to the same finite loss everywhere
    loss0 = np.load(tmp_path / "loss_0.npy")
    loss1 = np.load(tmp_path / "loss_1.npy")
    np.testing.assert_array_equal(loss0, loss1)
    assert np.isfinite(loss0).all() and loss0 > 0.0

    # and it matches the single-process renderer
    import math

    from raytracer_tpu import transforms as tf
    from raytracer_tpu.camera import Camera
    from raytracer_tpu.core.render import render
    from raytracer_tpu.scene import specs as S
    from raytracer_tpu.scene.builder import build_scene

    scene = build_scene([
        S.PointLight(position=(-10.0, 10.0, -10.0)),
        S.Plane(material=S.Material(specular=0.0)),
        S.Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
                 material=S.Material(color=(0.1, 0.4, 0.9), diffuse=0.7)),
    ])
    cam = Camera(64, 32, math.pi / 3).with_transform(
        tf.view_transform((0, 1.5, -5), (0, 1, 0), (0, 1, 0)))
    local = render(scene, cam)
    # edge pixels may flip where a t-comparison lands on a float knife
    # edge (batch width changes XLA lowering by 1-2 ULP); require the
    # frame to match except for a pixel-level tail
    diff = np.abs(img0 - local)
    assert (diff <= 1e-4).mean() >= 0.995, diff.max()
    assert np.median(diff) <= 1e-6
