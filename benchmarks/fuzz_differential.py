"""CPU vs TPU differential fuzz: random full-feature scenes must render
the same image on both backends.

The CPU lowering is the reference-validated path (the whole unit suite
and the golden band tests run there); the TPU lowering adds the Pallas
kernel, the MXU one-hot gathers and different fusion/rounding choices.
Rendering N seeded random scenes on both and comparing quantized u8
pixels catches TPU-specific lowering bugs that scene-specific goldens
would miss. Knife-edge pixels (a t-comparison flipping between
backends) are expected — the gate is a per-scene mismatch budget, not
exactness.

Usage: python benchmarks/fuzz_differential.py [--seeds 30]
Writes FUZZ_DIFF_r05.json at the repo root when run on a TPU backend.
"""

import json
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import os  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("RAYTRACER_FUZZ_OUT"):
    # the CPU worker: the axon sitecustomize force-resets jax_platforms
    # at interpreter start, so the env var alone is not enough
    jax.config.update("jax_platforms", "cpu")

from raytracer_tpu import transforms as tf  # noqa: E402
from raytracer_tpu.camera import Camera  # noqa: E402
from raytracer_tpu.canvas import quantize_u8  # noqa: E402
from raytracer_tpu.core.render import color_at  # noqa: E402
from raytracer_tpu.scene import specs as S  # noqa: E402
from raytracer_tpu.scene.builder import build_scene  # noqa: E402

from test_fuzz import random_shape  # noqa: E402  (the suite's generator)


def random_csg_leaf(rng):
    """A solid CSG leaf (sphere/cube/cylinder — closed solids, the kinds
    the reference's own CSG sample composes)."""
    m = S.Material(color=tuple(rng.random(3)), diffuse=0.8,
                   specular=float(rng.random() * 0.5))
    t = (tf.translation(*rng.uniform(-1.2, 1.2, 3))
         @ tf.rotation_y(float(rng.random() * 6.28))
         @ tf.scaling(*rng.uniform(0.4, 1.3, 3)))
    kind = rng.integers(0, 3)
    if kind == 0:
        return S.Sphere(transform=t, material=m)
    if kind == 1:
        return S.Cube(transform=t, material=m)
    return S.Cylinder(transform=t, material=m, min=-1.0, max=1.0,
                      closed=True)


def random_csg(rng, depth=2):
    """Nested CSG tree (difference/intersect/union), VERDICT r4 item 5:
    the parity prefix-sum filter was cross-backend-verified only by the
    fixed csg.yaml golden before this."""
    op = ["difference", "intersect", "union"][int(rng.integers(0, 3))]
    left = (random_csg(rng, depth - 1) if depth > 0 and rng.random() < 0.6
            else random_csg_leaf(rng))
    right = (random_csg(rng, depth - 1) if depth > 0 and rng.random() < 0.4
             else random_csg_leaf(rng))
    return S.Csg(op=op, left=left, right=right)


def random_scene(seed):
    rng = np.random.default_rng(seed)
    items = [S.PointLight(position=tuple(rng.uniform(-10, 10, 3)))]
    if seed % 3 == 0:
        items.append(S.AreaLight(
            corner=tuple(rng.uniform(-5, 5, 3)),
            uvec=(2.0, 0.0, 0.0), vvec=(0.0, 2.0, 0.0),
            usteps=3, vsteps=3,
        ))
    for _ in range(int(rng.integers(3, 8))):
        items.append(random_shape(rng))
    if seed % 2 == 1:
        # nested CSG trees — on seeds with area lights (seed % 3 == 0)
        # this also drives apply_csg through the factored [R*S] shadow
        # path on both backends
        for _ in range(int(rng.integers(1, 3))):
            items.append(random_csg(rng))
    if seed % 2 == 0:
        # mesh instances big enough to engage the Pallas kernel on TPU
        # (vs the lax.scan path on CPU) — every other seed transparent,
        # driving the nearest-behind reversed-ray query too
        from raytracer_tpu.obj import parse_obj

        src = Path("/root/reference/samples/obj/teapot.obj").read_text()
        mat = (S.Material(color=(0.05, 0.05, 0.1), transparency=0.85,
                          refractive_index=1.4, diffuse=0.1)
               if seed % 4 == 0 else
               S.Material(color=tuple(rng.random(3)), diffuse=0.8))
        for _ in range(2):
            g = parse_obj(src, mat)
            g.transform = (
                tf.translation(*rng.uniform(-3, 3, 3))
                @ tf.rotation_y(float(rng.random() * 6.28))
                @ tf.scaling(0.1, 0.1, 0.1)
            )
            items.append(g)
    # deterministic jitter so both backends draw identical samples
    return build_scene(items, jitter=(0.5,), recursion_limit=3)


def render_local(scene, o, d):
    img = jax.jit(color_at, static_argnums=(4,))(scene, o, d, None, 3)
    return quantize_u8(np.asarray(img))


def main():
    n_seeds = 30
    if "--seeds" in sys.argv:
        n_seeds = int(sys.argv[sys.argv.index("--seeds") + 1])

    cam = Camera(64, 48, math.pi / 3).with_transform(
        tf.view_transform((0, 2.0, -8.0), (0, 0.5, 0), (0, 1, 0)))
    from raytracer_tpu.camera import ray_grid
    o, d = ray_grid(cam)
    o, d = np.asarray(o), np.asarray(d)

    backend = jax.default_backend()
    print(f"this process: {backend}")

    cpu_dir = Path("/tmp/fuzz_diff_cpu")
    have_all = all(
        (cpu_dir / f"img_{s}.npy").exists() for s in range(1, n_seeds + 1)
    )
    if backend != "cpu" and not have_all:
        # CPU images come from a subprocess with JAX_PLATFORMS=cpu — the
        # mesh-path dispatch (Pallas vs lax.scan) keys on the process
        # backend, so the two lowerings need two processes. Existing
        # images are reused so a flaky-tunnel rerun skips the worker.
        import subprocess

        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   RAYTRACER_FUZZ_OUT=str(cpu_dir))
        sub = subprocess.run(
            [sys.executable, __file__, "--seeds", str(n_seeds)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        assert sub.returncode == 0, sub.stdout[-2000:] + sub.stderr[-2000:]

    out_dir = os.environ.get("RAYTRACER_FUZZ_OUT")
    if out_dir:
        Path(out_dir).mkdir(exist_ok=True)

    results = []
    worst = 0.0
    for seed in range(1, n_seeds + 1):
        scene = random_scene(seed)
        # the remote-TPU tunnel intermittently drops a compile RPC
        # ("response body closed before all bytes were read") — retry
        # the seed rather than losing a 45-minute sweep to transport
        a = None
        for attempt in range(3):
            try:
                a = render_local(scene, o, d)
                break
            except Exception as e:
                if attempt == 2 or "remote_compile" not in str(e):
                    raise
                print(f"seed {seed}: transport retry after {e!s:.80}")
        # every seed is its own jit program (static counts differ):
        # without dropping caches the CPU worker accumulates one mmap
        # per live XLA:CPU buffer and dies at vm.max_map_count ~ seed 25
        # ("LLVM compilation error: Cannot allocate memory") — same
        # failure mode the suite's conftest fixture handles per module
        import gc

        jax.clear_caches()
        gc.collect()
        if out_dir:  # CPU worker: save and continue
            np.save(Path(out_dir) / f"img_{seed}.npy", a)
            continue
        b = np.load(cpu_dir / f"img_{seed}.npy")
        diff = np.abs(a.astype(int) - b.astype(int)).max(-1)
        mismatch = float((diff > 1).mean())
        worst = max(worst, mismatch)
        results.append(dict(seed=seed, mismatch_gt1_pct=round(mismatch * 100, 3),
                            maxdiff=int(diff.max())))
        print(results[-1])
        assert mismatch <= 0.005, f"seed {seed}: {mismatch:.4f} > 0.5% budget"

    if out_dir:
        print(f"cpu worker wrote {n_seeds} images to {out_dir}")
        return
    if backend != "cpu":
        n_csg = sum(1 for s in range(1, n_seeds + 1) if s % 2 == 1)
        (REPO / "FUZZ_DIFF_r05.json").write_text(json.dumps(dict(
            seeds=n_seeds, csg_bearing_seeds=n_csg, resolution="64x48",
            budget_pct=0.5, worst_mismatch_pct=round(worst * 100, 3),
            scenes=results,
        ), indent=2))
        print("wrote FUZZ_DIFF_r05.json")


if __name__ == "__main__":
    main()
