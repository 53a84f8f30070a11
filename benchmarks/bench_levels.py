"""Per-level cost attribution: dragons frame time at recursion limit 0..4.

frame(L) - frame(L-1) = the aggregate cost of bounce level L across the
whole frame (including its packing/permutation overheads), measured as
one lax.scan dispatch per limit like the real renderer.

Usage: python benchmarks/bench_levels.py [iters]
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

REF = Path("/root/reference/samples")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from raytracer_tpu.scene.yaml_scene import parse_scene
    from raytracer_tpu.core import render as R

    cam, scene = parse_scene(
        (REPO / "benchmarks/dragons_equiv.yaml").read_text(),
        obj_files=[str(REF / "obj/teapot.obj")],
    )
    scene = jax.device_put(scene)
    tile = R.pick_tile_rays(scene.static)
    _, idx_tiles = R._order_tiles(cam.vsize, cam.hsize, tile)
    inv, consts = R.camera_consts(cam)
    key = jax.random.PRNGKey(0)

    prev = 0.0
    for lim in range(scene.static.recursion_limit + 1):
        @jax.jit
        def f(idx_tiles, lim=lim):
            def body(_, idx):
                o, d = R.tile_rays(inv, consts, idx, cam.hsize)
                return None, R.color_at(scene, o, d, key, limit=lim).mean()

            return jax.lax.scan(body, None, idx_tiles)[1]

        np.asarray(f(idx_tiles))  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(f(idx_tiles))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"limit={lim}: {best * 1e3:7.1f} ms   "
              f"(level {lim} cost: {(best - prev) * 1e3:+7.1f} ms)",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
