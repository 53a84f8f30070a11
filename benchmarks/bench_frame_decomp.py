"""Frame-time decomposition of the dragons-equivalent render.

Each stage is timed as ONE lax.scan dispatch over every 4096-ray tile of
the frame (identical tiling to the real renderer), so per-dispatch
transport overhead is paid once per measurement, not per tile:

  static   - quadric-family trace (level-0)
  mesh     - Pallas nearest-triangle trace with static caps (level-0)
  nearest  - merged static+mesh nearest hit (level-0 trace)
  shade0   - one full shade_level (trace + shadow + shading)
  full     - color_at, all levels (the real frame program body)
  xfer     - device->host copy of the u8 frame over the transport

Usage: python benchmarks/bench_frame_decomp.py [iters]
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

REF = Path("/root/reference/samples")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from raytracer_tpu.scene.yaml_scene import parse_scene
    from raytracer_tpu.core import intersect as I
    from raytracer_tpu.core import render as R

    t0 = time.perf_counter()
    cam, scene = parse_scene(
        (REPO / "benchmarks/dragons_equiv.yaml").read_text(),
        obj_files=[str(REF / "obj/teapot.obj")],
    )
    scene = jax.device_put(scene)
    st = scene.static
    nt_free = st.counts[5] - st.n_csg_tris
    print(f"scene build: {time.perf_counter() - t0:.1f} s")

    tile = R.pick_tile_rays(st)
    _, idx_tiles = R._order_tiles(cam.vsize, cam.hsize, tile)
    inv, consts = R.camera_consts(cam)
    key = jax.random.PRNGKey(0)
    n_tiles = idx_tiles.shape[0]
    print(f"{n_tiles} tiles x {tile} rays, levels={st.recursion_limit + 1}")

    def scan_over_tiles(per_tile):
        @jax.jit
        def f(idx_tiles):
            def body(_, idx):
                o, d = R.tile_rays(inv, consts, idx, cam.hsize)
                return None, per_tile(o, d)

            return jax.lax.scan(body, None, idx_tiles)[1]

        return f

    def timeit(name, fn, *args):
        out = jax.tree.map(np.asarray, fn(*args))  # compile + fence
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.tree.map(np.asarray, fn(*args))
            times.append(time.perf_counter() - t0)
        print(f"{name:10s} {min(times) * 1e3:8.1f} ms")
        return out, min(times)

    def static_cap(o, d):
        ts, _, _, _ = I._static_hits(scene, o, d)
        pos = (ts > 0.0) & jnp.isfinite(ts)
        return jnp.min(jnp.where(pos, ts, jnp.inf), axis=-1)

    timeit("static", scan_over_tiles(lambda o, d: static_cap(o, d).min()),
           idx_tiles)

    caps = jax.device_put(scan_over_tiles(static_cap)(idx_tiles))
    np.asarray(caps)

    @jax.jit
    def mesh_sweep(idx_tiles, caps):
        def body(_, xs):
            idx, cap = xs
            o, d = R.tile_rays(inv, consts, idx, cam.hsize)
            t, g, u, v = I._tri_free_nearest(
                scene, o, d, st.n_csg_tris, nt_free, t_cap=cap)
            return None, (t.min(), g.max())

        return jax.lax.scan(body, None, (idx_tiles, caps))[1]

    timeit("mesh", mesh_sweep, idx_tiles, caps)

    timeit("nearest", scan_over_tiles(
        lambda o, d: I.nearest_hit(scene, o, d)[1].min()), idx_tiles)

    w1 = jnp.ones((tile, 3))
    timeit("shade0", scan_over_tiles(
        lambda o, d: R.shade_level(scene, o, d, w1, key)[0].mean()), idx_tiles)

    timeit("full", scan_over_tiles(
        lambda o, d: R.color_at(scene, o, d, key).mean()), idx_tiles)

    # transfer: u8 frame across the transport
    u8 = jax.device_put(
        jnp.zeros((cam.vsize * cam.hsize, 3), jnp.uint8))
    np.asarray(u8)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(u8)
        times.append(time.perf_counter() - t0)
    print(f"{'xfer':10s} {min(times) * 1e3:8.1f} ms "
          f"({u8.size / 1e6:.1f} MB u8)")


if __name__ == "__main__":
    main()
