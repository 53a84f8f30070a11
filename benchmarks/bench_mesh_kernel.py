"""Mesh-kernel microbench: the dragons frame's level-0 primary mesh trace.

Times ONE dispatch that sweeps every 4096-ray tile of the dragons frame
through the Pallas nearest-triangle kernel (caps precomputed from the
static families outside the timed region), isolating kernel throughput
from the rest of the wavefront — for fast iteration on the kernel
itself. Compile is ~1 min vs ~9 min for the full-frame program.

Usage: python benchmarks/bench_mesh_kernel.py [iters]
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
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
    print(f"scene build: {time.perf_counter() - t0:.1f} s ({nt_free} free tris)")

    tile = R.pick_tile_rays(st)
    n = cam.hsize * cam.vsize
    _, idx_tiles = R._order_tiles(cam.vsize, cam.hsize, tile)
    inv, consts = R.camera_consts(cam)
    n_tiles = idx_tiles.shape[0]
    print(f"{n_tiles} tiles x {tile} rays")

    # caps: nearest positive static hit per ray (computed once, untimed)
    @jax.jit
    def caps_fn(idx_tiles):
        def body(_, idx):
            o, d = R.tile_rays(inv, consts, idx, cam.hsize)
            ts, _, _, _ = I._static_hits(scene, o, d)
            pos = (ts > 0.0) & jnp.isfinite(ts)
            return None, jnp.min(jnp.where(pos, ts, jnp.inf), axis=-1)

        return jax.lax.scan(body, None, idx_tiles)[1]

    caps = jax.device_put(caps_fn(idx_tiles))
    np.asarray(caps)  # fence

    import os
    count_mode = os.environ.get("RAYTRACER_MESH_ABLATE") == "count"

    @jax.jit
    def sweep(idx_tiles, caps):
        def body(_, xs):
            idx, cap = xs
            o, d = R.tile_rays(inv, consts, idx, cam.hsize)
            t, g, u, v = I._tri_free_nearest(
                scene, o, d, st.n_csg_tris, nt_free, t_cap=cap
            )
            if count_mode:   # u/v carry per-subtile (iterations, chunks)
                from raytracer_tpu.ops.mesh_pallas import RT as RT_
                return None, (u[::RT_].sum(), v[::RT_].sum())
            return None, (t.min(), g.max())

        return jax.lax.scan(body, None, (idx_tiles, caps))[1]

    t0 = time.perf_counter()
    out = jax.tree.map(np.asarray, sweep(idx_tiles, caps))
    print(f"compile+first sweep: {time.perf_counter() - t0:.1f} s")
    if count_mode:
        its, chunks = float(out[0].sum()), float(out[1].sum())
        n_sub = n_tiles * tile // 256
        print(f"supergroup iterations: {its:.0f} ({its / n_sub:.1f}/subtile)"
              f"  chunk gate passes: {chunks:.0f} ({chunks / max(its,1):.2f}"
              f"/iter of {8})")
        return

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, sweep(idx_tiles, caps))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"times: {[round(t, 3) for t in times]}")
    print(f"best: {best * 1e3:.1f} ms for {n_tiles * tile / 1e6:.2f} M rays "
          f"({n_tiles * tile / best / 1e6:.1f} M rays/s)")


if __name__ == "__main__":
    main()
