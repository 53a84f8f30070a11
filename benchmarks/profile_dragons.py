"""Stage-level timing decomposition of the dragons-equivalent frame.

CAUTION — over the remote-TPU transport these isolated single-tile
dispatches are TRANSFER-DOMINATED (each stage ships its [R, C] outputs
to the host through the tunnel at ~30 MB/s): r4 measured "static
families 1266 ms" here vs 24 ms/frame in the scan harness. Use
benchmarks/bench_frame_decomp.py (one lax.scan dispatch per stage over
every tile, outputs reduced on device) for stage attribution; this
script is only meaningful on a local backend.

Times each wavefront stage of one 8192-ray tile in isolation (jitted,
median of N) and scales by tiles/frame, so the frame budget is
attributed to: primary mesh trace, static-family trace, behind scan,
shadow trace, shading/pattern math, and the n1/n2 walk.

Usage: python benchmarks/profile_dragons.py [--iters 5]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from raytracer_tpu.scene.yaml_scene import parse_scene
from raytracer_tpu.core import intersect as I
from raytracer_tpu.core import render as R
from raytracer_tpu.core import shading as SH
from raytracer_tpu.camera import ray_grid

REF = Path("/root/reference/samples")


def _force(x):
    """Materialize on host. block_until_ready alone returns before the
    remote-TPU transport has finished on the axon backend (measured:
    0.000 s 'frames'); an np.asarray round-trip is the reliable fence."""
    return jax.tree.map(lambda a: np.asarray(a), x)


def med(fn, iters):
    _force(fn())  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    iters = 5
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    cam, scene = parse_scene(
        (REPO / "benchmarks/dragons_equiv.yaml").read_text(),
        obj_files=[str(REF / "obj/teapot.obj")],
    )
    scene = jax.device_put(scene)
    st = scene.static
    tile = R.pick_tile_rays(st)
    origins, directions = ray_grid(cam)
    order = R._block_order(cam.vsize, cam.hsize, int(tile ** 0.5))
    origins = jnp.asarray(np.asarray(origins)[order][:tile])
    directions = jnp.asarray(np.asarray(directions)[order][:tile])
    n_tiles = -(-cam.hsize * cam.vsize // tile)
    key = jax.random.PRNGKey(0)

    nt_free = st.counts[5] - st.n_csg_tris
    print(f"tile={tile} rays, {n_tiles} tiles/frame, "
          f"{nt_free} free tris, levels={st.recursion_limit + 1}")

    # full tile
    f_full = jax.jit(lambda o, d: R.color_at(scene, o, d, key))
    t_full = med(lambda: f_full(origins, directions), iters)
    print(f"full tile color_at:        {t_full*1e3:8.2f} ms  "
          f"-> frame ~{t_full*n_tiles:6.2f} s")

    # stage: free-mesh nearest (Pallas) — the primary trace
    f_mesh = jax.jit(lambda o, d: I._tri_free_nearest(
        scene, o, d, st.n_csg_tris, nt_free))
    t_mesh = med(lambda: f_mesh(origins, directions), iters)
    print(f"mesh nearest (1 trace):    {t_mesh*1e3:8.2f} ms")

    # stage: static families
    f_stat = jax.jit(lambda o, d: I._static_hits(scene, o, d))
    t_stat = med(lambda: f_stat(origins, directions), iters)
    print(f"static families (1 trace): {t_stat*1e3:8.2f} ms")

    # stage: behind scan
    if st.mesh_transparent:
        f_beh = jax.jit(lambda o, d: I._tri_behind(
            scene, o, d, st.n_csg_tris, nt_free))
        t_beh = med(lambda: f_beh(origins, directions), iters)
        print(f"behind scan (1 trace):     {t_beh*1e3:8.2f} ms")

    # stage: full candidate_hits
    f_cand = jax.jit(lambda o, d: I.candidate_hits(scene, o, d))
    t_cand = med(lambda: f_cand(origins, directions), iters)
    print(f"candidate_hits (1 trace):  {t_cand*1e3:8.2f} ms")

    # stage: one shade_level (includes 1 candidate trace + shadow + shading)
    w = jnp.ones((tile, 3))
    f_lvl = jax.jit(lambda o, d: R.shade_level(scene, o, d, w, key))
    t_lvl = med(lambda: f_lvl(origins, directions), iters)
    print(f"one shade_level:           {t_lvl*1e3:8.2f} ms  "
          f"(x{st.recursion_limit + 1} levels = {t_lvl*(st.recursion_limit+1)*1e3:.1f} ms)")

    # stage: shadow_blocked on the level-0 hit points
    ts, gids, us, vs = jax.jit(
        lambda o, d: I.candidate_hits(scene, o, d))(origins, directions)
    has, t, gid, u, v, slot = I.first_hit(ts, gids, us, vs)
    point = origins + np.asarray(t)[:, None] * directions
    over = jnp.asarray(point)
    f_shadow = jax.jit(lambda ov: I.shadow_blocked(
        scene, ov,
        jnp.broadcast_to(scene.plight_pos[0], (tile, 1, 3)), live=has))
    t_sh = med(lambda: f_shadow(over), iters)
    print(f"shadow_blocked (1 light):  {t_sh*1e3:8.2f} ms")

    # stage: n1/n2 walk
    if st.has_transparency:
        f_n = jax.jit(lambda ts_, g_, s_: SH.refraction_indices_fast(
            scene, ts_, g_, s_))
        t_n = med(lambda: f_n(ts, gids, slot), iters)
        print(f"n1/n2 walk:                {t_n*1e3:8.2f} ms")

    lvl_cost = t_lvl * (st.recursion_limit + 1)
    print(f"\nlevel math x levels vs full: {lvl_cost*1e3:.1f} ms vs "
          f"{t_full*1e3:.1f} ms (diff = deep-level savings from parking)")


if __name__ == "__main__":
    main()
