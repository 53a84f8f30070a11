"""Micro-profile of the csg x area-light frame (VERDICT r4 item 2).

Times the frame's components in isolation on the real chip to locate the
8 s/frame outlier: full frame, one tile's shade_level, one
shadow_blocked call, apply_csg alone, and the argsort inside it.

Run on TPU:  python benchmarks/profile_csg.py
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

REF = pathlib.Path("/root/reference/samples")


def timed(fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    from raytracer_tpu.scene.yaml_scene import parse_scene
    from raytracer_tpu.core.render import render, pick_tile_rays
    from raytracer_tpu.core import intersect as I
    from raytracer_tpu.core.csg import apply_csg

    src = (REF / "scenes/csg.yaml").read_text()
    src = src.replace(
        "- add: point-light\n  at: [-10, 10, -10]\n  intensity: [1, 1, 1]",
        "- add: area-light\n  corner: [-1, 2, 4]\n  uvec: [2, 0, 0]\n"
        "  vvec: [0, 2, 0]\n  usteps: 10\n  vsteps: 10\n"
        "  intensity: [1.5, 1.5, 1.5]",
    ).replace("width: 1280", "width: 640").replace("height: 720",
                                                   "height: 360")
    cam, scene = parse_scene(src)
    key = jax.random.PRNGKey(0)
    tile = pick_tile_rays(scene.static)
    n_tiles = -(-cam.hsize * cam.vsize // tile)
    print(f"tile={tile} n_tiles={n_tiles} "
          f"csg_nodes={scene.static.csg_nodes}")

    dt, _ = timed(lambda: render(scene, cam, key=key, quantize=True),
                  iters=2)
    print(f"full frame           : {dt:8.3f} s   ({dt/n_tiles*1e3:7.1f} ms/tile)")

    scene_d = jax.device_put(scene)
    r, s = tile, 100
    rng = np.random.default_rng(0)
    over = jnp.asarray(rng.normal(size=(r, 3)) * 0.5, jnp.float32)
    pos = jnp.asarray(
        rng.normal(size=(r, s, 3)) * 2 + np.array([0, 2, 4]), jnp.float32)

    sb = jax.jit(lambda sc, o, p: I.shadow_blocked(sc, o, p))
    dt, _ = timed(sb, scene_d, over, pos)
    print(f"shadow_blocked [R,S] : {dt*1e3:8.1f} ms/call")

    # one point-light-style call (S=1) for reference
    dt, _ = timed(sb, scene_d, over, pos[:, :1])
    print(f"shadow_blocked [R,1] : {dt*1e3:8.1f} ms/call")

    # apply_csg alone on the flat table
    gids = []
    for fi, off in enumerate(np.cumsum([0] + list(scene.static.counts[:5]))):
        n = scene.static.counts[fi] if fi < 5 else 0
        slots = [2, 1, 2, 4, 4][fi] if fi < 5 else 0
        for g in range(n):
            gids.extend([off + g] * slots)
    col_gid = np.asarray(gids, np.int32)
    c = len(col_gid)
    ts_flat = jnp.asarray(
        rng.normal(size=(r * s, c)).astype(np.float32))
    ac = jax.jit(lambda sc, t: apply_csg(sc, t, col_gid, c))
    dt, _ = timed(ac, scene_d, ts_flat)
    print(f"apply_csg [R*S,{c}]  : {dt*1e3:8.1f} ms/call")

    srt = jax.jit(lambda t: jnp.argsort(t, axis=-1))
    dt, _ = timed(srt, ts_flat)
    print(f"argsort  [R*S,{c}]   : {dt*1e3:8.1f} ms/call")

    # static quadric columns alone (the [R,S,N*slots] family tables)
    def static_ts(sc, o, p):
        v = p - o[:, None]
        d = v / jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-12)[..., None]
        ts, _ = I._shadow_static_ts(sc, o, d)
        return ts
    st_j = jax.jit(static_ts)
    dt, _ = timed(st_j, scene_d, over, pos)
    print(f"static ts [R,S,C]    : {dt*1e3:8.1f} ms/call")


if __name__ == "__main__":
    main()
