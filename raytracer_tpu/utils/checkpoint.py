"""Per-tile checkpoint/resume for long renders.

The reference is one-shot (SURVEY §5: no checkpointing; a crashed
45-minute dragons render restarts from zero). The pixel-tile grid is
embarrassingly restartable: each finished tile is flushed to a .npy
memmap next to a bitmap of completed tiles, so re-invoking the same
render continues from the first missing tile.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.render import (
    _block_order, _tile_color_jit, camera_consts,
)
from raytracer_tpu.utils.profiling import RenderStats


def _render_digest(scene, key) -> str:
    """Digest of everything that determines tile contents: every scene
    table, the static facts (incl. recursion limit and jitter mode) and
    the PRNG key. A checkpoint made for a different scene/key must not be
    resumed — it would silently mix stale tiles into the output."""
    h = hashlib.sha256()
    for f in dataclasses.fields(scene):
        val = getattr(scene, f.name)
        h.update(f.name.encode())
        if f.name == "static":
            h.update(repr(val).encode())
        else:
            a = np.asarray(val)
            h.update(str(a.dtype).encode() + str(a.shape).encode())
            h.update(a.tobytes())
    h.update(np.asarray(key).tobytes())
    return h.hexdigest()


def render_resumable(scene, camera, checkpoint_path, *, key=None,
                     tile_rays=1 << 14, stats: RenderStats | None = None):
    """Like core.render.render but flushing each tile to disk.

    ``checkpoint_path`` is a directory; re-running with the same path and
    shape resumes after the last complete tile. Returns the full image.
    """
    ckpt = Path(checkpoint_path)
    ckpt.mkdir(parents=True, exist_ok=True)
    meta_p = ckpt / "meta.json"
    img_p = ckpt / "image.npy"
    done_p = ckpt / "done.npy"

    if key is None:
        key = jax.random.PRNGKey(0)
    scene = jax.device_put(scene)
    n = camera.vsize * camera.hsize
    tile = min(tile_rays, n)
    n_tiles = -(-n // tile)

    meta = dict(h=camera.vsize, w=camera.hsize, tile=tile,
                digest=_render_digest(scene, key))
    if meta_p.exists() and json.loads(meta_p.read_text()) == meta \
            and img_p.exists() and done_p.exists():
        flat = np.lib.format.open_memmap(img_p, mode="r+")
        done = np.lib.format.open_memmap(done_p, mode="r+")
    else:
        flat = np.lib.format.open_memmap(
            img_p, mode="w+", dtype=np.float32, shape=(n, 3))
        done = np.lib.format.open_memmap(
            done_p, mode="w+", dtype=bool, shape=(n_tiles,))
        done[:] = False
        meta_p.write_text(json.dumps(meta))

    order = _block_order(camera.vsize, camera.hsize, max(int(tile ** 0.5), 1))
    n_pad = -n % tile
    padded = np.pad(order, (0, n_pad)) if n_pad else order
    inv, consts = camera_consts(camera)

    for ti in range(n_tiles):
        if done[ti]:
            continue
        if stats is not None:
            stats.start_tile()
        i = ti * tile
        tkey = jax.random.fold_in(key, i)
        part = np.asarray(_tile_color_jit(
            scene, inv, consts,
            jnp.asarray(padded[i : i + tile], jnp.int32), tkey,
            scene.static.recursion_limit, camera.hsize,
        ))
        sel = order[i : min(i + tile, n)]
        flat[sel] = part[: len(sel)]
        done[ti] = True
        flat.flush(); done.flush()
        if stats is not None:
            stats.end_tile(len(sel))

    return np.asarray(flat).reshape(camera.vsize, camera.hsize, 3).copy()
