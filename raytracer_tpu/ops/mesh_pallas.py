"""Pallas TPU kernel: nearest triangle hit for a ray tile.

Design (v2 — in-kernel chunk streaming):

  * grid = (R / RT,): one program per ray subtile; the whole chunk sweep
    runs inside the kernel as a fori_loop, so per-chunk cost is a loop
    iteration (~ns) instead of a Pallas grid step (~us);
  * triangle chunks stream HBM -> VMEM through a double buffer
    (unconditional prefetch of chunk j+1 while j processes) so DMA fully
    overlaps compute;
  * per chunk, a slab test of the chunk AABB against the subtile's rays
    AND the current best t decides whether the Moller-Trumbore block
    runs at all (@pl.when) — compute is only spent on chunks this
    512-ray frustum can actually see, the TPU equivalent of BVH
    traversal (SURVEY §7.6) at subtile granularity;
  * Moller-Trumbore is straight VPU math on [RT, CHUNK] component
    planes (triangle.rs:93-115 semantics, t > 0 strictly).

Morton-ordered triangles (scene builder) make chunk AABBs tight, which
is what gives the slab test its rejection power.

Returns per-ray (t, tri_index, u, v); misses have t=+inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.constants import EPSILON

RT = 512           # rays per subtile ([RT, CHUNK] f32 planes must fit VMEM)
CHUNK = 256        # triangles per chunk (matches intersect.TRI_CHUNK)


def _mt_merge(o_ref, d_ref, tri, base, t_ref, g_ref, u_ref, v_ref):
    """Moller-Trumbore of the subtile against one chunk + running-min."""
    p1x = tri[0, :][None, :]
    p1y = tri[1, :][None, :]
    p1z = tri[2, :][None, :]
    e1x = tri[3, :][None, :]
    e1y = tri[4, :][None, :]
    e1z = tri[5, :][None, :]
    e2x = tri[6, :][None, :]
    e2y = tri[7, :][None, :]
    e2z = tri[8, :][None, :]

    dx = d_ref[:, 0][:, None]
    dy = d_ref[:, 1][:, None]
    dz = d_ref[:, 2][:, None]
    ox_ = o_ref[:, 0][:, None]
    oy_ = o_ref[:, 1][:, None]
    oz_ = o_ref[:, 2][:, None]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= EPSILON
    inv_det = 1.0 / jnp.where(ok, det, 1.0)

    sx = ox_ - p1x
    sy = oy_ - p1y
    sz = oz_ - p1z
    u = (sx * px + sy * py + sz * pz) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)

    # qvec = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)

    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    t = jnp.where(ok & (t > 0.0), t, jnp.inf)

    tbest = jnp.min(t, axis=1)
    col = jnp.argmin(t, axis=1).astype(jnp.int32)
    better = tbest < t_ref[:, 0]

    t_ref[:, 0] = jnp.where(better, tbest, t_ref[:, 0])
    g_ref[:, 0] = jnp.where(better, base + col, g_ref[:, 0])
    rows = jax.lax.broadcasted_iota(jnp.int32, (RT, CHUNK), 1)
    sel = rows == col[:, None]
    u_hit = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
    v_hit = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
    u_ref[:, 0] = jnp.where(better, u_hit, u_ref[:, 0])
    v_ref[:, 0] = jnp.where(better, v_hit, v_ref[:, 0])


def _kernel(o_ref, id_ref, d_ref, bb_ref, tri_hbm,
            t_ref, g_ref, u_ref, v_ref):
    n_chunks = bb_ref.shape[1]

    t_ref[:] = jnp.full_like(t_ref, jnp.inf)
    g_ref[:] = jnp.zeros_like(g_ref)
    u_ref[:] = jnp.zeros_like(u_ref)
    v_ref[:] = jnp.zeros_like(v_ref)

    ox, oy, oz = o_ref[:, 0], o_ref[:, 1], o_ref[:, 2]
    ix, iy, iz = id_ref[:, 0], id_ref[:, 1], id_ref[:, 2]

    def live_any(j):
        tx0 = (bb_ref[0, j] - ox) * ix
        tx1 = (bb_ref[3, j] - ox) * ix
        ty0 = (bb_ref[1, j] - oy) * iy
        ty1 = (bb_ref[4, j] - oy) * iy
        tz0 = (bb_ref[2, j] - oz) * iz
        tz1 = (bb_ref[5, j] - oz) * iz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1))
        live = (tmin <= tmax + EPSILON) & (tmax >= 0.0) & (tmin < t_ref[:, 0])
        return jnp.any(live)

    def body(scratch, sems):
        def get_dma(slot, j):
            return pltpu.make_async_copy(
                tri_hbm.at[j], scratch.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def loop(j, _):
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                get_dma(nxt, j + 1).start()

            get_dma(slot, j).wait()

            @pl.when(live_any(j))
            def _():
                _mt_merge(o_ref, d_ref, scratch[slot], j * CHUNK,
                          t_ref, g_ref, u_ref, v_ref)

            return 0

        jax.lax.fori_loop(0, n_chunks, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, 16, CHUNK), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def mesh_nearest(origins, directions, tri_planes, bb, *, interpret=False):
    """Nearest triangle hit per ray.

    origins/directions: [R, 3] (R a multiple of RT)
    tri_planes: [n_chunks, 16, CHUNK] — rows p1x..z, e1x..z, e2x..z (+pad)
    bb: [6, n_chunks] — rows min xyz, max xyz; SMEM-resident
    Returns (t [R], tri_idx [R], u [R], v [R]).
    """
    r = origins.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)

    grid = (r // RT,)
    out_shape = [
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
        jax.ShapeDtypeStruct((r, 1), jnp.int32),
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
    ]
    ray_spec = pl.BlockSpec((RT, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RT, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, g, u, v = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            ray_spec,                                        # origins
            ray_spec,                                        # inv_d
            ray_spec,                                        # directions
            pl.BlockSpec(memory_space=pltpu.SMEM),           # AABBs (whole)
            pl.BlockSpec(memory_space=pl.ANY),            # tri planes HBM
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(origins, inv_d, directions, bb, tri_planes)
    return t[:, 0], g[:, 0], u[:, 0], v[:, 0]


def pack_tri_planes(p1, e1, e2):
    """[Nt,3] x3 -> ([n_chunks, 9, CHUNK] planes, [n_chunks, 8] AABBs)."""
    nt = p1.shape[0]
    pad = -nt % CHUNK
    f = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
    p1p, e1p, e2p = f(p1), f(e1), f(e2)
    nc = (nt + pad) // CHUNK

    def planes(x):
        return x.reshape(nc, CHUNK, 3).transpose(0, 2, 1)    # [nc,3,CHUNK]

    tri = jnp.concatenate([planes(p1p), planes(e1p), planes(e2p)], axis=1)
    # pad plane rows 9 -> 16: DMA slices need sublane (8) alignment
    tri = jnp.pad(tri, ((0, 0), (0, 7), (0, 0)))

    v0 = p1p.reshape(nc, CHUNK, 3)
    v1 = (p1p + e1p).reshape(nc, CHUNK, 3)
    v2 = (p1p + e2p).reshape(nc, CHUNK, 3)
    bb_min = jnp.minimum(jnp.minimum(v0, v1), v2).min(axis=1)
    bb_max = jnp.maximum(jnp.maximum(v0, v1), v2).max(axis=1)
    bb = jnp.concatenate([bb_min, bb_max], axis=1).T    # [6, nc] SMEM-compact
    return tri, bb
