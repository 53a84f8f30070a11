"""Pallas TPU kernel: nearest triangle hit for a ray tile.

Design (v4 — DMA-gated two-level AABB hierarchy):

  * grid = (R / RT,): one program per ray subtile; all loops run inside
    the kernel (a Pallas grid step costs ~us, a fori_loop iteration ~ns);
  * triangles are grouped into chunks of CHUNK and supergroups of SG
    chunks (CHUNK*SG = 8192 triangles). A cheap XLA pre-pass slab-tests every
    supergroup AABB against each subtile's rays and emits a COMPACTED
    per-subtile list of live supergroup indices (SMEM-resident). The
    kernel streams ONLY live supergroups HBM -> VMEM through a double
    buffer of single 512 KB DMAs — v3 streamed the whole mesh per
    subtile and only gated compute, which made mesh-heavy frames
    DMA-bound (38 MB x 16 subtiles x ~10 traces per dragons tile);
  * per chunk, a slab test of its AABB against the subtile's rays and
    current best t gates the Moller-Trumbore block — compute is only
    spent on geometry this 512-ray frustum can actually see. This is
    BVH traversal (SURVEY §7.6) reshaped for a wide-SIMD machine: two
    fixed levels, frustum-granular, no stacks, no divergence;
  * Moller-Trumbore is straight VPU math on [RT, CHUNK] component
    planes (triangle.rs:93-115 semantics, t > 0 strictly).

Morton-ordered triangles (scene builder) make chunk and supergroup
AABBs tight, which is what gives the slab tests their rejection power.

Returns per-ray (t, tri_index, u, v); misses have t=+inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.constants import EPSILON

# Swept on the 1.06M-triangle dragons-equivalent frame (r2):
#   RT  512/256/128 -> 0.70/0.65/0.86 s;  CHUNK x SG (tris fixed at 8192)
#   128x64 1.01 s, 256x32 0.83 s, 512x16 0.71 s, 1024x8 0.65 s, 2048x4
#   0.71 s. Wide chunks amortize per-iteration loop overhead; RT=256
#   keeps frusta tight enough for the chunk gate. ROWS is forced by the
#   f32 (8,128) tile: a 9-sublane block physically occupies 16 rows, so
#   trimming the pad cannot shrink the DMA.
RT = 256           # rays per subtile ([RT, CHUNK] f32 planes must fit VMEM)
CHUNK = 1024       # triangles per chunk
ROWS = 16          # plane rows per chunk (9 used, padded for DMA alignment)
SG = 8             # chunks per supergroup (one DMA unit: SG*ROWS*CHUNK*4 B)


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


def _kernel(ids_ref, cnt_ref, ent_ref, o_ref, id_ref, d_ref, t0_ref,
            bbc_ref, tri_hbm, t_ref, g_ref, u_ref, v_ref):
    n_chunks = bbc_ref.shape[1]
    i_sub = pl.program_id(0)

    # Seed the running best-t with the caller's per-ray cap (the nearest
    # static-primitive hit, +inf when uncapped): the per-chunk
    # ``tmin < best`` gate then rejects geometry occluded by static
    # objects from the very first chunk, not only after the first
    # triangle hit. Entries at t >= cap can never win first_hit nor be
    # consumed by the n1/n2 walk, so the cap is semantically free.
    t_ref[:] = t0_ref[:]
    g_ref[:] = jnp.zeros_like(g_ref)
    u_ref[:] = jnp.zeros_like(u_ref)
    v_ref[:] = jnp.zeros_like(v_ref)

    ox, oy, oz = o_ref[:, 0], o_ref[:, 1], o_ref[:, 2]
    ix, iy, iz = id_ref[:, 0], id_ref[:, 1], id_ref[:, 2]

    def live_any(bb, j):
        tx0 = (bb[0, j] - ox) * ix
        tx1 = (bb[3, j] - ox) * ix
        ty0 = (bb[1, j] - oy) * iy
        ty1 = (bb[4, j] - oy) * iy
        tz0 = (bb[2, j] - oz) * iz
        tz1 = (bb[5, j] - oz) * iz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1))
        live = (tmin <= tmax + EPSILON) & (tmax >= 0.0) & (tmin < t_ref[:, 0])
        return jnp.any(live)

    n_live = cnt_ref[i_sub]

    def body(scratch, sems):
        def get_dma(slot, j):
            # j-th LIVE supergroup of this subtile (XLA pre-pass compacted
            # the live indices to the front of ids_ref's row)
            return pltpu.make_async_copy(
                tri_hbm.at[ids_ref[i_sub, j]], scratch.at[slot], sems.at[slot]
            )

        n_super_last = ids_ref.shape[1] - 1

        def outer(state):
            j, _ = state
            slot = j % 2

            # Early exit (front-to-back occlusion): supergroup j+1 — and
            # by the entry-distance sort everything after it — can only
            # contribute hits at t >= its frustum entry distance; once
            # EVERY ray's running best is closer, the rest of the stream
            # is occluded. The decision uses best-t as of before merging
            # supergroup j (conservative by one step), because the next
            # DMA must be started now to overlap with j's compute, and an
            # exited loop must leave no DMA in flight.
            maxt = jnp.max(t_ref[:, 0])
            nxt_ok = (j + 1 < n_live) & (
                ent_ref[i_sub, jnp.minimum(j + 1, n_super_last)] < maxt
            )

            @pl.when(nxt_ok)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            s = ids_ref[i_sub, j]

            def inner(c, _):
                cj = s * SG + c

                @pl.when((cj < n_chunks) & live_any(bbc_ref, cj))
                def _():
                    _mt_merge(
                        o_ref, d_ref,
                        scratch[slot, pl.ds(c * ROWS, ROWS)],
                        cj * CHUNK, t_ref, g_ref, u_ref, v_ref,
                    )

                return 0

            jax.lax.fori_loop(0, SG, inner, 0)
            return j + 1, nxt_ok

        # n_live == 0 (e.g. every ray parked) skips all DMA and compute —
        # this is what makes parked zero-weight wavefront levels free.
        @pl.when(n_live > 0)
        def _():
            get_dma(0, 0).start()
            jax.lax.while_loop(
                lambda st: st[1], outer, (jnp.int32(0), jnp.bool_(True))
            )

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, SG * ROWS, CHUNK), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )

    # rays whose best never beat the cap are misses for THIS query
    t_ref[:, 0] = jnp.where(t_ref[:, 0] < t0_ref[:, 0], t_ref[:, 0], jnp.inf)


def _live_supergroups(origins, inv_d, bb_super, t_cap=None):
    """Per-subtile compacted live-supergroup lists (the kernel's DMA gate).

    A supergroup is live for a subtile when ANY of its rays' infinite
    lines enters the supergroup AABB at some t >= 0 (conservative: no
    current-best-t tightening — that happens per chunk in the kernel)
    AND, when ``t_cap`` [R] is given, enters before that ray's cap — a
    supergroup entirely occluded by static geometry for every ray of
    the subtile is never DMA'd at all.

    Live supergroups are ordered FRONT-TO-BACK by their nearest frustum
    entry distance: the kernel's running best-t then tightens after the
    first (nearest) geometry, and the per-chunk ``tmin < best`` gate
    rejects everything occluded behind it — the traversal-order half of
    a BVH, recovered as a sort key.

    Returns (ids [n_sub, n_super] i32 — live indices front-to-back;
    cnt [n_sub] i32; ent [n_sub, n_super] f32 — the matching sorted
    entry distances, +inf past cnt — the kernel's early-exit key).
    """
    ns = bb_super.shape[1]
    o = origins.reshape(-1, RT, 1, 3)
    inv = inv_d.reshape(-1, RT, 1, 3)
    lo = bb_super[:3].T[None, None]                          # [1,1,ns,3]
    hi = bb_super[3:].T[None, None]
    t0 = (lo - o) * inv                                      # [n_sub,RT,ns,3]
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), -1)
    tmax = jnp.min(jnp.maximum(t0, t1), -1)
    hit = (tmin <= tmax + EPSILON) & (tmax >= 0.0)           # [n_sub,RT,ns]
    if t_cap is not None:
        hit &= tmin <= t_cap.reshape(-1, RT, 1)
    live = jnp.any(hit, 1)                                   # [n_sub,ns]
    # entry distance of the subtile frustum = nearest ray entry (>= 0)
    entry = jnp.min(
        jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf), axis=1
    )                                                        # [n_sub,ns]
    key = jnp.where(live, entry, jnp.inf)
    ids = jnp.argsort(key, axis=1).astype(jnp.int32)
    cnt = jnp.sum(live, axis=1, dtype=jnp.int32)
    return ids, cnt, jnp.sort(key, axis=1)


def mesh_nearest(origins, directions, tri_planes, bb, *, t_init=None,
                 interpret=False):
    """Nearest triangle hit per ray.

    origins/directions: [R, 3] (R a multiple of RT)
    tri_planes: [n_super, SG*ROWS, CHUNK] — supergroup-major plane rows
    bb: (bb_chunk [6, n_chunks], bb_super [6, n_super]) from
        pack_tri_planes; both SMEM-resident
    t_init: optional [R] per-ray search cap (e.g. the nearest
        static-primitive hit). Hits at t >= t_init report +inf; the cap
        seeds the kernel's running best-t and culls occluded
        supergroups from the DMA stream entirely.
    Returns (t [R], tri_idx [R], u [R], v [R]).
    """
    bb_chunk, bb_super = bb
    r = origins.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    if t_init is None:
        t0 = jnp.full((r, 1), jnp.inf, jnp.float32)
    else:
        t0 = t_init.astype(jnp.float32).reshape(r, 1)
    ids, cnt, ent = _live_supergroups(
        origins, inv_d, bb_super, None if t_init is None else t0[:, 0]
    )

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
            pl.BlockSpec(memory_space=pltpu.SMEM),           # live ids
            pl.BlockSpec(memory_space=pltpu.SMEM),           # live counts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # entry dists
            ray_spec,                                        # origins
            ray_spec,                                        # inv_d
            ray_spec,                                        # directions
            out_spec,                                        # t cap
            pl.BlockSpec(memory_space=pltpu.SMEM),           # chunk AABBs
            pl.BlockSpec(memory_space=pl.ANY),               # tri planes HBM
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(ids, cnt, ent, origins, inv_d, directions, t0, bb_chunk, tri_planes)
    return t[:, 0], g[:, 0], u[:, 0], v[:, 0]


def pack_tri_planes_np(p1, e1, e2):
    """Host-numpy :func:`pack_tri_planes` for scene build time.

    The jnp version runs eagerly op-by-op over the device transport —
    ~22 s of a 1M-triangle scene build was pad/transpose round trips.
    Same layout, same values; the builder uploads the result once.
    """
    import numpy as np

    nt = p1.shape[0]
    pad = -nt % (CHUNK * SG)
    n_total = nt + pad
    nc = n_total // CHUNK
    n_super = nc // SG

    def f(x):
        out = np.zeros((n_total, 3), np.float32)
        out[:nt] = x
        return out

    p1p, e1p, e2p = f(p1), f(e1), f(e2)

    def planes(x):
        return x.reshape(nc, CHUNK, 3).transpose(0, 2, 1)

    # explicit zeros + slice-assign: np.pad of the 3-D middle axis and a
    # fancy concatenate both hit slow strided numpy paths at this size
    tri = np.zeros((nc, ROWS, CHUNK), np.float32)
    tri[:, 0:3] = planes(p1p)
    tri[:, 3:6] = planes(e1p)
    tri[:, 6:9] = planes(e2p)
    tri = tri.reshape(n_super, SG * ROWS, CHUNK)

    v0 = p1p.reshape(nc, CHUNK, 3)
    v1 = (p1p + e1p).reshape(nc, CHUNK, 3)
    v2 = (p1p + e2p).reshape(nc, CHUNK, 3)
    real = (np.arange(n_total) < nt).reshape(nc, CHUNK, 1)
    big = np.float32(3e38)
    lo = np.where(real, np.minimum(np.minimum(v0, v1), v2), big)
    hi = np.where(real, np.maximum(np.maximum(v0, v1), v2), -big)
    bb_min = lo.min(axis=1)
    bb_max = hi.max(axis=1)
    bb_chunk = np.concatenate([bb_min, bb_max], axis=1).T
    sb_min = bb_min.reshape(n_super, SG, 3).min(axis=1)
    sb_max = bb_max.reshape(n_super, SG, 3).max(axis=1)
    bb_super = np.concatenate([sb_min, sb_max], axis=1).T
    return tri, (
        np.ascontiguousarray(bb_chunk), np.ascontiguousarray(bb_super)
    )


def pack_tri_planes(p1, e1, e2):
    """[Nt,3] x3 -> (tri_planes [n_super, SG*ROWS, CHUNK],
    (bb_chunk [6, n_chunks], bb_super [6, n_super])).

    Padding triangles are degenerate (p1=e1=e2=0 -> det=0 miss); padded
    chunk/supergroup AABBs are empty (min > max -> never live).
    """
    nt = p1.shape[0]
    pad = -nt % (CHUNK * SG)
    f = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
    p1p, e1p, e2p = f(p1), f(e1), f(e2)
    n_total = nt + pad
    nc = n_total // CHUNK
    n_super = nc // SG

    def planes(x):
        return x.reshape(nc, CHUNK, 3).transpose(0, 2, 1)    # [nc,3,CHUNK]

    tri = jnp.concatenate([planes(p1p), planes(e1p), planes(e2p)], axis=1)
    # pad plane rows 9 -> ROWS for DMA sublane alignment
    tri = jnp.pad(tri, ((0, 0), (0, ROWS - 9), (0, 0)))
    tri = tri.reshape(n_super, SG * ROWS, CHUNK)

    v0 = p1p.reshape(nc, CHUNK, 3)
    v1 = (p1p + e1p).reshape(nc, CHUNK, 3)
    v2 = (p1p + e2p).reshape(nc, CHUNK, 3)
    # mask padding triangles out of the AABBs
    real = (jnp.arange(n_total) < nt).reshape(nc, CHUNK, 1)
    big = jnp.float32(3e38)
    lo = jnp.where(real, jnp.minimum(jnp.minimum(v0, v1), v2), big)
    hi = jnp.where(real, jnp.maximum(jnp.maximum(v0, v1), v2), -big)
    bb_min = lo.min(axis=1)
    bb_max = hi.max(axis=1)
    bb_chunk = jnp.concatenate([bb_min, bb_max], axis=1).T       # [6, nc]
    sb_min = bb_min.reshape(n_super, SG, 3).min(axis=1)
    sb_max = bb_max.reshape(n_super, SG, 3).max(axis=1)
    bb_super = jnp.concatenate([sb_min, sb_max], axis=1).T       # [6, n_super]
    return tri, (bb_chunk, bb_super)
