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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.constants import EPSILON

# Swept on the 1.06M-triangle dragons-equivalent frame (r2):
#   RT  512/256/128 -> 0.70/0.65/0.86 s;  CHUNK x SG (tris fixed at 8192)
#   128x64 1.01 s, 256x32 0.83 s, 512x16 0.71 s, 1024x8 0.65 s, 2048x4
#   0.71 s. Wide chunks amortize per-iteration loop overhead; RT=256
#   keeps frusta tight enough for the chunk gate.
# Re-swept r4 under the v4 design (caps + any-hit shadows + compacted
#   DMA stream), full-frame wall clock: 256/1024/8 0.354 s,
#   512/1024/8 0.635 s, 256/2048/4 0.411 s, 256/1024/16 0.783 s —
#   the current constants remain the optimum by a wide margin.
#
# Plane layout is [n_super, SG, N_PLANES*CHUNK]: sublane row = chunk
# (SG = 8 exactly fills the f32 sublane tile), lanes = the chunk's 10
# plane rows side by side (p1/e1/e2 components + the per-triangle det
# threshold). The supergroup DMA then moves exactly 10*SG*CHUNK floats
# (320 KB); the earlier chunk-major [SG*16, CHUNK] layout padded each
# chunk's plane rows to the 16-sublane f32 tile, spending far more HBM
# traffic — an r3 ablation showed ~60% of kernel time was the
# DMA/stream side, not the intersection math. (Mosaic rejects slicing a
# non-multiple-of-8-sublane block: sublane slices must align to 8,
# which is what forces the chunk axis into sublanes.)
import os as _os
_ABLATE = _os.environ.get("RAYTRACER_MESH_ABLATE", "")
# r5 DMA-compression experiment (VERDICT r4 item 4): store the triangle
# planes bf16 in HBM and upcast to f32 in-VMEM before Moller-Trumbore,
# halving the 320 KB supergroup DMA. The MT math stays f32, but the
# GEOMETRY is rounded to 8 mantissa bits, so renders are NOT bit-parity
# with the f32 store — opt-in per build via RAYTRACER_MESH_BF16=1 (read
# at scene-build time in scene/builder.py). Measured verdict in
# benchmarks/ablate_bf16.py.

RT = 256           # rays per subtile ([RT, CHUNK] f32 planes must fit VMEM)
CHUNK = 1024       # triangles per chunk
N_PLANES = 10      # p1.xyz, e1.xyz, e2.xyz, det_eps (per-tri MT threshold)
SG = 8             # chunks per supergroup (one DMA: N_PLANES*SG*CHUNK*4 B)


def _mt_merge(o_ref, d_ref, tri, base, t_ref, g_ref, u_ref, v_ref,
              skip_uv=False):
    """Moller-Trumbore of the subtile against one chunk + running-min.

    ``tri``: the chunk's [N_PLANES*CHUNK] lane row (plane k of triangle
    j at lane k*CHUNK + j). ``skip_uv`` drops the hit-attribute
    (argmin + barycentric select) work for callers that never read u/v
    (any-hit shadow queries)."""
    def plane(k):
        row = tri[k * CHUNK : (k + 1) * CHUNK][None, :]
        return row.astype(jnp.float32)  # no-op for f32 stores

    p1x, p1y, p1z = plane(0), plane(1), plane(2)
    e1x, e1y, e1z = plane(3), plane(4), plane(5)
    e2x, e2y, e2z = plane(6), plane(7), plane(8)
    # per-triangle det threshold = EPSILON * |det(A)| of the instance
    # transform (the reference's parallel test runs in OBJECT space —
    # see types.Scene.tri_det_eps); padding rows store +inf
    det_eps = plane(9)

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
    ok = jnp.abs(det) >= det_eps
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
    if skip_uv:
        t_ref[:, 0] = jnp.minimum(tbest, t_ref[:, 0])
        return
    col = jnp.argmin(t, axis=1).astype(jnp.int32)
    better = tbest < t_ref[:, 0]

    t_ref[:, 0] = jnp.where(better, tbest, t_ref[:, 0])
    g_ref[:, 0] = jnp.where(better, base + col, g_ref[:, 0])
    if _ABLATE == "nouv":
        return
    rows = jax.lax.broadcasted_iota(jnp.int32, (RT, CHUNK), 1)
    sel = rows == col[:, None]
    u_hit = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
    v_hit = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
    u_ref[:, 0] = jnp.where(better, u_hit, u_ref[:, 0])
    v_ref[:, 0] = jnp.where(better, v_hit, v_ref[:, 0])


def _kernel(ids_ref, cnt_ref, ent_ref, o_ref, id_ref, d_ref, t0_ref,
            bbv_ref, tri_hbm, t_ref, g_ref, u_ref, v_ref, *,
            any_hit=False):
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

    def live_bits(s):
        """One [RT, SG] slab test for ALL the supergroup's chunk AABBs,
        reduced to a single scalar bitmask.

        Gating each chunk separately cost a vector slab test + cross-lane
        any() + vector->scalar sync PER CHUNK (~1 us each, ~38k/frame on
        dragons — more than a third of kernel time). Batched, the whole
        supergroup pays one narrow [RT, SG] test and ONE scalar handoff;
        the per-chunk branches then test bits on the scalar unit. The
        best-t term uses t as of the supergroup's start (not tightened
        chunk-to-chunk) — conservative, so the merge output is exact.
        """
        bb = bbv_ref[s]                              # [6, SG]

        def axis(k, o_col, i_col):
            q0 = (bb[k, :][None, :] - o_col) * i_col           # [RT, SG]
            q1 = (bb[k + 3, :][None, :] - o_col) * i_col
            return jnp.minimum(q0, q1), jnp.maximum(q0, q1)
        x0, x1 = axis(0, o_ref[:, 0:1], id_ref[:, 0:1])
        y0, y1 = axis(1, o_ref[:, 1:2], id_ref[:, 1:2])
        z0, z1 = axis(2, o_ref[:, 2:3], id_ref[:, 2:3])
        tmin = jnp.maximum(jnp.maximum(x0, y0), z0)
        tmax = jnp.minimum(jnp.minimum(x1, y1), z1)
        live = (tmin <= tmax + EPSILON) & (tmax >= 0.0) \
            & (tmin < t_ref[:, 0:1])
        any_c = jnp.any(live, axis=0, keepdims=True)           # [1, SG]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SG), 1)
        pw = jnp.exp2(lane.astype(jnp.float32))                # exact 2^c
        return jnp.sum(jnp.where(any_c, pw, 0.0)).astype(jnp.int32)

    n_live = cnt_ref[i_sub]

    def body(scratch, sems, cnt):
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

            # Prefetch supergroup j+1 IMMEDIATELY — before any compute.
            # Gating the prefetch on the early-exit test (as v4 did) put
            # [best-t vector reduce -> scalar sync -> DMA issue -> DMA
            # latency] on the critical path of EVERY iteration; issued
            # here, the copy lands behind this iteration's gate+MT work.
            # The loop may exit with this DMA in flight — drained below.
            @pl.when(j + 1 < n_live)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            s = ids_ref[i_sub, j]
            bits = live_bits(s) if _ABLATE != "noop" else jnp.int32(0)

            # statically unrolled over the SG chunks: c is a Python int,
            # so the scratch row read needs no dynamic sublane indexing,
            # the loop pays no scalar-loop machinery, and each gate is a
            # scalar bit test on live_bits' single mask
            for c in range(SG):
                if _ABLATE in ("noop", "nomt"):
                    break

                @pl.when((bits >> c) & 1 != 0)
                def _(c=c):
                    if _ABLATE == "count":
                        cnt[0] += 1.0       # chunks that passed the gate
                    _mt_merge(
                        o_ref, d_ref, scratch[slot, c, :],
                        (s * SG + c) * CHUNK, t_ref, g_ref, u_ref, v_ref,
                        skip_uv=any_hit,
                    )

            if any_hit:
                # Any-hit semantics: the caller only asks WHETHER a hit
                # exists below the per-ray cap, never where. Collapse
                # found rays' running t to 0 — their chunk gates
                # (tmin < t) go dead immediately, and once every ray is
                # found maxt hits 0, so the ent < maxt early exit fires
                # on the next supergroup regardless of its entry
                # distance. Exact for the shadow decision: any t in
                # [0, cap) and the value 0 produce the same blocked
                # verdict (see intersect.shadow_blocked).
                t_ref[:, 0] = jnp.where(
                    t_ref[:, 0] < t0_ref[:, 0], 0.0, t_ref[:, 0]
                )

            # Early exit (front-to-back occlusion): supergroup j+1 — and
            # by the entry-distance sort everything after it — can only
            # contribute hits at t >= its frustum entry distance; once
            # EVERY ray's running best is closer, the rest of the stream
            # is occluded. Checked AFTER the merge (tighter best-t than
            # v4's pre-merge check), off the DMA critical path.
            maxt = jnp.max(t_ref[:, 0])
            nxt_ok = (j + 1 < n_live) & (
                ent_ref[i_sub, jnp.minimum(j + 1, n_super_last)] < maxt
            )
            return j + 1, nxt_ok

        # n_live == 0 (e.g. every ray parked) skips all DMA and compute —
        # this is what makes parked zero-weight wavefront levels free.
        if _ABLATE == "count":
            cnt[0] = 0.0
            cnt[1] = 0.0

        @pl.when(n_live > 0)
        def _():
            get_dma(0, 0).start()
            j_end, _ = jax.lax.while_loop(
                lambda st: st[1], outer, (jnp.int32(0), jnp.bool_(True))
            )

            # drain the unconditional prefetch of the never-visited
            # supergroup when the early exit fired (a kernel must not
            # end with a DMA in flight)
            @pl.when(j_end < n_live)
            def _():
                get_dma(j_end % 2, j_end).wait()

            if _ABLATE == "count":
                cnt[1] = j_end.astype(jnp.float32)

        if _ABLATE == "count":
            # diagnostics: u = supergroup iterations, v = chunk gate passes
            u_ref[:, 0] = jnp.full((RT,), cnt[1])
            v_ref[:, 0] = jnp.full((RT,), cnt[0])

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, SG, N_PLANES * CHUNK), tri_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
        cnt=pltpu.SMEM((2,), jnp.float32),
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
                 any_hit=False, interpret=False):
    """Nearest triangle hit per ray.

    origins/directions: [R, 3] (R a multiple of RT)
    tri_planes: [n_super, SG, N_PLANES*CHUNK] — chunk rows x plane lanes
    bb: (bb_chunk [6, n_chunks], bb_super [6, n_super]) from
        pack_tri_planes; both SMEM-resident
    t_init: optional [R] per-ray search cap (e.g. the nearest
        static-primitive hit). Hits at t >= t_init report +inf; the cap
        seeds the kernel's running best-t and culls occluded
        supergroups from the DMA stream entirely.
    any_hit: existence query — any hit strictly below the cap reports
        t=0 (tri_idx/u/v meaningless) and the stream terminates as soon
        as every ray found one. For shadow queries where every mesh
        source casts shadows, t=0 and the true nearest t yield the same
        blocked verdict, so this is exact (shadow_blocked's proof).
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

    # per-supergroup chunk AABBs, VMEM-resident for the batched gate:
    # [n_super, 6, SG] (live_bits reads one supergroup's [6, SG] page)
    bbv = jnp.transpose(bb_chunk.reshape(6, -1, SG), (1, 0, 2))

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
        functools.partial(_kernel, any_hit=any_hit),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # live ids
            pl.BlockSpec(memory_space=pltpu.SMEM),           # live counts
            pl.BlockSpec(memory_space=pltpu.SMEM),           # entry dists
            ray_spec,                                        # origins
            ray_spec,                                        # inv_d
            ray_spec,                                        # directions
            out_spec,                                        # t cap
            pl.BlockSpec(memory_space=pltpu.VMEM),           # chunk AABBs
            pl.BlockSpec(memory_space=pl.ANY),               # tri planes HBM
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(ids, cnt, ent, origins, inv_d, directions, t0, bbv, tri_planes)
    return t[:, 0], g[:, 0], u[:, 0], v[:, 0]


def pack_tri_planes_np(p1, e1, e2, det_eps=None, dtype=None):
    """Host-numpy :func:`pack_tri_planes` for scene build time.

    The jnp version runs eagerly op-by-op over the device transport —
    ~22 s of a 1M-triangle scene build was pad/transpose round trips.
    Same layout, same values; the builder uploads the result once.

    ``det_eps`` [Nt]: per-triangle MT det threshold (types.Scene
    .tri_det_eps); None = plain EPSILON (unit-instance callers).
    Padding rows store +inf so their det==0 can never pass.
    ``dtype``: plane store dtype (default f32; ml_dtypes.bfloat16 for the
    half-DMA experiment — AABBs stay f32 either way).
    """
    import numpy as np

    from raytracer_tpu.constants import EPSILON as _EPS

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
    de = np.full(n_total, np.inf, np.float32)
    de[:nt] = _EPS if det_eps is None else det_eps

    # [n_super, SG, N_PLANES*CHUNK]: sublane row = chunk, lanes = the 10
    # plane rows side by side (zero-pad-free DMA; see layout note above)
    tri = np.zeros((n_super, SG, N_PLANES * CHUNK), np.float32)
    for k, x in enumerate((p1p, e1p, e2p)):
        for comp in range(3):
            r = 3 * k + comp
            tri[:, :, r * CHUNK : (r + 1) * CHUNK] = (
                x[:, comp].reshape(n_super, SG, CHUNK)
            )
    tri[:, :, 9 * CHUNK : 10 * CHUNK] = de.reshape(n_super, SG, CHUNK)

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
    if dtype is not None and np.dtype(dtype) != np.float32:
        tri = tri.astype(dtype)
    return tri, (
        np.ascontiguousarray(bb_chunk), np.ascontiguousarray(bb_super)
    )


def pack_tri_planes(p1, e1, e2, det_eps=None):
    """[Nt,3] x3 -> (tri_planes [n_super, SG, N_PLANES*CHUNK],
    (bb_chunk [6, n_chunks], bb_super [6, n_super])).

    ``det_eps`` [Nt]: per-triangle MT det threshold; None = EPSILON.
    Padding triangles are degenerate (p1=e1=e2=0, threshold +inf ->
    guaranteed miss); padded chunk/supergroup AABBs are empty
    (min > max -> never live).
    """
    nt = p1.shape[0]
    pad = -nt % (CHUNK * SG)
    f = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
    p1p, e1p, e2p = f(p1), f(e1), f(e2)
    n_total = nt + pad
    nc = n_total // CHUNK
    n_super = nc // SG
    if det_eps is None:
        det_eps = jnp.full((nt,), EPSILON, jnp.float32)
    de = jnp.pad(det_eps.astype(jnp.float32), (0, pad),
                 constant_values=jnp.inf)

    def planes(x):
        # [n_super, SG, 3, CHUNK]: per chunk the 3 component rows
        return x.reshape(n_super, SG, CHUNK, 3).transpose(0, 1, 3, 2)

    tri = jnp.concatenate(
        [planes(p1p), planes(e1p), planes(e2p),
         de.reshape(n_super, SG, 1, CHUNK)], axis=2
    ).reshape(n_super, SG, N_PLANES * CHUNK)

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
