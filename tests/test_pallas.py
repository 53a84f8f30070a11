"""Pallas mesh kernel vs the brute-force Moller-Trumbore oracle
(interpret mode — runs on the CPU test mesh; the compiled kernel runs in
the TPU benchmarks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.intersect import _tri_moller_trumbore
from raytracer_tpu.ops.mesh_pallas import RT, mesh_nearest, pack_tri_planes


@pytest.mark.parametrize("nt", [70, 700])
def test_mesh_nearest_matches_oracle(nt):
    rng = np.random.default_rng(1)
    p1 = jnp.asarray(rng.uniform(-3, 3, (nt, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(0, 0.5, (nt, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(0, 0.5, (nt, 3)), jnp.float32)
    r = RT
    o = jnp.asarray(
        rng.uniform(-1, 1, (r, 3)) + np.array([0, 0, -8.0]), jnp.float32)
    d = rng.normal(0, 1, (r, 3)) + np.array([0, 0, 3.0])
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    tri, bb = pack_tri_planes(p1, e1, e2)
    t, g, u, v = mesh_nearest(o, d, tri, bb, interpret=True)

    ts, uu, vv = _tri_moller_trumbore(o, d, p1, e1, e2)
    ts = jnp.where(ts > 0.0, ts, jnp.inf)
    j = jnp.argmin(ts, axis=1)
    t_ref = jnp.take_along_axis(ts, j[:, None], 1)[:, 0]
    hit = np.isfinite(np.asarray(t_ref))
    assert hit.sum() > 20
    assert np.allclose(np.asarray(t)[hit], np.asarray(t_ref)[hit], rtol=1e-5)
    assert (np.asarray(g)[hit] == np.asarray(j)[hit]).mean() > 0.999
    u_ref = jnp.take_along_axis(uu, j[:, None], 1)[:, 0]
    v_ref = jnp.take_along_axis(vv, j[:, None], 1)[:, 0]
    assert np.allclose(np.asarray(u)[hit], np.asarray(u_ref)[hit], atol=1e-5)
    assert np.allclose(np.asarray(v)[hit], np.asarray(v_ref)[hit], atol=1e-5)
    assert not np.isfinite(np.asarray(t)[~hit]).any()


def test_multi_supergroup_stream_matches_oracle():
    """Exercise the DMA loop across >1 supergroup (the small fixtures
    pad into a single one): 3 supergroups of depth-sorted geometry, so
    the front-to-back early-exit path is active, plus mixed caps."""
    rng = np.random.default_rng(9)
    nt = 20000  # -> 20 chunks -> 3 supergroups (CHUNK=1024, SG=8)
    # Morton-like coherence: sort triangle centers along z so chunk and
    # supergroup AABBs are depth-separated (as the scene builder makes them)
    c = rng.uniform(-3, 3, (nt, 3))
    c[:, 2] = np.sort(rng.uniform(0, 30, nt))
    p1 = jnp.asarray(c + rng.normal(0, 0.1, (nt, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(0, 0.2, (nt, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(0, 0.2, (nt, 3)), jnp.float32)
    r = RT
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)) * np.array([1, 1, 0])
                    + np.array([0, 0, -5.0]), jnp.float32)
    d = rng.normal(0, 0.15, (r, 3)) + np.array([0, 0, 1.0])
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    tri, bb = pack_tri_planes(p1, e1, e2)
    assert tri.shape[0] == 3  # really multi-supergroup

    ts, uu, vv = _tri_moller_trumbore(o, d, p1, e1, e2)
    ts = jnp.where(ts > 0.0, ts, jnp.inf)
    j = jnp.argmin(ts, axis=1)
    t_ref = np.asarray(jnp.take_along_axis(ts, j[:, None], 1)[:, 0])
    hit = np.isfinite(t_ref)
    assert hit.sum() > 100

    t, g, u, v = mesh_nearest(o, d, tri, bb, interpret=True)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-5)
    assert (np.asarray(g)[hit] == np.asarray(j)[hit]).mean() > 0.999
    assert not np.isfinite(np.asarray(t)[~hit]).any()

    # with caps: half below the true t, half above
    cap = np.where(hit, t_ref, 40.0).astype(np.float32)
    cap[0::2] *= 0.5
    cap[1::2] *= 1.5
    t_c, g_c, _, _ = mesh_nearest(
        o, d, tri, bb, t_init=jnp.asarray(cap), interpret=True)
    kept = t_ref < cap
    np.testing.assert_allclose(np.asarray(t_c)[kept], t_ref[kept], rtol=1e-5)
    assert not np.isfinite(np.asarray(t_c)[~kept]).any()

    # any-hit mode: same existence verdict (t=0 where a hit beats the
    # cap, +inf where none does), across the multi-supergroup stream
    # and its found-ray early exit
    t_a, _, _, _ = mesh_nearest(
        o, d, tri, bb, t_init=jnp.asarray(cap), any_hit=True,
        interpret=True)
    t_a = np.asarray(t_a)
    assert (t_a[kept] == 0.0).all()
    assert not np.isfinite(t_a[~kept]).any()
    # uncapped any-hit agrees with the uncapped nearest's existence
    t_a2, _, _, _ = mesh_nearest(o, d, tri, bb, any_hit=True,
                                 interpret=True)
    t_a2 = np.asarray(t_a2)
    assert (t_a2[hit] == 0.0).all()
    assert not np.isfinite(t_a2[~hit]).any()


def test_t_init_cap_erases_capped_hits():
    """mesh_nearest with a per-ray t_init cap must return exactly the
    uncapped result where t < cap and +inf where t >= cap (the caller's
    static-occlusion cap; intersect.candidate_hits/nearest_hit)."""
    rng = np.random.default_rng(5)
    nt = 700
    p1 = jnp.asarray(rng.uniform(-3, 3, (nt, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(0, 0.5, (nt, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(0, 0.5, (nt, 3)), jnp.float32)
    r = RT
    o = jnp.asarray(
        rng.uniform(-1, 1, (r, 3)) + np.array([0, 0, -8.0]), jnp.float32)
    d = rng.normal(0, 1, (r, 3)) + np.array([0, 0, 3.0])
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    tri, bb = pack_tri_planes(p1, e1, e2)
    t_free, g_free, u_free, v_free = mesh_nearest(o, d, tri, bb,
                                                  interpret=True)
    # mixed caps: half the rays capped BELOW their uncapped t (hit must
    # vanish), half capped above (hit must be identical), inf = uncapped
    t_np = np.asarray(t_free)
    cap = np.where(np.isfinite(t_np), t_np, 10.0)
    cap[0::2] *= 0.5
    cap[1::2] *= 2.0
    cap[2::4] = np.inf
    t_c, g_c, u_c, v_c = mesh_nearest(
        o, d, tri, bb, t_init=jnp.asarray(cap, jnp.float32), interpret=True)

    kept = t_np < cap
    assert kept.sum() > 20 and (~kept).sum() > 20
    np.testing.assert_allclose(np.asarray(t_c)[kept], t_np[kept], rtol=1e-6)
    assert (np.asarray(g_c)[kept] == np.asarray(g_free)[kept]).all()
    np.testing.assert_allclose(
        np.asarray(u_c)[kept], np.asarray(u_free)[kept], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v_c)[kept], np.asarray(v_free)[kept], atol=1e-6)
    assert not np.isfinite(np.asarray(t_c)[~kept]).any()


def test_nearest_hit_cap_matches_uncapped_render():
    """End-to-end: a mesh scene with an occluding static primitive —
    nearest_hit (which now passes the static cap into the mesh query)
    must agree with the brute-force candidate argmin."""
    import jax
    from raytracer_tpu.scene import specs as S
    from raytracer_tpu.scene.builder import build_scene
    from raytracer_tpu import transforms as tf
    from raytracer_tpu.core.intersect import (
        _tri_moller_trumbore, nearest_hit)

    rng = np.random.default_rng(11)
    nt = 900
    p = np.cumsum(rng.normal(0, 0.3, (nt, 1, 3)), axis=0) + rng.normal(
        0, 0.25, (nt, 3, 3))
    mesh = S.Mesh(p=p.astype(np.float32), n=np.zeros((nt, 3, 3), np.float32),
                  smooth=np.zeros(nt, bool))
    # a big sphere in front of part of the cloud occludes it
    blocker = S.Sphere(transform=tf.translation(0, 0, -20) @ tf.scaling(6, 6, 6))
    scene = build_scene([mesh, blocker, S.PointLight(position=(0, 50, 0))])

    r = 256
    o = jnp.asarray(rng.uniform(-4, 4, (r, 3)) + np.array([0, 0, -40.0]),
                    jnp.float32)
    d = rng.normal(0, 0.08, (r, 3)) + np.array([0, 0, 1.0])
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    has, t, gid, u, v = jax.jit(lambda o_, d_: nearest_hit(scene, o_, d_))(o, d)

    # oracle: min positive over sphere quadric + all triangles
    oc = np.asarray(o) - np.array([0, 0, -20.0])
    dn = np.asarray(d)
    a = (dn * dn).sum(-1)
    b = 2 * (oc * dn).sum(-1)
    c = (oc * oc).sum(-1) - 36.0
    disc = b * b - 4 * a * c
    ts_s = np.where(disc >= 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a),
                    np.inf)
    ts_s = np.where(ts_s > 0, ts_s, np.inf)
    tts, _, _ = _tri_moller_trumbore(o, d, scene.tri_p1, scene.tri_e1,
                                     scene.tri_e2)
    tts = np.asarray(jnp.where(tts > 0.0, tts, jnp.inf)).min(-1)
    t_best = np.minimum(ts_s, tts)
    hit = np.isfinite(t_best)
    assert hit.sum() > 50
    assert (np.asarray(has) == hit).all()
    np.testing.assert_allclose(np.asarray(t)[hit], t_best[hit], rtol=2e-5)


def test_precomputed_pack_matches_inline():
    """builder.finish precomputes mesh_planes/mesh_bb_* for big meshes;
    nearest_hit through the precomputed tables must equal a scene with
    the tables stripped (on-the-fly pack / inline AABB path)."""
    import dataclasses
    import jax
    from raytracer_tpu.scene import specs as S
    from raytracer_tpu.scene.builder import build_scene
    from raytracer_tpu.core.intersect import nearest_hit

    rng = np.random.default_rng(7)
    nt = 1500
    p = np.cumsum(rng.normal(0, 0.4, (nt, 1, 3)), axis=0) + rng.normal(
        0, 0.3, (nt, 3, 3)
    )
    mesh = S.Mesh(
        p=p.astype(np.float32),
        n=np.zeros((nt, 3, 3), np.float32),
        smooth=np.zeros(nt, bool),
    )
    scene = build_scene([mesh, S.PointLight(position=(0, 10, 0))])
    assert scene.mesh_planes is not None
    stripped = dataclasses.replace(
        scene, mesh_planes=None, mesh_bb_chunk=None, mesh_bb_super=None
    )

    r = 256
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)) + np.array([0, 0, -40.0]),
                    jnp.float32)
    d = rng.normal(0, 0.05, (r, 3)) + np.array([0, 0, 1.0])
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    pre = jax.jit(lambda o_, d_: nearest_hit(scene, o_, d_))(o, d)
    inl = jax.jit(lambda o_, d_: nearest_hit(stripped, o_, d_))(o, d)
    for a, b, name in zip(pre, inl, ("has", "t", "gid", "u", "v")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6, err_msg=name
        )
    assert bool(np.asarray(pre[0]).any())


def test_reversed_ray_is_behind_query():
    """The TPU nearest-behind path (intersect._tri_behind) is the Pallas
    nearest-hit of the REVERSED ray with t negated: Moller-Trumbore's t
    flips sign exactly under d -> -d. Verify (interpret mode) against
    the lax.scan behind oracle on rays positioned INSIDE a triangle
    cloud so both signs of t are populated."""
    import jax

    rng = np.random.default_rng(3)
    nt = 700
    p1 = jnp.asarray(rng.uniform(-3, 3, (nt, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(0, 0.5, (nt, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(0, 0.5, (nt, 3)), jnp.float32)
    r = RT
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)), jnp.float32)
    d = rng.normal(0, 1, (r, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    tri, bb = pack_tri_planes(p1, e1, e2)
    t_rev, g_rev, _, _ = mesh_nearest(o, -d, tri, bb, interpret=True)
    bt = jnp.where(jnp.isfinite(t_rev), -t_rev, -jnp.inf)

    # oracle: largest strictly-negative t per ray
    ts, _, _ = _tri_moller_trumbore(o, d, p1, e1, e2)
    ts = jnp.where((ts < 0.0) & jnp.isfinite(ts), ts, -jnp.inf)
    j = jnp.argmax(ts, axis=1)
    bt_ref = jnp.take_along_axis(ts, j[:, None], 1)[:, 0]

    have = np.isfinite(np.asarray(bt_ref))
    assert have.sum() > 50
    assert np.allclose(np.asarray(bt)[have], np.asarray(bt_ref)[have], rtol=1e-5)
    assert (np.asarray(g_rev)[have] == np.asarray(j)[have]).mean() > 0.999
    assert not np.isfinite(np.asarray(bt)[~have]).any()


def test_max_mesh_tile_smem_budget():
    """pick_tile_rays must clamp the dispatch tile so the kernel's
    SMEM-resident prepass tables (ids+ent, supergroup axis padded to 128
    lanes) fit the 1 MB SMEM: a 131072-ray dragons-scale tile exceeded
    it by 3.1 KB at compile time, and a 10M-triangle mesh would
    overflow at the old 32k default."""
    from raytracer_tpu.core.render import _max_mesh_tile

    assert _max_mesh_tile(1000) == 1 << 30          # scan path, no clamp
    assert _max_mesh_tile(1_061_760) == 65536        # dragons: 130 supers
    assert _max_mesh_tile(10_000_000) == 16384       # 1221 supers
    # the clamp always leaves at least one RT subtile
    assert _max_mesh_tile(10**9) >= RT


def test_mesh_nearest_per_triangle_det_eps():
    """The kernel's 10th plane row carries the per-triangle MT det
    threshold (types.Scene.tri_det_eps): tiny triangles from a
    scaled-down instance pass their own threshold and are hit, while an
    artificially huge threshold rejects the same geometry."""
    rng = np.random.default_rng(3)
    nt = 70
    s = 0.004  # |e1 x e2| ~ 1e-5 << EPSILON
    p1 = jnp.asarray(rng.uniform(-0.02, 0.02, (nt, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(0, s, (nt, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(0, s, (nt, 3)), jnp.float32)
    r = RT
    o = jnp.asarray(
        rng.uniform(-0.01, 0.01, (r, 3)) + np.array([0, 0, -1.0]),
        jnp.float32)
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (r, 1)), jnp.float32)

    deps = jnp.full((nt,), 1e-12, jnp.float32)  # EPSILON * |det A|, A tiny
    tri, bb = pack_tri_planes(p1, e1, e2, deps)
    t, g, u, v = mesh_nearest(o, d, tri, bb, interpret=True)
    assert np.isfinite(np.asarray(t)).sum() > 10  # fixed EPSILON found 0

    # same geometry, default (unit-instance) threshold: almost every det
    # falls below EPSILON (a rare tail triangle can exceed it), and the
    # kernel agrees with the equally-thresholded oracle exactly
    tri0, bb0 = pack_tri_planes(p1, e1, e2)
    t0, *_ = mesh_nearest(o, d, tri0, bb0, interpret=True)
    n_def = np.isfinite(np.asarray(t0)).sum()
    assert n_def < np.isfinite(np.asarray(t)).sum() / 4
    ts0, _, _ = _tri_moller_trumbore(o, d, p1, e1, e2)
    ts0 = jnp.where(ts0 > 0.0, ts0, jnp.inf)
    t0_ref = np.asarray(jnp.min(ts0, axis=1))
    assert (np.isfinite(np.asarray(t0)) == np.isfinite(t0_ref)).all()

    # and the oracle with the same per-triangle threshold agrees exactly
    ts, uu, vv = _tri_moller_trumbore(o, d, p1, e1, e2, det_eps=deps)
    ts = jnp.where(ts > 0.0, ts, jnp.inf)
    j = jnp.argmin(ts, axis=1)
    t_ref = np.asarray(jnp.take_along_axis(ts, j[:, None], 1)[:, 0])
    hit = np.isfinite(t_ref)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-5)
    assert (np.isfinite(np.asarray(t)) == hit).all()
