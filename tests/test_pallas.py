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
