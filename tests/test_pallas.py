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
