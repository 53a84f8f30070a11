"""Named tuple/point/vector/color operations (reference src/tuples.rs).

The SoA engine works on bare ``[..., 3]`` arrays — these helpers give the
book's vocabulary (point/vector constructors with the w component,
magnitude/normalize/dot/cross/reflect, color blending and u8 conversion)
for library users and tests. Everything is jnp-compatible and
differentiable; plain numpy arrays also work.
"""

from __future__ import annotations

import jax.numpy as jnp

WHITE = (1.0, 1.0, 1.0)
BLACK = (0.0, 0.0, 0.0)


def point(x, y, z):
    """w=1 homogeneous point (tuples.rs:115)."""
    return jnp.asarray([x, y, z, 1.0])


def vector(x, y, z):
    """w=0 homogeneous vector (tuples.rs:209)."""
    return jnp.asarray([x, y, z, 0.0])


def color(r, g, b):
    return jnp.asarray([r, g, b])


def is_point(t):
    return bool(t[3] == 1.0)


def is_vector(t):
    return bool(t[3] == 0.0)


def magnitude(v):
    """tuples.rs:232-236."""
    return jnp.linalg.norm(jnp.asarray(v)[..., :3], axis=-1)


def normalize(v):
    """tuples.rs:238-241 (w preserved for 4-vectors)."""
    v = jnp.asarray(v)
    n = jnp.maximum(magnitude(v), 1e-12)
    if v.shape[-1] == 4:
        return jnp.concatenate([v[..., :3] / n[..., None], v[..., 3:]], -1)
    return v / n[..., None]


def dot(a, b):
    """tuples.rs:243-245."""
    return jnp.sum(jnp.asarray(a)[..., :3] * jnp.asarray(b)[..., :3], -1)


def cross(a, b):
    """tuples.rs:247-249 (3-component result)."""
    return jnp.cross(jnp.asarray(a)[..., :3], jnp.asarray(b)[..., :3])


def reflect(v, n):
    """tuples.rs:250-254: v - 2*dot(v,n)*n."""
    v3 = jnp.asarray(v)[..., :3]
    n3 = jnp.asarray(n)[..., :3]
    return v3 - 2.0 * dot(v3, n3)[..., None] * n3


def hadamard(c1, c2):
    """Color blend (tuples.rs Color * Color)."""
    return jnp.asarray(c1) * jnp.asarray(c2)


def to_u8(c):
    """Clamped round-to-u8 channel conversion (tuples.rs:367-377)."""
    c = jnp.clip(jnp.asarray(c), 0.0, 1.0)
    return jnp.floor(c * 255.0 + 0.5).astype(jnp.uint8)
