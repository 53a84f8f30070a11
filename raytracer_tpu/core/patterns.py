"""Pattern evaluation, branchless.

The reference dispatches per-point through Pattern/UvPattern enums
(patterns.rs:79-91, uv_pattern.rs, cube_map.rs, texture_map.rs). Here every
pattern kind is evaluated for the whole shading batch and the result is
where-selected by kind — divergence-free, gather-based texturing.

Rust ``%`` on floats keeps the dividend's sign; for the ``x % 2 == 0``
parity tests jnp.mod gives identical equality results, so plain mod is
used. ``rem_euclid`` maps to jnp.mod directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.core import types as T
from raytracer_tpu.core.intersect import select_col, table_gather

PI = 3.14159265358979323846


def _rust_rem(x, m):
    """Rust f32 % (remainder with dividend's sign)."""
    return x - jnp.trunc(x / m) * m


def pattern_color(scene: T.Scene, gid, world_point, tgid=None, pid=None,
                  inv=None):
    """pattern_at_shape (patterns.rs:79-91) for a batch of shading points.

    gid [R] i32, world_point [R,3] -> color [R,3]. Rays whose material has
    no pattern get garbage (pattern 0); callers select with pattern_id>=0.
    ``tgid``/``pid``/``inv``: precomputed compact rows, pattern ids and
    world->object inverses to share the per-source fetch with the
    caller's other attribute lookups (render.shade_level).
    """
    from raytracer_tpu.core.intersect import transform_row

    if pid is None or inv is None:
        if tgid is None:
            tgid = transform_row(scene, gid)
        if pid is None:
            pid = table_gather(scene.pattern_id, tgid)
        if inv is None:
            inv = table_gather(scene.inv_tf, tgid)               # [R,4,4]
    pid = jnp.maximum(pid, 0)
    obj_p = jnp.einsum("rij,rj->ri", inv[:, :3, :3], world_point, precision="highest") + inv[:, :3, 3]
    pinv = table_gather(scene.pat_inv, pid)
    p = jnp.einsum("rij,rj->ri", pinv[:, :3, :3], obj_p, precision="highest") + pinv[:, :3, 3]

    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    a = table_gather(scene.pat_a, pid)
    b = table_gather(scene.pat_b, pid)
    kind = table_gather(scene.pat_kind, pid)

    # striped.rs:28-34
    striped = jnp.where((jnp.mod(jnp.floor(x), 2.0) == 0.0)[:, None], a, b)
    # gradient.rs:28-32
    frac = (x - jnp.floor(x))[:, None]
    gradient = a + (b - a) * frac
    # ring.rs:28-39
    ring_par = jnp.mod(jnp.floor(jnp.sqrt(x * x + z * z)), 2.0) == 0.0
    ring = jnp.where(ring_par[:, None], a, b)
    # checker.rs:28-36
    chk_par = jnp.mod(jnp.floor(x) + jnp.floor(y) + jnp.floor(z), 2.0) == 0.0
    checker = jnp.where(chk_par[:, None], a, b)
    # xyz_rgb.rs:24-26
    xyz = p

    # texture_map.rs: pick the uv mapping, then the uv pattern
    tex_u, tex_v = _uv_map(table_gather(scene.pat_map, pid), p)
    texture = _uv_pattern_at(scene, table_gather(scene.pat_uv[:, 0], pid), tex_u, tex_v)

    # cube_map.rs:81-137
    cubemap = _cube_map_color(scene, pid, p)

    out = striped
    for code, val in (
        (T.PAT_GRADIENT, gradient), (T.PAT_RING, ring), (T.PAT_CHECKER, checker),
        (T.PAT_XYZRGB, xyz), (T.PAT_TEXTURE, texture), (T.PAT_CUBEMAP, cubemap),
    ):
        out = jnp.where((kind == code)[:, None], val, out)
    return out


def _uv_map(mapping, p):
    """texture_map.rs:69-114 spherical/planar/cylindrical maps."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    # spherical
    theta = jnp.arctan2(x, z)
    radius = jnp.sqrt(x * x + y * y + z * z)
    phi = jnp.arccos(jnp.clip(y / jnp.where(radius == 0, 1.0, radius), -1.0, 1.0))
    sph_u = 1.0 - (theta / (2.0 * PI) + 0.5)
    sph_v = 1.0 - phi / PI
    # planar
    pla_u = jnp.mod(x, 1.0)
    pla_v = jnp.mod(z, 1.0)
    # cylindrical
    cyl_u = sph_u
    cyl_v = jnp.mod(y, 1.0)
    u = jnp.where(mapping == T.MAP_PLANAR, pla_u,
                  jnp.where(mapping == T.MAP_CYLINDRICAL, cyl_u, sph_u))
    v = jnp.where(mapping == T.MAP_PLANAR, pla_v,
                  jnp.where(mapping == T.MAP_CYLINDRICAL, cyl_v, sph_v))
    return u, v


def _uv_pattern_at(scene: T.Scene, uv_id, u, v):
    """uv_pattern.rs: checker / align-check / image, batched."""
    uid = jnp.maximum(uv_id, 0)
    kind = table_gather(scene.uv_kind, uid)
    w = table_gather(scene.uv_wh[:, 0], uid)
    h = table_gather(scene.uv_wh[:, 1], uid)
    colors = table_gather(scene.uv_colors, uid)                # [R,5,3]

    # UvChecker (uv_pattern.rs:44-53)
    par = jnp.mod(jnp.floor(u * w) + jnp.floor(v * h), 2.0) == 0.0
    checker = jnp.where(par[:, None], colors[:, 0], colors[:, 1])

    # UvAlignCheck (uv_pattern.rs:89-104)
    main, ul, ur, bl, br = (colors[:, i] for i in range(5))
    align = main
    align = jnp.where(((v > 0.8) & (u < 0.2))[:, None], ul, align)
    align = jnp.where(((v > 0.8) & (u > 0.8))[:, None], ur, align)
    align = jnp.where(((v < 0.2) & (u < 0.2))[:, None], bl, align)
    align = jnp.where(((v < 0.2) & (u > 0.8))[:, None], br, align)

    # UvImage (uv_pattern.rs:120-133): nearest neighbor, v flipped.
    img_id = jnp.maximum(table_gather(scene.uv_image, uid), 0)
    iw = table_gather(scene.image_wh[:, 0], img_id).astype(jnp.float32)
    ih = table_gather(scene.image_wh[:, 1], img_id).astype(jnp.float32)
    vv = 1.0 - v
    px = jnp.floor(u * (iw - 1.0) + 0.5).astype(jnp.int32)
    py = jnp.floor(vv * (ih - 1.0) + 0.5).astype(jnp.int32)
    px = jnp.clip(px, 0, scene.images.shape[2] - 1)
    py = jnp.clip(py, 0, scene.images.shape[1] - 1)
    image = scene.images[img_id, py, px]

    out = jnp.where((kind == T.UV_ALIGN)[:, None], align, checker)
    out = jnp.where((kind == T.UV_IMAGE)[:, None], image, out)
    return out


def _cube_map_color(scene: T.Scene, pid, p):
    """cube_map.rs: face select by dominant coordinate + per-face uv."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    coord = jnp.maximum(jnp.maximum(ax, ay), az)

    # Face indices into pat_uv slots: left,right,front,back,up,down = 0..5
    # Reference if-chain order (cube_map.rs:87-100): Right, Left, Up, Down,
    # Front, else Back.
    face = jnp.full(x.shape, 3, jnp.int32)                     # Back
    face = jnp.where(coord == z, 2, face)                      # Front
    face = jnp.where(coord == -y, 5, face)                     # Down
    face = jnp.where(coord == y, 4, face)                      # Up
    face = jnp.where(coord == -x, 0, face)                     # Left
    face = jnp.where(coord == x, 1, face)                      # Right

    def rem2(val):
        return _rust_rem(val, 2.0)

    u_faces = jnp.stack([
        rem2(z + 1.0) / 2.0,        # Left
        rem2(1.0 - z) / 2.0,        # Right
        rem2(x + 1.0) / 2.0,        # Front
        rem2(1.0 - x) / 2.0,        # Back
        rem2(x + 1.0) / 2.0,        # Up
        rem2(x + 1.0) / 2.0,        # Down
    ], -1)
    v_faces = jnp.stack([
        rem2(y + 1.0) / 2.0,        # Left
        rem2(y + 1.0) / 2.0,        # Right
        rem2(y + 1.0) / 2.0,        # Front
        rem2(y + 1.0) / 2.0,        # Back
        rem2(1.0 - z) / 2.0,        # Up
        rem2(z + 1.0) / 2.0,        # Down
    ], -1)
    u = select_col(u_faces, face)
    v = select_col(v_faces, face)
    uv_id = select_col(table_gather(scene.pat_uv, pid), face)
    return _uv_pattern_at(scene, uv_id, u, v)
