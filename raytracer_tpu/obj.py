"""Wavefront OBJ parser → Group of (Smooth)Triangles.

Mirrors the reference's obj ingestion (/root/reference/src/obj.rs:8-41):
per-OBJ-group child Groups, polygon faces fan-triangulated, vertex normals
on all three corners → SmoothTriangle, else flat Triangle, one material
applied to every triangle. Pure host-side code (numpy lists); the
triangles land in the device SoA via the scene builder.

Supported face syntax: ``f v``, ``f v/vt``, ``f v//vn``, ``f v/vt/vn``,
with negative (relative) indices as in the OBJ spec.
"""

from __future__ import annotations

from raytracer_tpu.scene import specs as S


def parse_obj(source, material: S.Material | None = None) -> S.Group:
    """Parse OBJ text (str, bytes or file-like) into a Group of triangles."""
    if hasattr(source, "read"):
        source = source.read()
    if isinstance(source, bytes):
        source = source.decode("utf-8", errors="replace")
    if material is None:
        material = S.Material()

    vertices: list = []
    normals: list = []
    groups: dict[str, list] = {}
    current = "default"

    def faces_of(group_name):
        return groups.setdefault(group_name, [])

    for raw in source.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            vertices.append(tuple(float(x) for x in parts[1:4]))
        elif tag == "vn":
            normals.append(tuple(float(x) for x in parts[1:4]))
        elif tag in ("g", "o"):
            current = parts[1] if len(parts) > 1 else "default"
        elif tag == "f":
            corners = [_parse_corner(tok) for tok in parts[1:]]
            # fan triangulation (wavefront crate's triangles())
            for i in range(1, len(corners) - 1):
                faces_of(current).append((corners[0], corners[i], corners[i + 1]))

    out = S.Group()
    for _, faces in groups.items():
        child = S.Group()
        for (a, b, c) in faces:
            p1 = _resolve(vertices, a[0])
            p2 = _resolve(vertices, b[0])
            p3 = _resolve(vertices, c[0])
            if a[1] is not None and b[1] is not None and c[1] is not None:
                child.children.append(
                    S.SmoothTriangle(
                        p1=p1, p2=p2, p3=p3,
                        n1=_resolve(normals, a[1]),
                        n2=_resolve(normals, b[1]),
                        n3=_resolve(normals, c[1]),
                        material=material,
                    )
                )
            else:
                child.children.append(
                    S.Triangle(p1=p1, p2=p2, p3=p3, material=material)
                )
        out.children.append(child)
    return out


def _parse_corner(token: str):
    """Face corner ``v[/vt[/vn]]`` → (vertex_idx, normal_idx or None)."""
    fields = token.split("/")
    v = int(fields[0])
    vn = None
    if len(fields) == 3 and fields[2]:
        vn = int(fields[2])
    return v, vn


def _resolve(table, idx):
    """1-based OBJ index (negative = relative to end) → tuple."""
    return table[idx - 1] if idx > 0 else table[idx]
