"""ctypes bindings for the native host-IO runtime (native/io_native.cpp).

Auto-builds ``native/libraytracer_io.so`` with g++ on first use (cached);
every entry point has a pure-Python fallback so the package works without
a toolchain. The compute path is unaffected — this accelerates the
host-side throughput paths (multi-MB OBJ parse, megapixel ASCII PPM
encode/decode) that the reference implements natively in Rust.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libraytracer_io.so"
_lib = None
_tried = False


class _ObjCounts(ctypes.Structure):
    _fields_ = [
        ("n_vertices", ctypes.c_int64),
        ("n_normals", ctypes.c_int64),
        ("n_tris", ctypes.c_int64),
        ("n_groups", ctypes.c_int64),
    ]


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.obj_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_ObjCounts)]
        lib.obj_fill.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.ppm_encode_ascii.restype = ctypes.c_int64
        lib.ppm_encode_ascii.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_char_p]
        lib.ppm_decode_ascii.restype = ctypes.c_int64
        lib.ppm_decode_ascii.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_obj_arrays(text: str):
    """OBJ text -> (verts [Nv,3] f32, norms [Nn,3] f32, tri_v [Nt,3] i64,
    tri_n [Nt,3] i64 (-1 = flat), tri_group [Nt] i64) or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    counts = _ObjCounts()
    lib.obj_count(raw, len(raw), ctypes.byref(counts))
    nv, nn, nt = counts.n_vertices, counts.n_normals, counts.n_tris
    verts = np.empty((max(nv, 1), 3), np.float32)
    norms = np.empty((max(nn, 1), 3), np.float32)
    tri_v = np.empty((max(nt, 1), 3), np.int64)
    tri_n = np.empty((max(nt, 1), 3), np.int64)
    tri_g = np.empty(max(nt, 1), np.int64)
    lib.obj_fill(
        raw, len(raw),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        norms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tri_n.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tri_g.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return verts[:nv], norms[:nn], tri_v[:nt], tri_n[:nt], tri_g[:nt]


def ppm_encode_body(q: np.ndarray) -> bytes | None:
    """u8 samples -> ASCII P3 body bytes, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q.reshape(-1), np.uint8)
    buf = ctypes.create_string_buffer(q.size * 4 + 16)
    n = lib.ppm_encode_ascii(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), q.size, buf)
    return buf.raw[:n]


def ppm_decode_samples(body: bytes, max_samples: int) -> np.ndarray | None:
    """ASCII sample text -> u16 array, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max_samples, np.uint16)
    n = lib.ppm_decode_ascii(
        body, len(body),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), max_samples)
    return out[:n]
