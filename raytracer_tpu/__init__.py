"""raytracer_tpu — a TPU-native differentiable Whitted ray tracer in JAX.

A from-scratch rebuild of the capabilities of the reference Rust renderer
(lerouxrgd/raytracer): YAML scene description in, PPM image out, with
spheres/planes/cubes/cylinders/cones/triangles, Phong shading, point and
area lights (soft shadows), reflection/refraction, procedural and image
texture patterns, OBJ meshes, groups and CSG.

Architecture (TPU-first, not a port):
  * Scenes compile to SoA arrays (one padded table per primitive family).
  * Rendering is wavefront: whole ray batches flow through
    trace -> shade -> spawn-secondary passes unrolled to a fixed depth,
    the entire frame is one jit-compiled, differentiable program.
  * Ray->object-space transforms are batched matmuls (MXU); intersection
    math is vectorized elementwise work (VPU); hot paths have Pallas kernels.
  * Multi-chip scaling shards the pixel grid over a jax.sharding.Mesh with
    the scene replicated; gradients of scene parameters are psum-reduced.
"""

import os as _os

import jax as _jax

# Deep spawn-tree programs (depth-4 refraction over a Pallas-culled mesh)
# can take many minutes to XLA-compile; persist compiled executables so
# every process after the first starts warm. Opt out by setting
# JAX_COMPILATION_CACHE_DIR to an empty string.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.expanduser("~/.cache/raytracer_tpu_xla")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from raytracer_tpu.constants import EPSILON
from raytracer_tpu import transforms
from raytracer_tpu.camera import Camera
from raytracer_tpu.canvas import Canvas

__version__ = "0.1.0"
