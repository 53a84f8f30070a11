"""Test config: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests work anywhere (the driver separately dry-runs the real
multi-chip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon; tests run on virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The test suite gets its OWN persistent-compilation-cache directory.
# Sharing the package default with concurrently-running TPU bench
# processes corrupted entries twice (observed: SIGSEGV serializing a
# GB-scale grad executable mid-write, then a later suite run SIGABRT
# deserializing the truncated entry in get_executable_and_time) — and a
# corrupt entry aborts in native code, unreachable by
# raise_persistent_cache_errors=False.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    _cache = os.path.expanduser("~/.cache/raytracer_tpu_xla-cputests")
    os.makedirs(_cache, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter start, which silently moves "CPU" tests onto the one real
# TPU chip; put it back before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Release jit executables + their constant buffers after each test
    module. A full suite run otherwise accumulates ~65k memory mappings
    (each live XLA:CPU buffer is its own mmap; jit caches pin every
    compiled function's constants) and crosses the kernel's default
    vm.max_map_count = 65530 — at which point mmap fails and XLA
    SIGSEGV/SIGABRTs inside the next large compile (reproduced: maps
    grew 52k -> 65.3k over the suite and the run died at 65.3k).
    Re-entry is cheap: executables reload from the persistent
    compilation cache."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def default_world():
    """The book's default world fixture (world.rs:20-41): one point light
    and two canonical spheres."""
    from raytracer_tpu import transforms
    from raytracer_tpu.scene import specs as S
    from raytracer_tpu.scene.builder import build_scene

    s1 = S.Sphere(
        material=S.Material(color=(0.8, 1.0, 0.6), diffuse=0.7, specular=0.2)
    )
    s2 = S.Sphere(transform=transforms.scaling(0.5, 0.5, 0.5))
    light = S.PointLight(position=(-10.0, 10.0, -10.0), intensity=(1.0, 1.0, 1.0))
    return build_scene([light, s1, s2])


def approx_eq(a, b, eps=1e-4):
    return np.all(np.abs(np.asarray(a) - np.asarray(b)) < eps)
