"""The examples are the library-API parity surface
(reference examples/{basic_scene,csg,hexagon}.rs print a PPM to stdout).
Run each as a real subprocess at a tiny resolution and validate the PPM."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("name", ["basic_scene", "csg", "hexagon"])
def test_example_renders_ppm(name):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        RAYTRACER_EXAMPLE_SIZE="80x45",
        PYTHONPATH=str(REPO),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / f"{name}.py")],
        capture_output=True, timeout=480, env=env, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    body = out.stdout.split()
    assert body[0] == b"P3"
    w, h, maxval = int(body[1]), int(body[2]), int(body[3])
    assert (w, h, maxval) == (80, 45, 255)
    px = np.array(body[4:], dtype=np.int32)
    assert px.shape == (80 * 45 * 3,)
    assert (px >= 0).all() and (px <= 255).all() and px.max() > 0


def test_inverse_render_pose_recovery():
    """--pose mode (VERDICT r5 item 8): recovers a perturbed sphere
    translation to <0.05 error with a decreasing loss curve — the
    example asserts both internally; rc=0 is the contract."""
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "inverse_render.py"),
         "--pose"],
        capture_output=True, timeout=1200, env=env, cwd=str(REPO),
    )
    assert out.returncode == 0, (
        out.stdout[-1500:], out.stderr[-1500:])
    assert b"OK pose" in out.stdout
