"""Quick dragons-equivalent frame timing (for kernel-tuning iterations).

Usage: python benchmarks/bench_dragons_only.py [iters]
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = Path("/root/reference/samples")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from raytracer_tpu.scene.yaml_scene import parse_scene
    from raytracer_tpu.core.render import render

    t0 = time.perf_counter()
    cam, scene = parse_scene(
        (REPO / "benchmarks/dragons_equiv.yaml").read_text(),
        obj_files=[str(REF / "obj/teapot.obj")],
    )
    print(f"scene build: {time.perf_counter() - t0:.1f} s "
          f"({int(scene.static.counts[5])} tris)")

    t0 = time.perf_counter()
    img = render(scene, cam, quantize=True)
    print(f"compile+first frame: {time.perf_counter() - t0:.1f} s")
    assert np.isfinite(img.astype(np.float32)).all()

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        render(scene, cam, quantize=True)
        times.append(time.perf_counter() - t0)
    px = cam.hsize * cam.vsize
    best = min(times)
    print(f"times: {[round(t, 3) for t in times]}")
    print(f"best: {best:.3f} s/frame  ({px / best / 1e6:.2f} M px/s)")


if __name__ == "__main__":
    main()
