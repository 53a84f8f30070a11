"""bf16 triangle-plane store ablation (VERDICT r4 item 4).

Measures the dragons-equivalent frame with f32 vs bf16 plane stores
(RAYTRACER_MESH_BF16=1 halves the 288 KB supergroup DMA; the MT math
stays f32 but the geometry rounds to 8 mantissa bits), and quantifies
the image divergence vs the f32 render plus the same bf16-vs-f32
diff on a reference mesh scene that takes the Pallas path
(teapot.yaml, 3200 free triangles; the committed-golden mesh scenes are
all under the 1024-triangle Pallas threshold, so the f32 render — itself
parity-swept against the CPU lowering — is the oracle here).

Run on TPU: python benchmarks/ablate_bf16.py [iters]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = Path("/root/reference/samples")


def frame_time(scene, cam, render, iters):
    img = render(scene, cam, quantize=True)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        render(scene, cam, quantize=True)
        times.append(time.perf_counter() - t0)
    return min(times), img


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from raytracer_tpu.scene.yaml_scene import parse_scene
    from raytracer_tpu.core.render import render

    results = {}
    for mode in ("f32", "bf16"):
        os.environ["RAYTRACER_MESH_BF16"] = "1" if mode == "bf16" else "0"
        cam, scene = parse_scene(
            (REPO / "benchmarks/dragons_equiv.yaml").read_text(),
            obj_files=[str(REF / "obj/teapot.obj")],
        )
        assert (scene.mesh_planes.dtype == np.float32) == (mode == "f32")
        dt, img = frame_time(scene, cam, render, iters)
        results[mode] = (dt, img)
        print(f"dragons-equiv {mode}: {dt:.3f} s/frame")

    dt32, img32 = results["f32"]
    dt16, img16 = results["bf16"]
    diff = np.abs(img32.astype(int) - img16.astype(int))
    print(f"speedup: {dt32 / dt16:.3f}x")
    print(f"bf16 vs f32 image: exact {(diff == 0).all(-1).mean()*100:.3f}%  "
          f"maxdiff {diff.max()}  >1-step {(diff.max(-1) > 1).mean()*100:.4f}%")

    # bf16-vs-f32 on a reference mesh scene with Pallas-path triangles
    objs = [str(p) for p in (REF / "obj").glob("*.obj")]
    imgs = {}
    for mode in ("f32", "bf16"):
        os.environ["RAYTRACER_MESH_BF16"] = "1" if mode == "bf16" else "0"
        cam, scene = parse_scene(
            (REF / "scenes/teapot.yaml").read_text(), obj_files=objs,
        )
        imgs[mode] = render(scene, cam, quantize=True)
    d = np.abs(imgs["f32"].astype(int) - imgs["bf16"].astype(int))
    print(f"teapot bf16 vs f32: exact {(d == 0).all(-1).mean()*100:.3f}%"
          f"  maxdiff {d.max()}  >1-step {(d.max(-1) > 1).mean()*100:.4f}%")
    os.environ["RAYTRACER_MESH_BF16"] = "0"


if __name__ == "__main__":
    main()
