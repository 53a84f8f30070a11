"""Checkpoint/resume and profiling utilities."""

import math

import numpy as np

from raytracer_tpu import transforms as tf
from raytracer_tpu.camera import Camera
from raytracer_tpu.scene import specs as S
from raytracer_tpu.scene.builder import build_scene
from raytracer_tpu.core.render import render
from raytracer_tpu.utils import RenderStats, render_resumable


def small():
    scene = build_scene([
        S.PointLight(position=(-10.0, 10.0, -10.0)),
        S.Plane(material=S.Material(specular=0.0)),
        S.Sphere(transform=tf.translation(-0.5, 1.0, 0.5),
                 material=S.Material(color=(0.1, 0.4, 0.9), diffuse=0.7)),
    ])
    cam = Camera(32, 16, math.pi / 3).with_transform(
        tf.view_transform((0, 1.5, -5), (0, 1, 0), (0, 1, 0)))
    return scene, cam


def test_resumable_matches_render(tmp_path):
    scene, cam = small()
    direct = render(scene, cam, tile_rays=128)
    stats = RenderStats()
    img = render_resumable(scene, cam, tmp_path / "ck", tile_rays=128, stats=stats)
    assert np.allclose(img, direct, atol=1e-6)
    assert stats.tiles == 4 and stats.primary_rays == 32 * 16
    assert stats.rays_per_sec > 0
    assert "rays/s" in stats.summary()

    # resume: nothing left to do, identical result
    stats2 = RenderStats()
    img2 = render_resumable(scene, cam, tmp_path / "ck", tile_rays=128, stats=stats2)
    assert stats2.tiles == 0
    assert np.allclose(img2, direct, atol=1e-6)


def test_resume_after_partial(tmp_path):
    scene, cam = small()
    direct = render(scene, cam, tile_rays=128)
    render_resumable(scene, cam, tmp_path / "ck", tile_rays=128)
    # corrupt one tile's done flag -> only that tile re-renders
    done = np.lib.format.open_memmap(tmp_path / "ck" / "done.npy", mode="r+")
    done[2] = False
    done.flush()
    stats = RenderStats()
    img = render_resumable(scene, cam, tmp_path / "ck", tile_rays=128, stats=stats)
    assert stats.tiles == 1
    assert np.allclose(img, direct, atol=1e-6)
