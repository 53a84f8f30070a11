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


def test_failure_detection_retries(tmp_path, monkeypatch):
    """A tile whose device call fails transiently (exception or
    non-finite output) is detected, retried, and the render completes;
    a persistent failure raises with every other tile checkpointed."""
    from raytracer_tpu.utils import checkpoint as CK

    scene, cam = small()
    direct = render(scene, cam, tile_rays=128)

    real = CK._tile_color_jit
    fails = {"left": 2}

    def flaky(scene_, inv, consts, idx, key, limit, hsize):
        out = real(scene_, inv, consts, idx, key, limit, hsize)
        if fails["left"] > 0:
            fails["left"] -= 1
            if fails["left"] % 2:
                raise RuntimeError("injected transport fault")
            return out * np.nan  # injected device corruption
        return out

    monkeypatch.setattr(CK, "_tile_color_jit", flaky)
    seen = []
    img = render_resumable(
        scene, cam, tmp_path / "ck", tile_rays=128, max_retries=2,
        on_retry=lambda ti, attempt, reason: seen.append((ti, reason)),
    )
    assert np.allclose(img, direct, atol=1e-6)
    assert len(seen) == 2
    assert any("injected transport fault" in r for _, r in seen)
    assert any("non-finite" in r for _, r in seen)

    # persistent failure: raises, but finished tiles stay checkpointed
    calls = {"n": 0}

    def fails_after_first(scene_, inv, consts, idx, key, limit, hsize):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("persistent device fault")
        return real(scene_, inv, consts, idx, key, limit, hsize)

    monkeypatch.setattr(CK, "_tile_color_jit", fails_after_first)
    import pytest

    with pytest.raises(RuntimeError, match="tile 1 failed"):
        render_resumable(
            scene, cam, tmp_path / "ck2", tile_rays=128, max_retries=1,
        )
    done = np.lib.format.open_memmap(tmp_path / "ck2" / "done.npy", mode="r")
    assert done[0] and not done[1:].any()
