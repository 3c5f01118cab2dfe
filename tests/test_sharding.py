"""Mesh-sharding tests on the 8-device virtual CPU mesh (conftest)."""

from __future__ import annotations

import numpy as np
import pytest

import jax

import gamer_tpu
from gamer_tpu.parallel import make_pixel_mesh, render_scene_sharded
from gamer_tpu.scene import gax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.default_backend() == "cpu"


def test_sharded_render_matches_single(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "VortexCloud.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=32, ray_step=0.025),
    )
    mesh = make_pixel_mesh()
    sharded = render_scene_sharded(scene, mesh)
    single = render_scene(scene)
    d = np.abs(sharded.astype(np.int16) - single.astype(np.int16))
    # same math, different partitioning: tiny fp differences only
    assert d.max() <= 1, f"sharded vs single max diff {d.max()}"


def test_sharded_size_must_tile():
    scene = gamer_tpu.Scene(config=gamer_tpu.RenderConfig(size=30, ray_step=0.025))
    with pytest.raises(ValueError, match="not divisible"):
        render_scene_sharded(scene, make_pixel_mesh())
