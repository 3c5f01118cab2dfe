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


def test_init_distributed_single_process_noop():
    from gamer_tpu.parallel import init_distributed

    topo = init_distributed()
    assert topo.process_count == 1 and topo.process_index == 0
    assert topo.global_devices == 8  # the virtual CPU mesh


def test_host_shard_covers_everything_no_remainder_drop():
    from gamer_tpu.parallel import HostTopology
    from gamer_tpu.parallel.distributed import host_shard

    items = list(range(23))
    for hosts in (1, 2, 3, 8):
        shards = [
            host_shard(items, HostTopology(i, hosts, 1, hosts))
            for i in range(hosts)
        ]
        flat = [x for s in shards for x in s]
        assert flat == items  # ordered, complete, no dropped remainder
        sizes = {len(s) for s in shards}
        assert max(sizes) - min(sizes) <= 1  # balanced


def test_global_batch_mesh_and_2d_mesh():
    from gamer_tpu.parallel import global_batch_mesh, pixel_tile_mesh_2d

    m = global_batch_mesh()
    assert m.devices.size == 8 and m.axis_names == ("batch",)
    m2 = pixel_tile_mesh_2d(rows_axis=4)
    assert m2.devices.shape == (2, 4)
    assert m2.axis_names == ("batch", "rows")


def test_batch_sharded_over_global_mesh(fixtures_dir):
    """DCN-style batch decomposition end-to-end on the virtual mesh."""
    from gamer_tpu.engine.batch import render_flythrough
    from gamer_tpu.parallel import global_batch_mesh
    from gamer_tpu.scene.cameracontrols import orbit_path

    g = gax.load(fixtures_dir / "Sombrero.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
    )
    cams = orbit_path(scene.camera, 8, horizontal_deg=90.0)
    frames = render_flythrough(scene, cams, mesh=global_batch_mesh())
    assert frames.shape == (8, 16, 16, 3)
    assert int(frames.sum()) > 0
