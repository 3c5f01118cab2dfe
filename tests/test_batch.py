"""Batched rendering (fly-through, dataset gen) + camera controls +
scene/dataset generators."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.engine.batch import make_batch_mesh, render_batch, render_flythrough
from gamer_tpu.scene import gax
from gamer_tpu.scene.cameracontrols import (
    orbit_path,
    rotate_horizontal,
    rotate_vertical,
    zoom,
)
from gamer_tpu.scene.generate import generate_galaxy_variations, generate_scene
from gamer_tpu.scene.schema import CameraParams


@pytest.fixture(scope="module")
def vortex_scene(fixtures_dir):
    g = gax.load(fixtures_dir / "VortexCloud.gax")
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
    )


def test_camera_controls_preserve_radius():
    cam = CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0))
    r0 = np.linalg.norm(cam.camera)
    c1 = rotate_horizontal(cam, 37.0)
    c2 = rotate_vertical(c1, -15.0)
    assert np.isclose(np.linalg.norm(c2.camera), r0, atol=1e-6)
    assert not np.allclose(c2.camera, cam.camera)
    c3 = zoom(cam, 0.2)
    assert np.isclose(np.linalg.norm(c3.camera), r0 - 0.2, atol=1e-6)


def test_orbit_path_count_and_closure():
    cam = CameraParams(camera=(1.0, 0, 0), target=(0, 0, 0), up=(0, 1, 0))
    path = orbit_path(cam, 5, horizontal_deg=360.0)
    assert len(path) == 5
    # 360/4-step orbit ends where it started (up to fp error)
    np.testing.assert_allclose(path[-1].camera,
                               rotate_horizontal(path[-2], 90.0).camera)


def test_flythrough_matches_single(vortex_scene):
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    cams = orbit_path(vortex_scene.camera, 3, horizontal_deg=60.0)
    frames = render_flythrough(vortex_scene, cams)
    assert frames.shape == (3, 16, 16, 3)
    single = render_scene_pallas(vortex_scene)
    np.testing.assert_array_equal(frames[0], single)
    assert (frames[0] != frames[2]).any()


def test_flythrough_sharded_matches_local(vortex_scene):
    cams = orbit_path(vortex_scene.camera, 8, horizontal_deg=120.0)
    sharded = render_flythrough(vortex_scene, cams, mesh=make_batch_mesh())
    local = render_flythrough(vortex_scene, cams)
    np.testing.assert_array_equal(sharded, local)


def test_dataset_batch_distinct(vortex_scene, fixtures_dir):
    g = gax.load(fixtures_dir / "VortexCloud.gax")
    variations = generate_galaxy_variations(g, 4, seed=3)
    # structure preserved
    assert all(len(v.components) == len(g.components) for v in variations)
    assert all(
        [c.class_name for c in v.components] == [c.class_name for c in g.components]
        for v in variations
    )
    scenes = [
        dataclasses.replace(vortex_scene,
                            instances=[gamer_tpu.GalaxyInstance(galaxy=v)])
        for v in variations
    ]
    batch = render_batch(scenes)
    assert batch.shape == (4, 16, 16, 3)
    assert all(int(f.sum()) > 0 for f in batch)
    assert (batch[0] != batch[1]).any()


def test_batch_mixed_structure_groups(vortex_scene, fixtures_dir):
    """A mixed-structure batch renders in structure GROUPS (one launch per
    group) and each frame equals its single-scene render."""
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    other = gamer_tpu.Scene(
        camera=vortex_scene.camera,
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=gax.load(fixtures_dir / "Spiral.gax"))],
        config=vortex_scene.config,
    )
    frames = render_batch([vortex_scene, other, vortex_scene])
    np.testing.assert_array_equal(frames[0], frames[2])
    for i, s in enumerate((vortex_scene, other)):
        single = render_scene_pallas(s)
        d = np.abs(frames[i].astype(np.int16) - single.astype(np.int16))
        assert d.max() <= 1, f"frame {i} vs single max diff {d.max()}"


def test_flythrough_depth_order_crossing(fixtures_dir):
    """Two instances with DIFFERENT structures, an orbit whose path crosses
    their depth order: every frame must composite far->near relative to ITS
    camera (rasterizer.cpp:190-201 re-sorts per render), gated per frame
    against the spec-exact oracle."""
    from gamer_tpu.engine.batch import _scene_groups
    from gamer_tpu.oracle.reference import render_oracle

    g1 = gax.load(fixtures_dir / "VortexCloud.gax")
    g2 = gax.load(fixtures_dir / "Spiral.gax")
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(1.2, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[
            gamer_tpu.GalaxyInstance(galaxy=g1, position=(0.0, 0.0, 0.45)),
            gamer_tpu.GalaxyInstance(galaxy=g2, position=(0.0, 0.0, -0.45)),
        ],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025),
    )
    cams = orbit_path(scene.camera, 4, horizontal_deg=270.0)
    scenes = [dataclasses.replace(scene, camera=c) for c in cams]
    groups = _scene_groups(scenes)
    assert len(groups) > 1, "orbit must actually cross the depth order"
    frames = render_flythrough(scene, cams)
    for i, s in enumerate(scenes):
        want, _ = render_oracle(s)
        d = np.abs(frames[i].astype(np.int16) - want.astype(np.int16))
        assert d.max() <= 2, f"frame {i} vs oracle max diff {d.max()}"


def test_batch_2d_mesh_rejects_wrong_axis_names(vortex_scene):
    """A 2-axis mesh with axes other than ('batch', 'rows') gets the
    descriptive ValueError, not a bare KeyError."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:2]).reshape(1, 2)
    with pytest.raises(ValueError, match="batch.*rows"):
        render_batch([vortex_scene, vortex_scene],
                     mesh=Mesh(devs, ("x", "y")))


def test_generate_scene_mode(fixtures_dir):
    g = gax.load(fixtures_dir / "VortexCloud.gax")
    scene = generate_scene([g], n=5, box_size=3.0, seed=11)
    assert len(scene.instances) == 5
    for inst in scene.instances:
        assert np.isclose(np.linalg.norm(inst.orientation), 1.0, atol=1e-9)
    # deterministic under the seed
    scene2 = generate_scene([g], n=5, box_size=3.0, seed=11)
    assert [i.position for i in scene.instances] == [i.position for i in scene2.instances]


def test_starred_batch_matches_single(fixtures_dir):
    """Starred batch frames (device overlay, computed once per unique star
    config) match the starred single-frame render."""
    import dataclasses

    from gamer_tpu.engine.batch import render_batch
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.scene import gax

    g = gax.load(fixtures_dir / "Spiral.gax")
    base = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=g)],
        config=gamer_tpu.RenderConfig(size=32, ray_step=0.025, no_stars=60,
                                      star_size=20.0, star_seed=3),
    )
    other = dataclasses.replace(
        base, config=dataclasses.replace(base.config, star_seed=9))
    frames = render_batch([base, base, other])
    np.testing.assert_array_equal(frames[0], frames[1])  # shared field
    assert not np.array_equal(frames[0], frames[2])       # different seed
    single = render_scene_pallas(base)
    d = np.abs(frames[0].astype(np.int16) - single.astype(np.int16))
    assert d.max() <= 2, f"starred batch vs single max diff {d.max()}"
