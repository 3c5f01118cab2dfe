"""Per-ray march-start dithering (RenderConfig.dither).

Dither jitters each ray's start by a deterministic direction-hash, so the
two engines' images agree statistically (their normalized direction bits
can differ in the last ulp, changing individual hashes) rather than
bit-for-bit like the undithered paths.
"""

from __future__ import annotations

import numpy as np

import gamer_tpu
from gamer_tpu.scene import gax


def _scene(galaxy, dither=False, size=16):
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025,
                                      dither=dither),
    )


def test_dither_off_is_reference_exact(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    np.testing.assert_array_equal(
        render_scene(_scene(g)), render_scene(_scene(g, dither=False))
    )


def test_dither_jitters_but_preserves_the_image(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    base = render_scene(_scene(g)).astype(np.int16)
    dit = render_scene(_scene(g, dither=True)).astype(np.int16)
    assert dit.sum() > 0
    assert not np.array_equal(dit, base)
    # sub-step jitter: same galaxy, same exposure
    assert abs(float(dit.sum()) / float(base.sum()) - 1.0) < 0.1
    assert float(np.abs(dit - base).mean()) < 10.0
    # deterministic: same hash, same image
    np.testing.assert_array_equal(dit, render_scene(_scene(g, dither=True)))


def test_pallas_dither_statistically_matches_xla(fixtures_dir):
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "VortexCloud.gax")
    scene = _scene(g, dither=True)
    ours = render_scene_pallas(scene).astype(np.int16)
    ref = render_scene(scene).astype(np.int16)
    assert ours.sum() > 0
    assert abs(float(ours.sum()) / float(ref.sum()) - 1.0) < 0.1
    assert float(np.abs(ours - ref).mean()) < 10.0


def test_dither_roundtrips_scene_dict():
    from gamer_tpu.scene.schema import scene_from_dict, scene_to_dict

    s = _scene(gamer_tpu.default_galaxy(), dither=True)
    assert scene_from_dict(scene_to_dict(s)).config.dither is True
