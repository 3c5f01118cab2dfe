"""Noise level-of-detail knob (RenderConfig.noise_octaves).

Contract: caps >= the reference's largest octave count (10) are bit-exact
no-ops; lower caps drop fine grain only (image stays valid and close) and
both engines agree under the same cap.
"""

from __future__ import annotations

import numpy as np

import gamer_tpu
from gamer_tpu.scene import gax


def _scene(galaxy, noise_octaves=None):
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025,
                                      noise_octaves=noise_octaves),
    )


def test_cap_at_reference_octaves_is_bit_exact(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    exact = render_scene(_scene(g))
    capped = render_scene(_scene(g, noise_octaves=10))
    np.testing.assert_array_equal(capped, exact)


def test_low_cap_drops_grain_but_keeps_the_image(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    exact = render_scene(_scene(g)).astype(np.int16)
    lod = render_scene(_scene(g, noise_octaves=3)).astype(np.int16)
    assert lod.sum() > 0
    assert not np.array_equal(lod, exact)
    # emissive noise is amplitude-normalized; absorbing dust loses fine
    # occlusion detail, so a low cap brightens but stays the same galaxy
    ratio = float(lod.sum()) / float(exact.sum())
    assert 0.9 < ratio < 2.0
    assert float(np.abs(lod - exact).mean()) < 60.0


def test_pallas_matches_xla_under_cap(fixtures_dir):
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "VortexCloud.gax")
    scene = _scene(g, noise_octaves=4)
    ours = render_scene_pallas(scene)
    ref = render_scene(scene)
    d = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert d.max() <= 2, f"pallas vs xla under LOD cap: {d.max()}"


def test_noise_octaves_roundtrips_scene_dict():
    from gamer_tpu.scene.schema import scene_from_dict, scene_to_dict

    s = _scene(gamer_tpu.default_galaxy(), noise_octaves=5)
    assert scene_from_dict(scene_to_dict(s)).config.noise_octaves == 5
    s2 = _scene(gamer_tpu.default_galaxy())
    assert scene_from_dict(scene_to_dict(s2)).config.noise_octaves is None


def test_invalid_noise_octaves_rejected():
    import pytest

    with pytest.raises(ValueError, match="noise_octaves"):
        gamer_tpu.RenderConfig(noise_octaves=-1)
    with pytest.raises(ValueError, match="noise_octaves"):
        gamer_tpu.RenderConfig(noise_octaves=0)
