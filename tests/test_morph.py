"""Galaxy morphing (scene/morph.py): structure gating, endpoint exactness,
one-launch batch rendering."""

from __future__ import annotations

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.engine.scene_prep import flatten_scene
from gamer_tpu.scene import gax
from gamer_tpu.scene.morph import lerp_galaxy, morph_scenes
from gamer_tpu.scene.schema import default_galaxy


def _scene(galaxy, size=16):
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025),
    )


def _variant():
    g = default_galaxy()
    for c in g.components:
        c.strength *= 0.5
        c.r0 *= 1.4
    g.params.winding_n = 6.0
    return g


def test_lerp_endpoints_exact():
    a, b = default_galaxy(), _variant()
    g0, g1 = lerp_galaxy(a, b, 0.0), lerp_galaxy(a, b, 1.0)
    assert g0.components[0].strength == a.components[0].strength
    assert g1.components[0].strength == b.components[0].strength
    assert g1.params.winding_n == b.params.winding_n


def test_structure_mismatch_rejected():
    a = default_galaxy()
    b = default_galaxy(component_count=2)
    with pytest.raises(ValueError, match="not morph-compatible"):
        lerp_galaxy(a, b, 0.5)
    c = default_galaxy()
    c.components[1].arm = 0.0  # toggles arm modulation off -> new structure
    with pytest.raises(ValueError, match="arm modulation"):
        lerp_galaxy(a, c, 0.5)


def test_morph_scenes_share_structure_and_render():
    from gamer_tpu.engine.batch import render_batch

    scenes = morph_scenes(_scene(default_galaxy()), _variant(), 4)
    statics = [flatten_scene(s)[0] for s in scenes]
    assert all(st == statics[0] for st in statics)
    imgs = render_batch(scenes)
    assert imgs.shape == (4, 16, 16, 3)
    assert imgs[0].sum() > 0 and imgs[-1].sum() > 0
    assert not np.array_equal(imgs[0], imgs[-1])


def test_morph_endpoint_matches_single_render():
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    base = _scene(default_galaxy())
    scenes = morph_scenes(base, _variant(), 3)
    imgs = __import__("gamer_tpu.engine.batch", fromlist=["render_batch"]) \
        .render_batch(scenes)
    single = render_scene_pallas(scenes[0])
    np.testing.assert_array_equal(imgs[0], single)


def test_fixture_morph_compatibility_check(fixtures_dir):
    spiral = gax.load(fixtures_dir / "Spiral.gax")
    sombrero = gax.load(fixtures_dir / "Sombrero.gax")
    # Whether these morph or not, the gate must answer without crashing;
    # Spiral morphs to itself trivially.
    g = lerp_galaxy(spiral, spiral, 0.5)
    assert g.params.winding_n == spiral.params.winding_n
    try:
        lerp_galaxy(spiral, sombrero, 0.5)
    except ValueError as e:
        assert "not morph-compatible" in str(e)


def test_sign_crossing_rejected():
    a = default_galaxy()
    b = default_galaxy()
    b.components[1].arm = -a.components[1].arm  # 0.2 -> -0.2 hits 0 mid-morph
    with pytest.raises(ValueError, match="sign"):
        lerp_galaxy(a, b, 0.5)


def test_deterministic_ignores_stars_small():
    """A deterministic scene whose endpoints differ only in a 'stars small'
    component flattens to one compiled structure (scene_prep drops cid 6),
    so the morph gate must accept it too (ADVICE round 1)."""
    import dataclasses

    from gamer_tpu.scene.schema import ComponentParams

    a = default_galaxy()
    b = _variant()
    b.components.append(ComponentParams(
        class_name="stars small", strength=1.0, scale=1000.0, noise_tilt=2.0,
        spectrum="White", name="sparkle"))
    # non-deterministic: structures genuinely differ -> rejected
    with pytest.raises(ValueError, match="not morph-compatible"):
        lerp_galaxy(a, b, 0.5)
    # deterministic: the sparkle component is outside the compiled structure
    g = lerp_galaxy(a, b, 0.5, deterministic=True)
    assert g.components[0].strength == pytest.approx(
        0.5 * (a.components[0].strength + b.components[0].strength))
    scene = _scene(a)
    scene = dataclasses.replace(
        scene, config=dataclasses.replace(scene.config, deterministic=True))
    scenes = morph_scenes(scene, b, 3)
    statics = [flatten_scene(s)[0] for s in scenes]
    assert all(st == statics[0] for st in statics)
