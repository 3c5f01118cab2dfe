"""Scene layer tests: .gax IO, spectra, scene-dict round trips."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gamer_tpu.scene import gax
from gamer_tpu.scene.schema import (
    CID_NONE,
    ComponentParams,
    GalaxyData,
    GalaxyParams,
    Scene,
    class_name_to_cid,
    default_galaxy,
    galaxy_from_dict,
    galaxy_to_dict,
    scene_from_dict,
    scene_to_dict,
)
from gamer_tpu.scene.spectra import BUILTIN_SPECTRA, find_spectrum, verify_spectra


def test_gax_roundtrip_bytes(fixtures_dir):
    """dumps(loads(x)) is byte-identical for every fixture."""
    for path in sorted(fixtures_dir.glob("*.gax")):
        raw = path.read_bytes()
        assert gax.dumps(gax.loads(raw)) == raw, path.name


def test_gax_fixture_contents(fixtures_dir):
    g = gax.load(fixtures_dir / "Spiral.gax")
    assert g.components, "Spiral should have components"
    assert all(c.class_name in (
        "bulge", "disk", "dust", "dust2", "dust positive", "stars", "stars small"
    ) for c in g.components)
    assert g.params.no_arms >= 1


def test_gax_truncated_raises():
    g = default_galaxy()
    raw = gax.dumps(g)
    with pytest.raises(ValueError):
        gax.loads(raw[:-4])


def test_default_galaxy_matches_reference_template():
    """galaxy.cpp:111-154 default template."""
    g = default_galaxy(3)
    assert [c.class_name for c in g.components] == ["bulge", "disk", "dust2"]
    assert g.components[0].strength == 30.0
    assert g.components[0].r0 == 5.0
    assert g.components[1].spectrum == "Blue"


def test_class_name_to_cid():
    assert class_name_to_cid("Bulge") == 0
    assert class_name_to_cid("dust positive") == 4
    assert class_name_to_cid("no-such-class") == CID_NONE


def test_spectra_lookup():
    assert find_spectrum("YELLOW") == (1.0, 0.9, 0.45)
    assert find_spectrum("unknown-name") == (1.0, 1.0, 1.0)
    assert find_spectrum("Custom", {"custom": (0.1, 0.2, 0.3)}) == (0.1, 0.2, 0.3)
    assert verify_spectra(["Red", "Blue"]) == ""
    assert verify_spectra(["Red", "Nope"]) == "Nope"
    assert set(BUILTIN_SPECTRA) == {"red", "yellow", "blue", "white", "cyan", "purple"}


def test_scene_dict_roundtrip():
    g = default_galaxy()
    scene = Scene()
    scene.instances = []
    d = scene_to_dict(scene)
    back = scene_from_dict(d)
    assert scene_to_dict(back) == d

    gd = galaxy_to_dict(g)
    g2 = galaxy_from_dict(gd)
    assert galaxy_to_dict(g2) == gd


def test_galaxy_params_defaults():
    p = GalaxyParams()
    assert p.arm2 == math.pi
    assert p.no_arms == 2.0
    c = ComponentParams()
    assert c.z0 == 0.02 and c.winding == 0.1
