"""Selectable raw-noise backends (RenderConfig.noise_kind).

The reference ships three Noise implementations but hardcodes Simplex in
every rasterizer constructor (rasterizer.h:57,62,67); Perlin
(source/noise/perlin.*) and IQ value noise (source/noise/iqnoise.*) are
commented-out alternatives. Here they are actually selectable in the XLA
engine. Contract:

- the default ("simplex") stays bit-identical to the pre-knob engine;
- "perlin"/"iq" render deterministic, finite, non-trivial images that
  differ from simplex (no conformance oracle exists — the reference never
  renders with them);
- the production Pallas kernel rejects non-simplex kinds with a clear
  error (it implements the engine default, like the reference hardcoding).
"""

from __future__ import annotations

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.scene import gax


def _scene(galaxy, noise_kind="simplex"):
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025,
                                      noise_kind=noise_kind),
    )


def test_default_kind_is_bit_exact(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    base = render_scene(_scene(g))
    explicit = render_scene(_scene(g, noise_kind="simplex"))
    np.testing.assert_array_equal(explicit, base)


@pytest.mark.parametrize("kind", ["perlin", "iq"])
def test_alternative_kinds_render(fixtures_dir, kind):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    simplex = render_scene(_scene(g)).astype(np.int16)
    alt = render_scene(_scene(g, noise_kind=kind)).astype(np.int16)
    alt2 = render_scene(_scene(g, noise_kind=kind)).astype(np.int16)
    np.testing.assert_array_equal(alt, alt2)  # deterministic
    assert np.isfinite(alt).all()
    assert alt.sum() > 0  # a galaxy, not a blank frame
    assert not np.array_equal(alt, simplex)  # a different noise field


def test_combinators_accept_raw_fn_explicitly():
    """octave/ridged with raw_fn=<simplex> match the default exactly, and
    resolve_raw rejects unknown kinds."""
    import jax.numpy as jnp

    from gamer_tpu.ops import noise as jnoise

    x = jnp.linspace(-2.0, 2.0, 64)
    y = x * 0.7 + 0.3
    z = x * -1.3 + 1.1
    a = jnoise.octave_noise_3d(5, 0.5, 1.7, x, y, z)
    b = jnoise.octave_noise_3d(5, 0.5, 1.7, x, y, z,
                               raw_fn=jnoise.resolve_raw("simplex"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    r1 = jnoise.ridged_mf(x, y, z, 1.3, 4, 2.5, 0.9, 0.8)
    r2 = jnoise.ridged_mf(x, y, z, 1.3, 4, 2.5, 0.9, 0.8,
                          raw_fn=jnoise.resolve_raw(None))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    with pytest.raises(ValueError, match="unknown noise kind"):
        jnoise.resolve_raw("white")


def test_pallas_rejects_non_simplex(fixtures_dir):
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    g = gax.load(fixtures_dir / "Spiral.gax")
    with pytest.raises(ValueError, match="noise_kind='simplex'"):
        render_scene_pallas(_scene(g, noise_kind="perlin"))


def test_config_validates_kind():
    with pytest.raises(ValueError, match="noise_kind"):
        gamer_tpu.RenderConfig(size=16, noise_kind="fbm")


def test_scene_dict_round_trips_kind(fixtures_dir):
    from gamer_tpu.scene.schema import scene_from_dict, scene_to_dict

    g = gax.load(fixtures_dir / "Spiral.gax")
    d = scene_to_dict(_scene(g, noise_kind="iq"))
    assert d["config"]["noise_kind"] == "iq"
    assert scene_from_dict(d).config.noise_kind == "iq"
    # absent key -> default
    del d["config"]["noise_kind"]
    assert scene_from_dict(d).config.noise_kind == "simplex"


def test_serve_rejects_non_simplex_at_submission(fixtures_dir):
    """The service renders through the Pallas kernel; a non-simplex scene
    must fail at submission (-> HTTP 400), not minutes later on the worker."""
    from gamer_tpu.serve import RenderService

    g = gax.load(fixtures_dir / "Spiral.gax")
    svc = RenderService(autostart=False)
    with pytest.raises(ValueError, match="noise_kind='simplex'"):
        svc.submit(_scene(g, noise_kind="perlin"))
