"""Selectable raw-noise backends (RenderConfig.noise_kind).

The reference ships three Noise implementations but hardcodes Simplex in
every rasterizer constructor (rasterizer.h:57,62,67); Perlin
(source/noise/perlin.*) and IQ value noise (source/noise/iqnoise.*) are
commented-out alternatives. Here they are actually selectable in the XLA
engine. Contract:

- the default ("simplex") stays bit-identical to the pre-knob engine;
- "perlin"/"iq" render deterministic, finite, non-trivial images that
  differ from simplex (scalar algorithm oracles: tests/test_altnoise_oracle);
- the production Pallas kernel renders all three kinds, cross-engine gated
  against the XLA path at the established tolerance, so the service
  accepts them too.
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


def test_noise_statistics():
    """Noise::calculate_statistics parity (noise.cpp:132-160): simplex raw
    noise over uniform random points is zero-mean-ish and bounded in
    [-1, 1]; the helper is deterministic under a fixed seed."""
    from gamer_tpu.ops import noise as jnoise

    s1 = jnoise.noise_statistics(jnoise.raw_noise_3d, n=20000, seed=7)
    s2 = jnoise.noise_statistics(jnoise.raw_noise_3d, n=20000, seed=7)
    assert s1 == s2  # seeded -> reproducible
    assert -1.0 <= s1["min"] < s1["max"] <= 1.0
    assert abs(s1["mean"]) < 0.05
    assert 0.1 < s1["std"] < 0.5
    # a constant sampler: degenerate stats come out exact
    import jax.numpy as jnp

    s3 = jnoise.noise_statistics(
        lambda x, y, z: jnp.full_like(x, 0.25), n=100)
    assert s3 == {"min": 0.25, "max": 0.25, "mean": 0.25, "std": 0.0}


@pytest.mark.parametrize("kind", ["perlin", "iq"])
def test_pallas_matches_xla_for_alt_kinds(fixtures_dir, kind):
    """Production-kernel alt noise vs the XLA engine: the established
    cross-engine tolerance (<=2 uint8 LSB, same gate as simplex in
    tests/test_pallas.py). Under CPU interpret both share one libm, so the
    IQ sin-hash agrees too; on hardware the IQ gate is statistical (the TC
    core's sin differs in last ulps — scripts/ladder.py re-checks there)."""
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    scene = _scene(g, noise_kind=kind)
    ours = render_scene_pallas(scene)
    ref = render_scene(scene)
    assert np.asarray(ours).sum() > 0
    d = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert d.max() <= 2, f"pallas vs xla ({kind}) max diff {d.max()}"


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


def test_serve_accepts_alt_kinds(fixtures_dir):
    """The service's Pallas path now renders all three kinds — submission
    must accept them (and still 400 on a genuinely unknown kind via the
    RenderConfig validator)."""
    from gamer_tpu.serve import RenderService

    g = gax.load(fixtures_dir / "Spiral.gax")
    svc = RenderService(autostart=False)
    jid = svc.submit(_scene(g, noise_kind="perlin"))
    assert svc.jobs[jid].state == "queued"
    jid2 = svc.submit(_scene(g, noise_kind="iq"))
    assert svc.jobs[jid2].state == "queued"


@pytest.mark.slow
def test_serve_renders_perlin_end_to_end(fixtures_dir):
    """One 16^2 perlin render through the service worker (interpret-mode
    Pallas on CPU) — the full submit -> worker -> finished-frame path."""
    from gamer_tpu.serve import RenderService

    g = gax.load(fixtures_dir / "Spiral.gax")
    svc = RenderService()
    try:
        jid = svc.submit(_scene(g, noise_kind="perlin"))
        job = svc.wait(jid, timeout=600.0)
        assert job.state == "done", job.error
        assert job.image.sum() > 0
    finally:
        svc.stop()
