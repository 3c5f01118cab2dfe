"""Supersampled anti-aliasing (RenderConfig.supersample)."""

from __future__ import annotations

import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.scene import gax


def _scene(galaxy, ss=1, size=16):
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025,
                                      supersample=ss),
    )


def test_ss1_default_and_pooling_identity(fixtures_dir):
    """supersample defaults to 1, and rendering at ss=2 then pooling equals
    pooling an ss=1 render of double size (the pooled path IS the plain
    path plus a linear box filter; default-path reference-exactness is
    gated by the oracle golden tests in test_engine.py)."""
    from gamer_tpu.engine.render import render_scene

    assert gamer_tpu.RenderConfig().supersample == 1
    g = gax.load(fixtures_dir / "Spiral.gax")
    _, lin32 = render_scene(_scene(g, ss=1, size=32), return_linear=True)
    _, lin_aa = render_scene(_scene(g, ss=2, size=16), return_linear=True)
    manual = lin32.reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(lin_aa, manual, rtol=1e-6, atol=1e-6)


def test_ss2_smooths_without_changing_the_image(fixtures_dir):
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    base = render_scene(_scene(g, ss=1)).astype(np.int16)
    aa = render_scene(_scene(g, ss=2)).astype(np.int16)
    assert aa.shape == base.shape
    assert aa.sum() > 0
    assert not np.array_equal(aa, base)
    # same galaxy, same exposure: close in the mean, smoother locally
    assert abs(float(aa.sum()) / float(base.sum()) - 1.0) < 0.2
    def roughness(img):
        return float(np.abs(np.diff(img.astype(np.float32), axis=0)).mean())
    assert roughness(aa) < roughness(base)


def test_pallas_matches_xla_supersampled(fixtures_dir):
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "VortexCloud.gax")
    scene = _scene(g, ss=2)
    ours = render_scene_pallas(scene)
    ref = render_scene(scene)
    d = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert d.max() <= 2, f"pallas vs xla supersampled: {d.max()}"


def test_invalid_supersample_rejected():
    with pytest.raises(ValueError, match="supersample"):
        gamer_tpu.RenderConfig(supersample=0)


def test_batch_supersamples(fixtures_dir):
    """Batched frames pool per element; batch element 0 == single render."""
    from gamer_tpu.engine.batch import render_batch
    from gamer_tpu.engine.pallas_render import render_scene_pallas

    g = gax.load(fixtures_dir / "Spiral.gax")
    s = _scene(g, ss=2)
    imgs = render_batch([s, s])
    assert imgs.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(imgs[0], render_scene_pallas(s))

    mixed = [_scene(g, ss=2), _scene(g, ss=1)]
    with pytest.raises(ValueError, match="supersample"):
        render_batch(mixed)


def test_supersample_roundtrips_scene_dict():
    from gamer_tpu.scene.schema import scene_from_dict, scene_to_dict

    s = _scene(gamer_tpu.default_galaxy(), ss=4)
    assert scene_from_dict(scene_to_dict(s)).config.supersample == 4


def test_non_integer_supersample_rejected():
    with pytest.raises(ValueError, match="supersample"):
        gamer_tpu.RenderConfig(supersample=2.5)
    with pytest.raises(ValueError, match="noise_octaves"):
        gamer_tpu.RenderConfig(noise_octaves=3.7)


def test_sharded_supersample_matches_single_device(fixtures_dir):
    from gamer_tpu.engine.pallas_render import render_scene_pallas
    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.parallel.sharding import render_scene_sharded

    g = gax.load(fixtures_dir / "Spiral.gax")
    s = _scene(g, ss=2, size=16)
    # XLA row sharding propagates through the box filter bit-exactly
    np.testing.assert_array_equal(
        render_scene_sharded(s, method="xla"), render_scene(s))
    # production (Pallas) row sharding: <=2 LSB vs the fused launch on CPU
    # interpret (bit-exact on TPU — see _compiled_rowshard)
    d = np.abs(render_scene_sharded(s).astype(np.int16)
               - render_scene_pallas(s).astype(np.int16))
    assert d.max() <= 2, f"pallas sharded ss vs fused max diff {d.max()}"


def test_progressive_supersample_matches_direct(fixtures_dir):
    from gamer_tpu.engine.queue import render_progressive
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    s = _scene(g, ss=2, size=16)
    np.testing.assert_array_equal(
        render_progressive(s, chunks=4), render_scene(s)
    )
