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


def test_dither_defaults_off_in_the_static(fixtures_dir):
    """dither defaults to False and only flips the compiled structure when
    asked (the default path's reference-exactness itself is gated by the
    oracle golden tests in test_engine.py)."""
    from gamer_tpu.engine.scene_prep import flatten_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    assert flatten_scene(_scene(g))[0].dither is False
    assert flatten_scene(_scene(g, dither=True))[0].dither is True


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


def test_diff_scan_matches_while_under_dither(fixtures_dir):
    """The differentiable scan march honors static.dither bit-exactly."""
    import jax
    import jax.numpy as jnp

    from gamer_tpu.engine import diff as gdiff
    from gamer_tpu.engine.render import render_frame
    from gamer_tpu.engine.scene_prep import flatten_scene
    from gamer_tpu.ops import camera as cam_ops

    scene = _scene(gax.load(fixtures_dir / "Spiral.gax"), dither=True)
    static, params = flatten_scene(scene)
    assert static.dither
    camera = jnp.asarray(scene.camera.camera, jnp.float32)
    inv_vp = jnp.asarray(cam_ops.inv_view_projection_host(
        np.asarray(scene.camera.camera, np.float32),
        scene.camera.target, scene.camera.up, scene.camera.fov))
    f = jnp.float32
    args = (params, camera, inv_vp, f(0.025), f(scene.config.min_ray_step),
            f(1.0), f(1.0), f(1.0))
    _, lin_ref = jax.jit(render_frame, static_argnums=(0, 1))(static, 16, *args)
    bound = gdiff.step_bound_for_scene(scene)
    _, lin_d = gdiff.render_frame_diff_jit(static, 16, bound, *args)
    np.testing.assert_array_equal(np.asarray(lin_d), np.asarray(lin_ref))


def test_dither_flows_through_batch(fixtures_dir):
    """dither lives in SceneStatic, so batched rendering honors it."""
    from gamer_tpu.engine.batch import render_batch

    g = gax.load(fixtures_dir / "Spiral.gax")
    base = render_batch([_scene(g), _scene(g)])
    dit = render_batch([_scene(g, dither=True), _scene(g, dither=True)])
    assert dit.shape == base.shape
    assert not np.array_equal(dit, base)
    np.testing.assert_array_equal(dit[0], dit[1])
