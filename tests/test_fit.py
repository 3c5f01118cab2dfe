"""Differentiable path (engine/diff) + gradient fitting (engine/fit).

Gates:
  1. The scan march is bit-identical to the production while_loop march
     whenever the static trip bound covers the realized trip count.
  2. Reverse-mode gradients through the full pipeline are finite and
     informative (nonzero where they must be).
  3. Adam on those gradients actually recovers perturbed galaxy
     parameters (loss collapses, write-back round-trips).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.engine import diff as gdiff
from gamer_tpu.engine import fit as gfit
from gamer_tpu.engine.render import render_frame
from gamer_tpu.engine.scene_prep import flatten_scene
from gamer_tpu.ops import camera as cam_ops
from gamer_tpu.scene import gax
from gamer_tpu.scene.schema import default_galaxy


def _scene(galaxy, size, ray_step=0.025, preview=True):
    return gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(
            camera=(0.5, 0, 0), target=(0, 0, 0), up=(0, 1, 0), fov=90.0
        ),
        instances=[gamer_tpu.GalaxyInstance(galaxy=galaxy)],
        config=gamer_tpu.RenderConfig(
            size=size, ray_step=ray_step, is_preview=preview
        ),
    )


def _render_args(scene):
    static, params = flatten_scene(scene)
    camera = jnp.asarray(scene.camera.camera, jnp.float32)
    inv_vp = jnp.asarray(cam_ops.inv_view_projection_host(
        np.asarray(scene.camera.camera, np.float32),
        scene.camera.target, scene.camera.up, scene.camera.fov,
    ))
    cfg = scene.config
    f = jnp.float32
    return static, params, camera, inv_vp, f(cfg.ray_step), f(cfg.min_ray_step)


def test_step_bound_is_positive_and_scales():
    tight = gdiff.conservative_step_bound(0.025, 0.01)
    loose = gdiff.conservative_step_bound(0.001, 0.001)
    assert 0 < tight < loose


def test_scan_march_matches_while_loop(fixtures_dir):
    scene = _scene(gax.load(fixtures_dir / "Spiral.gax"), 24, preview=False)
    static, params, camera, inv_vp, rs, ms = _render_args(scene)
    cfg = scene.config

    img_ref, linear_ref = jax.jit(
        render_frame, static_argnums=(0, 1)
    )(static, 24, params, camera, inv_vp, rs, ms,
      jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))

    bound = gdiff.step_bound_for_scene(scene)
    img_d, linear_d = gdiff.render_frame_diff_jit(
        static, 24, bound, params, camera, inv_vp, rs, ms,
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
    )
    np.testing.assert_array_equal(np.asarray(linear_d), np.asarray(linear_ref))
    # Float post truncates to the same uint8 cells.
    np.testing.assert_array_equal(
        np.asarray(img_d).astype(np.uint8), np.asarray(img_ref)
    )
    assert int(np.asarray(img_ref).sum()) > 0


def test_gradients_finite_and_nonzero():
    galaxy = default_galaxy()
    for comp in galaxy.components:
        # inner == 0 is a zero-width smoothstep edge whose gradient is NaN
        # by construction (fit_scene projects it off zero; see _FIT_BOUNDS).
        comp.inner = 0.01
    scene = _scene(galaxy, 16)
    static, params, camera, inv_vp, rs, ms = _render_args(scene)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    bound = gdiff.step_bound_for_scene(scene)
    dirs = cam_ops.ray_grid(16, inv_vp)

    def loss(p):
        linear = gdiff.render_rays_diff(static, p, dirs, camera, rs, ms, bound)
        img = gdiff.post_process_float(
            linear, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0)
        )
        return jnp.mean(img ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # The bulge strength visibly lights the frame: its gradient cannot vanish.
    comp_grads = grads[0]["comps"]
    assert abs(float(comp_grads[0]["strength"])) > 0


def test_fit_recovers_perturbed_parameters():
    truth = default_galaxy()
    scene_truth = _scene(truth, 24)
    static, params, camera, inv_vp, rs, ms = _render_args(scene_truth)
    bound = gdiff.step_bound_for_scene(scene_truth)
    target, _ = gdiff.render_frame_diff_jit(
        static, 24, bound, params, camera, inv_vp, rs, ms,
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
    )
    assert float(np.asarray(target).sum()) > 0

    start = default_galaxy()
    start.components[0].strength *= 2.0   # bulge
    start.components[1].strength *= 0.5   # disk
    start.components[1].r0 *= 0.7
    scene_start = _scene(start, 24)

    result = gfit.fit_scene(
        scene_start, np.asarray(target),
        fit_fields=("strength", "r0"), steps=30, lr=5e-2,
    )
    assert result.losses[0] > 0
    assert result.losses[-1] < 0.3 * result.losses[0]

    # Write-back round-trip: the fitted scene re-renders at the fitted loss.
    s2, p2 = flatten_scene(result.scene)
    assert s2 == static
    img2, _ = gdiff.render_frame_diff_jit(
        s2, 24, bound, jax.tree_util.tree_map(jnp.asarray, p2), camera,
        inv_vp, rs, ms, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
    )
    reloss = float(np.mean((np.asarray(img2) / 255.0 -
                            np.asarray(target) / 255.0) ** 2))
    assert reloss <= result.losses[-1] * 1.05 + 1e-8
    # And the fitted strengths moved toward the truth.
    fitted = result.scene.instances[0].galaxy.components
    assert abs(fitted[1].strength - truth.components[1].strength) < \
        abs(start.components[1].strength - truth.components[1].strength)


def test_fit_scene_multiscale_converges():
    """The parameter-fit resolution pyramid: a half-res rung + full-res
    rung in one call converges like the direct fit and restores the
    caller's frame size."""
    truth = default_galaxy()
    scene_truth = _scene(truth, 24)
    static, params, camera, inv_vp, rs, ms = _render_args(scene_truth)
    bound = gdiff.step_bound_for_scene(scene_truth)
    target, _ = gdiff.render_frame_diff_jit(
        static, 24, bound, params, camera, inv_vp, rs, ms,
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
    )

    start = default_galaxy()
    start.components[0].strength *= 2.0
    start.components[1].r0 *= 0.7
    scene_start = _scene(start, 24)

    seen = []
    result = gfit.fit_scene_multiscale(
        scene_start, np.asarray(target), fit_fields=("strength", "r0"),
        steps=15, lr=5e-2, schedule=(2, 1),
        on_step=lambda i, loss: seen.append(i),
    )
    # each rung reports steps+1 losses (final-iterate loss included)
    assert len(result.losses) == 32 and seen == list(range(30))
    assert result.losses[-1] < 0.3 * result.losses[0]
    assert result.scene.config.size == scene_start.config.size
    # and the full-res rung's fitted values must beat the start on the
    # FULL-resolution objective (the coarse rung must not have biased them)
    fitted = result.scene.instances[0].galaxy.components
    assert abs(fitted[0].strength - truth.components[0].strength) < \
        abs(start.components[0].strength - truth.components[0].strength)
    with pytest.raises(ValueError, match="rung"):
        gfit.fit_scene_multiscale(scene_start, np.asarray(target),
                                  schedule=(), steps=1)


def test_fit_mask_rejects_unknown_fields():
    scene = _scene(default_galaxy(), 16)
    with pytest.raises(ValueError, match="unknown fit fields"):
        gfit.fit_scene(scene, np.zeros((16, 16, 3), np.uint8),
                       fit_fields=("orientation",), steps=1)


def test_fit_axis_bound_and_headroom():
    """Fitting 'axis' projects it above zero and reserves trip headroom."""
    scene = _scene(default_galaxy(), 16)
    target = np.zeros((16, 16, 3), np.uint8)
    result = gfit.fit_scene(scene, target, fit_fields=("axis",), steps=2,
                            lr=5e-2)
    fitted_axis = result.scene.instances[0].galaxy.params.axis
    assert all(a >= 1e-2 for a in fitted_axis)


def test_pose_refinement_reduces_position_error(fixtures_dir):
    """fit_pose, realistic workflow: a FULL-quality target, pose refined
    with an LOD-3 forward model + mean-normalized loss (the default).
    Full-octave fitting would drown the gradient — see the docstring."""
    g = gax.load(fixtures_dir / "Spiral.gax")

    def pose_scene(cam, lod):
        s = _scene(g, 16)
        s.camera = gamer_tpu.CameraParams(camera=cam, target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0)
        s.config = gamer_tpu.RenderConfig(size=16, ray_step=0.025,
                                          is_preview=True, noise_octaves=lod)
        return s

    from gamer_tpu.engine.render import render_scene

    target = render_scene(pose_scene((0.5, 0, 0), lod=None))  # exact octaves
    start_cam = (0.54, 0.02, -0.02)
    res = gfit.fit_pose(pose_scene(start_cam, lod=3), target, ("camera",),
                        steps=40, lr=1e-2)
    truth = np.array((0.5, 0.0, 0.0))
    err0 = float(np.linalg.norm(np.array(start_cam) - truth))
    err1 = float(np.linalg.norm(np.array(res.scene.camera.camera) - truth))
    assert err1 < 0.6 * err0, f"position error {err0:.4f} -> {err1:.4f}"
    assert min(res.losses) < res.losses[0]


def test_pose_fit_rejects_unknown_fields():
    scene = _scene(default_galaxy(), 16)
    with pytest.raises(ValueError, match="unknown pose fields"):
        gfit.fit_pose(scene, np.zeros((16, 16, 3), np.uint8),
                      fit_fields=("up",), steps=1)
    with pytest.raises(ValueError, match="unknown pose fields"):
        gfit.fit_pose_fd(scene, np.zeros((16, 16, 3), np.uint8),
                         fit_fields=("up",), steps=1)


@pytest.mark.slow
def test_fit_pose_fd_full_octaves(fixtures_dir):
    """fit_pose_fd's selling point: pose descent at EXACT full-octave
    quality with no LOD ladder. The ±eps probes sit one pixel of image
    motion apart — far above the noise correlation length that makes the
    reverse-mode full-octave gradient useless (fit_pose's docstring) — so
    the secant gradient reads the structure-alignment slope. The forward
    model is the production batch kernel (2K+1 frames, one launch).
    Small frame + few steps: full-octave noise in CPU interpret mode is
    the expensive part; the TPU-scale numbers live in docs/PARITY.md."""
    g = gax.load(fixtures_dir / "Spiral.gax")

    def pose_scene(cam):
        s = _scene(g, 12)
        s.camera = gamer_tpu.CameraParams(camera=cam, target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0)
        s.config = gamer_tpu.RenderConfig(size=12, ray_step=0.025,
                                          is_preview=True)
        return s

    from gamer_tpu.engine.render import render_scene

    target = render_scene(pose_scene((0.5, 0, 0)))  # exact octaves
    start_cam = (0.53, 0.015, -0.015)
    res = gfit.fit_pose_fd(pose_scene(start_cam), target, ("camera",),
                           steps=12, lr=1.5e-2)
    truth = np.array((0.5, 0.0, 0.0))
    err0 = float(np.linalg.norm(np.array(start_cam) - truth))
    err1 = float(np.linalg.norm(np.array(res.scene.camera.camera) - truth))
    assert err1 < 0.75 * err0, f"position error {err0:.4f} -> {err1:.4f}"
    assert min(res.losses) < res.losses[0]


def test_fit_pose_fd_checkpoint_resume(tmp_path):
    """Interrupted-at-step-2 + resume replays the uninterrupted 4-step
    trajectory exactly (the host Adam moments live in the checkpoint)."""
    scene = _scene(default_galaxy(), 12)
    scene.config = gamer_tpu.RenderConfig(size=12, ray_step=0.025,
                                          is_preview=True, noise_octaves=2)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    import dataclasses

    start = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera,
                                          camera=(0.52, 0.01, 0.0)))
    kw = dict(fit_fields=("camera",), lr=1e-2)
    straight = gfit.fit_pose_fd(start, target, steps=4, **kw)
    ckpt = str(tmp_path / "posefd.ckpt")
    gfit.fit_pose_fd(start, target, steps=2, checkpoint_path=ckpt,
                     checkpoint_every=1, **kw)
    resumed = gfit.fit_pose_fd(start, target, steps=4, checkpoint_path=ckpt,
                               checkpoint_every=1, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.losses),
                                  np.asarray(straight.losses))
    np.testing.assert_array_equal(resumed.params["camera"],
                                  straight.params["camera"])


def test_fit_scene_fd_rejects_unknown_fields():
    scene = _scene(default_galaxy(), 12)
    with pytest.raises(ValueError, match="unknown fit fields"):
        gfit.fit_scene_fd(scene, np.zeros((12, 12, 3), np.uint8),
                          fit_fields=("per",), steps=1)


def test_fit_scene_fd_drops_zero_structure_flag_dims():
    """winding/arm nonzero-ness is compiled structure (scene_prep
    CompStatic): a dim whose initial value is exactly 0 is dropped with a
    warning, and a field set that matches ONLY such dims is an error."""
    import dataclasses

    g = default_galaxy(1)
    g = dataclasses.replace(
        g, components=[dataclasses.replace(c, winding=0.0)
                       for c in g.components])
    scene = _scene(g, 12)
    with pytest.warns(RuntimeWarning, match="structure-flag"):
        with pytest.raises(ValueError, match="no probe dimensions"):
            gfit.fit_scene_fd(scene, np.zeros((12, 12, 3), np.uint8),
                              fit_fields=("winding",), steps=1)


def test_fit_scene_fd_recovers_winding_b(fixtures_dir):
    """The point of fit_scene_fd: the spiral-defining winding_b — whose
    autodiff gradients are chaotic under the tensor march and excluded
    from the frozen march — descends by production-kernel FD probes.
    Perturb winding_b x1.3 and recover toward truth (small frame + LOD
    for CPU interpret speed; TPU-scale numbers in BASELINE.md)."""
    import dataclasses

    g = gax.load(fixtures_dir / "Spiral.gax")
    scene = _scene(g, 16)
    scene.config = dataclasses.replace(scene.config, noise_octaves=2)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    truth = float(g.params.winding_b)
    start = gamer_tpu.Scene(
        camera=scene.camera,
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=dataclasses.replace(
                g, params=dataclasses.replace(g.params,
                                              winding_b=truth * 1.3)))],
        config=scene.config,
    )
    res = gfit.fit_scene_fd(start, target, ("winding_b",), steps=10,
                            lr=3e-2)
    fitted = float(res.scene.instances[0].galaxy.params.winding_b)
    err0 = abs(truth * 1.3 - truth)
    err1 = abs(fitted - truth)
    assert err1 < 0.6 * err0, f"winding_b {truth*1.3:.4f} -> {fitted:.4f} (truth {truth:.4f})"
    assert min(res.losses) < res.losses[0]


def test_fit_scene_fd_sweep_stages():
    """The staged global search (joint group grid + zooming coordinate
    sweeps) runs and never worsens the start point; bad group names are
    rejected."""
    import dataclasses

    scene = _scene(default_galaxy(), 12)
    scene.config = dataclasses.replace(scene.config, noise_octaves=1)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    g = scene.instances[0].galaxy
    g2 = dataclasses.replace(
        g, params=dataclasses.replace(g.params, winding_b=g.params.winding_b * 1.2))
    start = dataclasses.replace(
        scene, instances=[gamer_tpu.GalaxyInstance(galaxy=g2)])
    res = gfit.fit_scene_fd(start, target, ("winding_b",), steps=1,
                            lr=1e-2, sweep=5, sweep_rounds=2,
                            sweep_groups=(("winding_b",),))
    assert min(res.losses) <= res.losses[0]
    with pytest.raises(ValueError, match="matches no probe dims"):
        gfit.fit_scene_fd(start, target, ("winding_b",), steps=1,
                          sweep=5, sweep_groups=(("scale",),))


def test_fit_scene_fd_checkpoint_resume(tmp_path):
    """Interrupted-at-step-2 + resume replays the uninterrupted 4-step
    trajectory exactly (host Adam moments live in the checkpoint)."""
    import dataclasses

    scene = _scene(default_galaxy(), 12)
    scene.config = dataclasses.replace(scene.config, noise_octaves=2)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    g2 = dataclasses.replace(
        scene.instances[0].galaxy,
        components=[dataclasses.replace(c, strength=c.strength * 1.4)
                    for c in scene.instances[0].galaxy.components])
    start = dataclasses.replace(
        scene, instances=[gamer_tpu.GalaxyInstance(galaxy=g2)])
    kw = dict(fit_fields=("strength",), lr=2e-2)
    straight = gfit.fit_scene_fd(start, target, steps=4, **kw)
    ckpt = str(tmp_path / "scenefd.ckpt")
    gfit.fit_scene_fd(start, target, steps=2, checkpoint_path=ckpt,
                      checkpoint_every=1, **kw)
    resumed = gfit.fit_scene_fd(start, target, steps=4,
                                checkpoint_path=ckpt,
                                checkpoint_every=1, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.losses),
                                  np.asarray(straight.losses))
    for a, b in zip(jax.tree_util.tree_leaves(resumed.params),
                    jax.tree_util.tree_leaves(straight.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fit_joint_multiview_wiring():
    """fit_joint_multiview: per-view fit_pose_fd blocks + a shared
    fit_scene_multiview block compose; cameras move, losses are finite,
    the fitted scene carries the shared parameters. (Convergence numbers
    are the hardware bench — scripts/fit_joint_multiview_bench.py.)"""
    import dataclasses

    g = default_galaxy()
    scene = _scene(g, 12)
    scene.config = dataclasses.replace(scene.config, noise_octaves=2)
    from gamer_tpu.engine.render import render_scene

    true_cams = [
        gamer_tpu.CameraParams(camera=c, target=(0, 0, 0), up=(0, 1, 0),
                               fov=90.0)
        for c in ((0.5, 0, 0), (0, 0.1, 0.49))
    ]
    targets = np.stack([
        render_scene(dataclasses.replace(scene, camera=c))
        for c in true_cams])
    start_cams = [dataclasses.replace(
        c, camera=(c.camera[0] + 0.02, c.camera[1], c.camera[2] - 0.01))
        for c in true_cams]
    g2 = dataclasses.replace(
        g, components=[dataclasses.replace(c, strength=c.strength * 1.5)
                       for c in g.components])
    start = dataclasses.replace(
        scene, instances=[gamer_tpu.GalaxyInstance(galaxy=g2)])

    res = gfit.fit_joint_multiview(start, targets, start_cams,
                                   ("strength",), rounds=1, pose_steps=2,
                                   scene_steps=2)
    assert len(res.cameras) == 2
    assert np.isfinite(res.losses).all() and len(res.losses) > 0
    for fc, sc in zip(res.cameras, start_cams):
        assert tuple(fc.camera) != tuple(sc.camera), "pose block did not move"
    assert res.params["scene"] is not None
    with pytest.raises(ValueError, match="targets for"):
        gfit.fit_joint_multiview(start, targets[:1], start_cams, rounds=1)


def test_fit_scene_fd_bounded_probe_spread():
    """A value sitting ON a _FIT_BOUNDS bound still yields a usable
    one-sided probe (the FD denominator is the realized spread) and the
    update never crosses the bound."""
    import dataclasses

    scene = _scene(default_galaxy(), 12)
    scene.config = dataclasses.replace(scene.config, noise_octaves=1)
    g = scene.instances[0].galaxy
    g2 = dataclasses.replace(
        g, components=[dataclasses.replace(c, r0=gfit._FIT_BOUNDS["r0"])
                       for c in g.components])
    start = dataclasses.replace(
        scene, instances=[gamer_tpu.GalaxyInstance(galaxy=g2)])
    from gamer_tpu.engine.render import render_scene

    res = gfit.fit_scene_fd(start, render_scene(scene), ("r0",), steps=2,
                            lr=5e-2)
    for cp in res.scene.instances[0].galaxy.components:
        # the write-back is float32; compare against the f32 bound
        assert cp.r0 >= float(np.float32(gfit._FIT_BOUNDS["r0"]))


def _ss_scene(size=12, ss=2):
    import dataclasses

    scene = _scene(default_galaxy(), size)
    return dataclasses.replace(
        scene, config=dataclasses.replace(scene.config, supersample=ss))


def test_fit_forward_matches_supersampled_render():
    """The diff forward model honors config.supersample (ss² rays/pixel,
    linear-space box average — render_frame_ss semantics): at the true
    parameters, the loss against the scene's own AA render sits at the
    uint8 quantization floor, not at an AA-mismatch plateau."""
    from gamer_tpu.engine.render import render_scene

    scene = _ss_scene()
    target = render_scene(scene)
    res = gfit.fit_scene(scene, target, fit_fields=("strength",),
                         steps=0, march="scan")
    # truncation to uint8 bounds the per-channel error by 1/255:
    # MSE <= mean of U[0,1)^2 / 255^2 ~ 5.1e-6
    assert res.losses[0] < 1e-5


def test_fit_scene_supersample_recovers():
    """Fitting a supersampled scene against its AA target converges just
    like the 1-ray/pixel path does."""
    from gamer_tpu.engine.render import render_scene

    scene = _ss_scene()
    target = render_scene(scene)
    start = _ss_scene()
    start.instances[0].galaxy.components[1].strength *= 0.5
    res = gfit.fit_scene(start, target, fit_fields=("strength",),
                         steps=12, lr=5e-2)
    assert res.losses[-1] < 0.2 * res.losses[0]
    truth = scene.instances[0].galaxy.components[1].strength
    fitted = res.scene.instances[0].galaxy.components[1].strength
    start_v = start.instances[0].galaxy.components[1].strength
    assert abs(fitted - truth) < abs(start_v - truth)


def test_fit_pose_supersample_floor():
    """fit_pose's in-graph forward supersamples too: at the true pose the
    normalized loss against the AA target is at the quantization floor."""
    from gamer_tpu.engine.render import render_scene

    scene = _ss_scene()
    target = render_scene(scene)
    res = gfit.fit_pose(scene, target, ("camera",), steps=0,
                        normalize=False)
    assert res.losses[0] < 1e-5


def test_fit_warns_winding_fields_on_tensor_march():
    """Winding-family gradients legitimately diverge under the tensor
    march's reassociation (chaotic sensitivity) — fitting them with the
    default backend must warn and steer to march='scan'."""
    scene = _scene(default_galaxy(), 16)
    tgt = np.zeros((16, 16, 3), np.uint8)
    with pytest.warns(RuntimeWarning, match="march='scan'"):
        gfit.fit_scene(scene, tgt, fit_fields=("winding_b",), steps=1)
    # scan backend: no winding warning
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        gfit.fit_scene(scene, tgt, fit_fields=("winding_b",), steps=1,
                       march="scan")
    assert not [w for w in rec if "winding" in str(w.message)]


@pytest.mark.slow
def test_pose_multiscale_ladder(fixtures_dir):
    """fit_pose_multiscale: one call runs the LOD->exact ladder and beats
    the starting pose on a FULL-quality target (the round-1 PARITY workflow
    automated, VERDICT next #7)."""
    g = gax.load(fixtures_dir / "Spiral.gax")

    def pose_scene(cam):
        s = _scene(g, 16)
        s.camera = gamer_tpu.CameraParams(camera=cam, target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0)
        return s

    from gamer_tpu.engine.render import render_scene

    target = render_scene(pose_scene((0.5, 0, 0)))  # exact octaves
    start_cam = (0.54, 0.02, -0.02)
    seen = []
    res = gfit.fit_pose_multiscale(
        pose_scene(start_cam), target, ("camera",), steps=12, lr=1e-2,
        schedule=((3, 4), (5, 2), (0, 1)),
        on_step=lambda i, loss: seen.append(i))
    truth = np.array((0.5, 0.0, 0.0))
    err0 = float(np.linalg.norm(np.array(start_cam) - truth))
    err1 = float(np.linalg.norm(np.array(res.scene.camera.camera) - truth))
    assert err1 < 0.7 * err0, f"position error {err0:.4f} -> {err1:.4f}"
    # global step indices span all rungs; scene keeps the caller's octaves
    assert seen == list(range(36))
    assert res.scene.config.noise_octaves == pose_scene(start_cam).config.noise_octaves
    assert len(res.losses) == 3 * (12 + 1)  # per-rung final-iterate extras


def test_fit_scene_mesh_matches_single_device():
    """fit_scene(mesh=...) — the training step with pixel rows sharded over
    the device mesh (dp over pixels) — descends the same objective as the
    single-device fit: per-step losses agree to fp-reassociation tolerance
    (the sharded mean + grad all-reduce reassociate the reductions)."""
    from gamer_tpu.parallel import make_pixel_mesh

    truth = default_galaxy()
    scene_truth = _scene(truth, 16)
    static, params, camera, inv_vp, rs, ms = _render_args(scene_truth)
    bound = gdiff.step_bound_for_scene(scene_truth)
    target, _ = gdiff.render_frame_diff_jit(
        static, 16, bound, params, camera, inv_vp, rs, ms,
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
    )

    start = default_galaxy()
    start.components[1].strength *= 0.5

    kw = dict(fit_fields=("strength",), steps=4, lr=5e-2)
    res_single = gfit.fit_scene(_scene(start, 16), np.asarray(target), **kw)
    mesh = make_pixel_mesh()
    assert mesh.devices.size > 1, "conftest should provide 8 virtual devices"
    res_mesh = gfit.fit_scene(_scene(start, 16), np.asarray(target),
                              mesh=mesh, **kw)
    np.testing.assert_allclose(res_mesh.losses, res_single.losses,
                               rtol=2e-3, atol=1e-7)
    # and the fitted values agree too
    f_single = res_single.scene.instances[0].galaxy.components[1].strength
    f_mesh = res_mesh.scene.instances[0].galaxy.components[1].strength
    np.testing.assert_allclose(f_mesh, f_single, rtol=2e-3)


def test_fit_pose_mesh_runs_and_matches():
    """fit_pose(mesh=...): the pose training step shards its in-graph ray
    grid via a sharding constraint; losses track the single-device fit."""
    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.parallel import make_pixel_mesh

    g = default_galaxy()

    def pose_scene(cam):
        s = _scene(g, 16)
        s.camera = gamer_tpu.CameraParams(camera=cam, target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0)
        s.config.noise_octaves = 3
        return s

    target = render_scene(pose_scene((0.5, 0, 0)))
    kw = dict(fit_fields=("camera",), steps=3, lr=1e-2, pool=2)
    res_single = gfit.fit_pose(pose_scene((0.53, 0.01, 0.0)), target, **kw)
    res_mesh = gfit.fit_pose(pose_scene((0.53, 0.01, 0.0)), target,
                             mesh=make_pixel_mesh(), **kw)
    assert np.isfinite(res_mesh.losses).all()
    np.testing.assert_allclose(res_mesh.losses, res_single.losses,
                               rtol=5e-3, atol=1e-7)


def test_fit_mesh_rejects_indivisible_rows():
    from gamer_tpu.parallel import make_pixel_mesh

    scene = _scene(default_galaxy(), 20)  # 20 rows, 8 devices
    tgt = np.zeros((20, 20, 3), np.uint8)
    with pytest.raises(ValueError, match="divide the mesh"):
        gfit.fit_scene(scene, tgt, steps=1, mesh=make_pixel_mesh())


def test_fit_checkpoint_resume_exact(tmp_path):
    """An interrupted fit resumed from its checkpoint replays the exact
    trajectory of an uninterrupted run (params + optimizer state + the
    relative-step scales all restore bitwise)."""
    truth = default_galaxy()
    scene_truth = _scene(truth, 12)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene_truth)

    start = default_galaxy()
    start.components[1].strength *= 0.5
    scene_start = _scene(start, 12)
    kw = dict(fit_fields=("strength",), lr=5e-2)

    straight = gfit.fit_scene(scene_start, target, steps=5, **kw)

    ckpt = str(tmp_path / "fit.ckpt")
    gfit.fit_scene(scene_start, target, steps=2, checkpoint_path=ckpt,
                   checkpoint_every=1, **kw)  # "interrupted" after 2 steps
    resumed = gfit.fit_scene(scene_start, target, steps=5,
                             checkpoint_path=ckpt, checkpoint_every=1, **kw)

    np.testing.assert_array_equal(np.asarray(resumed.losses),
                                  np.asarray(straight.losses))
    np.testing.assert_array_equal(
        resumed.params[0]["comps"][1]["strength"],
        straight.params[0]["comps"][1]["strength"])


def test_fit_checkpoint_rejects_mismatched_setup(tmp_path):
    scene = _scene(default_galaxy(), 12)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    ckpt = str(tmp_path / "fit.ckpt")
    gfit.fit_scene(scene, target, fit_fields=("strength",), steps=1,
                   lr=5e-2, checkpoint_path=ckpt, checkpoint_every=1)
    with pytest.raises(ValueError, match="different fit"):
        gfit.fit_scene(scene, target, fit_fields=("strength", "r0"),
                       steps=1, lr=5e-2, checkpoint_path=ckpt)
    with pytest.raises(ValueError, match="different fit"):
        gfit.fit_scene(scene, target, fit_fields=("strength",),
                       steps=1, lr=1e-2, checkpoint_path=ckpt)
    # a changed CAMERA is a different loss surface too (the fingerprint
    # covers every numeric input, not just the fitted leaves)
    import dataclasses

    moved = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, camera=(0.6, 0, 0)))
    with pytest.raises(ValueError, match="different fit"):
        gfit.fit_scene(moved, target, fit_fields=("strength",),
                       steps=1, lr=5e-2, checkpoint_path=ckpt)
    # shrinking steps below the checkpoint is an error, not a silent
    # return of the longer run
    with pytest.raises(ValueError, match="already holds"):
        gfit.fit_scene(scene, target, fit_fields=("strength",),
                       steps=0, lr=5e-2, checkpoint_path=ckpt)


def test_fit_pose_checkpoint_resume(tmp_path):
    scene = _scene(default_galaxy(), 12)
    scene.config = gamer_tpu.RenderConfig(size=12, ray_step=0.025,
                                          is_preview=True, noise_octaves=2)
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    import dataclasses

    start = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera,
                                          camera=(0.52, 0.01, 0.0)))
    kw = dict(fit_fields=("camera",), lr=1e-2)
    straight = gfit.fit_pose(start, target, steps=4, **kw)
    ckpt = str(tmp_path / "pose.ckpt")
    gfit.fit_pose(start, target, steps=2, checkpoint_path=ckpt,
                  checkpoint_every=1, **kw)
    resumed = gfit.fit_pose(start, target, steps=4, checkpoint_path=ckpt,
                            checkpoint_every=1, **kw)
    np.testing.assert_array_equal(np.asarray(resumed.losses),
                                  np.asarray(straight.losses))
    np.testing.assert_array_equal(resumed.params["camera"],
                                  straight.params["camera"])


# ---------------------------------------------------------------------------
# fit_scene_batch: K independent fits as one vmapped optimization
# ---------------------------------------------------------------------------


def _batch_setup(size=12, k_strengths=(3.0, 6.0)):
    """K truths differing in disk strength, their rendered targets, and a
    common perturbed starting template."""
    from gamer_tpu.engine.render import render_scene

    truths, targets = [], []
    for s in k_strengths:
        g = default_galaxy()
        g.components[1].strength = g.components[1].strength * s / 4.0
        sc = _scene(g, size)
        truths.append(sc)
        targets.append(render_scene(sc))
    start = default_galaxy()
    start.components[1].strength *= 0.5
    return truths, np.stack(targets), _scene(start, size)


def test_fit_scene_batch_matches_individual_fits():
    """Each scene in the batch follows (to fp/Adam-epsilon tolerance) the
    trajectory its own fit_scene run would produce: the vmapped mean-loss
    formulation is K independent fits in one program."""
    truths, targets, template = _batch_setup()
    kw = dict(fit_fields=("strength",), steps=6, lr=5e-2)

    batch = gfit.fit_scene_batch(template, targets, **kw)
    assert batch.losses.shape == (7, 2)  # steps + final-iterate row

    for k in range(2):
        single = gfit.fit_scene(template, targets[k], **kw)
        np.testing.assert_allclose(batch.losses[:, k], single.losses,
                                   rtol=5e-3, atol=1e-8)
        f_b = batch.scenes[k].instances[0].galaxy.components[1].strength
        f_s = single.scene.instances[0].galaxy.components[1].strength
        np.testing.assert_allclose(f_b, f_s, rtol=5e-3)
    # the two fits genuinely diverged toward their own targets
    s0 = batch.scenes[0].instances[0].galaxy.components[1].strength
    s1 = batch.scenes[1].instances[0].galaxy.components[1].strength
    assert s1 > s0


def test_fit_scene_batch_per_scene_initials_and_validation():
    truths, targets, template = _batch_setup()
    # per-scene initial values: a list of scenes sharing one structure
    import copy

    starts = [copy.deepcopy(template), copy.deepcopy(template)]
    starts[1].instances[0].galaxy.components[1].strength *= 1.5
    res = gfit.fit_scene_batch(starts, targets, fit_fields=("strength",),
                               steps=4, lr=5e-2)
    assert len(res.scenes) == 2
    assert (res.losses[-1] < res.losses[0]).all()

    with pytest.raises(ValueError, match=r"\(K, N, N, 3\)"):
        gfit.fit_scene_batch(template, targets[0], steps=1)
    with pytest.raises(ValueError, match="scenes but"):
        gfit.fit_scene_batch(starts[:1], targets, steps=1)

    import dataclasses

    moved = dataclasses.replace(
        copy.deepcopy(template),
        camera=dataclasses.replace(template.camera, camera=(0.6, 0, 0)))
    with pytest.raises(ValueError, match="different camera"):
        gfit.fit_scene_batch([template, moved], targets, steps=1)

    other = copy.deepcopy(template)
    other.instances[0].galaxy.components[1].active = 0
    with pytest.raises(ValueError, match="different compiled structure"):
        gfit.fit_scene_batch([template, other], targets, steps=1)


def test_fit_scene_batch_mesh_matches_single_device():
    """mesh= shards the BATCH axis (scene-level data parallelism): the
    sharded run reproduces the unsharded per-scene trajectories."""
    from gamer_tpu.parallel import make_pixel_mesh

    truths, targets2, template = _batch_setup()
    targets = np.concatenate([targets2] * 4)  # K=8 over 8 devices
    kw = dict(fit_fields=("strength",), steps=3, lr=5e-2)
    res_plain = gfit.fit_scene_batch(template, targets, **kw)
    mesh = make_pixel_mesh()
    res_mesh = gfit.fit_scene_batch(template, targets, mesh=mesh, **kw)
    np.testing.assert_allclose(res_mesh.losses, res_plain.losses,
                               rtol=2e-3, atol=1e-8)

    with pytest.raises(ValueError, match="divide the mesh"):
        gfit.fit_scene_batch(template, targets[:6], mesh=mesh, **kw)


def test_fit_scene_batch_checkpoint_resume(tmp_path):
    truths, targets, template = _batch_setup()
    kw = dict(fit_fields=("strength",), lr=5e-2)
    straight = gfit.fit_scene_batch(template, targets, steps=4, **kw)
    ckpt = str(tmp_path / "batch.ckpt")
    gfit.fit_scene_batch(template, targets, steps=2, checkpoint_path=ckpt,
                         checkpoint_every=1, **kw)
    resumed = gfit.fit_scene_batch(template, targets, steps=4,
                                   checkpoint_path=ckpt, checkpoint_every=1,
                                   **kw)
    np.testing.assert_array_equal(resumed.losses, straight.losses)
    np.testing.assert_array_equal(
        resumed.params[0]["comps"][1]["strength"],
        straight.params[0]["comps"][1]["strength"])


# ---------------------------------------------------------------------------
# cooperative abort (serve.py DELETE /job semantics) + batch bound/validation
# ---------------------------------------------------------------------------


def test_fit_cooperative_abort():
    """on_step returning False stops the loop after the current step and
    still returns the best-so-far fit."""
    from gamer_tpu.engine.render import render_scene

    scene = _scene(default_galaxy(), 12)
    target = render_scene(scene)
    start = _scene(default_galaxy(), 12)
    start.instances[0].galaxy.components[1].strength *= 0.5
    seen = []

    def on_step(i, loss):
        seen.append(i)
        return i < 2  # False at i == 2 -> stop after 3 steps

    res = gfit.fit_scene(start, target, fit_fields=("strength",),
                         steps=50, lr=5e-2, on_step=on_step)
    assert seen == [0, 1, 2]
    assert len(res.losses) == 4  # 3 loop entries + the final-iterate eval
    assert res.scene.instances[0].galaxy.components[1].strength > 0


def test_fit_multiscale_abort_stops_ladder():
    """An abort inside a rung also stops the multiscale ladder (no later
    rung starts)."""
    from gamer_tpu.engine.render import render_scene

    scene = _scene(default_galaxy(), 12)
    target = render_scene(scene)
    start = _scene(default_galaxy(), 12)
    start.instances[0].galaxy.components[1].strength *= 0.5

    res = gfit.fit_scene_multiscale(
        start, target, fit_fields=("strength",), steps=6, lr=5e-2,
        schedule=(2, 1), on_step=lambda i, loss: i < 1)
    # rung 0 ran 2 loop steps + its final eval; rung 1 never started
    assert len(res.losses) == 3
    assert res.scene.config.size == 12  # caller's size restored


@pytest.mark.slow
def test_fit_joint_recovers_pose_and_params(fixtures_dir):
    """fit_joint: UNKNOWN camera AND unknown strength — the alternating
    pose-ladder / parameter-block descent recovers both (VERDICT r2 #6's
    workflow at test scale).

    Uses the FULL default pose ladder ((3,4),(5,2),(0,1)) — the same
    schedule test_pose_multiscale_ladder gates. A weakened single-rung
    (3,2) schedule used to pass here but sat below the information floor
    of a 16² frame: an XLA:CPU codegen change on the CI box (fp
    contraction shifts under the AOT machine-feature mismatch) moved the
    chaotic trajectory out of its basin and the pose DIVERGED
    (0.049 → 0.061, identically at the r3/r4/r5 snapshots). The r5
    re-tune (pose_steps=16, full ladder) recovers pos 0.15×/strength
    0.017 — margins of 4×/28× against the asserted bars, so codegen
    jitter can't flip the verdict again. Measured recovery quality for
    the production path lives in the hardware benches
    (scripts/fit_joint_bench.py, fit_joint_multiview_bench.py)."""
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    truth_cam = (0.5, 0.0, 0.0)
    truth_strength = g.components[1].strength

    target = render_scene(_scene(g, 16))
    start = _scene(g, 16)
    start_cam = (0.54, 0.02, -0.02)
    start.camera = gamer_tpu.CameraParams(camera=start_cam, target=(0, 0, 0),
                                          up=(0, 1, 0), fov=90.0)
    start.instances[0].galaxy.components[1].strength = truth_strength * 1.8

    res = gfit.fit_joint(start, target, ("strength",), rounds=2,
                         pose_steps=16, scene_steps=30, march="frozen")
    assert set(res.params) == {"pose", "scene"}
    assert res.fit_fields == ("camera", "strength")
    err0 = float(np.linalg.norm(np.array(start_cam) - np.array(truth_cam)))
    err1 = float(np.linalg.norm(
        np.array(res.scene.camera.camera) - np.array(truth_cam)))
    assert err1 < 0.6 * err0, f"position error {err0:.4f} -> {err1:.4f}"
    s_fit = res.scene.instances[0].galaxy.components[1].strength
    rel0 = abs(1.8 - 1.0)
    rel1 = abs(s_fit / truth_strength - 1.0)
    assert rel1 < 0.6 * rel0, f"strength error {rel0:.3f} -> {rel1:.3f}"
    assert min(res.losses) < res.losses[0]


def test_fit_joint_pose_method_fd(fixtures_dir):
    """fit_joint(pose_method='fd'): each pose block is one fit_pose_fd
    run (full quality, production kernel) instead of the LOD ladder;
    mechanics + validation (the recovery-quality gate is the multiscale
    test above — fd shares fit_pose_fd's own convergence tests)."""
    from gamer_tpu.engine.render import render_scene

    g = gax.load(fixtures_dir / "Spiral.gax")
    target = render_scene(_scene(g, 12))
    start = _scene(g, 12)
    start.camera = gamer_tpu.CameraParams(camera=(0.52, 0.01, -0.01),
                                          target=(0, 0, 0), up=(0, 1, 0),
                                          fov=90.0)
    start.instances[0].galaxy.components[1].strength *= 1.5

    res = gfit.fit_joint(start, target, ("strength",), rounds=1,
                         pose_steps=2, scene_steps=2, pose_method="fd",
                         march="frozen")
    assert set(res.params) == {"pose", "scene"}
    assert res.fit_fields == ("camera", "strength")
    # pose block (2 steps + final) + scene block losses all in the trace
    assert len(res.losses) >= 5
    with pytest.raises(ValueError, match="pose_method"):
        gfit.fit_joint(start, target, ("strength",), rounds=1,
                       pose_method="ladder")


def test_fit_joint_validation_and_abort():
    """rounds must be >= 1; a False from on_step stops the whole
    alternation (no later block starts)."""
    from gamer_tpu.engine.render import render_scene

    scene = _scene(default_galaxy(), 12)
    target = render_scene(scene)
    with pytest.raises(ValueError, match="rounds"):
        gfit.fit_joint(scene, target, ("strength",), rounds=0)

    seen = []

    def on_step(i, loss):
        seen.append(i)
        return i < 1  # stop inside the first pose block

    res = gfit.fit_joint(scene, target, ("strength",), rounds=2,
                         pose_steps=3, scene_steps=3,
                         pose_schedule=((3, 2),), march="tensor",
                         on_step=on_step)
    assert seen[:2] == [0, 1]
    # the first pose rung ran <= 2 loop steps (+ its final eval); neither
    # the scene block nor round 2 started
    assert len(res.losses) <= 4
    assert res.params["scene"] is None


def test_fit_scene_batch_rejects_mismatched_config():
    import copy
    import dataclasses

    truths, targets, template = _batch_setup()
    bright = copy.deepcopy(template)
    bright.config = dataclasses.replace(bright.config, exposure=2.0)
    with pytest.raises(ValueError, match="config.exposure"):
        gfit.fit_scene_batch([template, bright], targets, steps=1)
    coarse = copy.deepcopy(template)
    coarse.config = dataclasses.replace(coarse.config, ray_step=0.05)
    with pytest.raises(ValueError, match="config.ray_step"):
        gfit.fit_scene_batch([template, coarse], targets, steps=1)


def test_fit_scene_batch_bound_covers_largest_scene():
    """The static trip bound derives from EVERY scene's geometry: a batch
    member whose axes exceed the template's marches untruncated, so its
    loss trace matches its own standalone fit_scene run."""
    import copy

    from gamer_tpu.engine.render import render_scene

    truths, targets, template = _batch_setup()
    big = copy.deepcopy(template)
    gp = big.instances[0].galaxy.params
    gp.axis = tuple(3.0 * a for a in gp.axis)
    targets = np.stack([targets[0], render_scene(truths[1])])
    kw = dict(fit_fields=("strength",), steps=3, lr=5e-2)
    batch = gfit.fit_scene_batch([template, big], targets, **kw)
    single = gfit.fit_scene(big, targets[1], **kw)
    np.testing.assert_allclose(batch.losses[:, 1], single.losses,
                               rtol=5e-3, atol=1e-8)


def test_fit_scene_batch_checkpoint_resume_on_mesh(tmp_path):
    """Resume restores each leaf onto the LIVE sharding: a checkpointed
    mesh run replays the uninterrupted mesh trajectory exactly."""
    from gamer_tpu.parallel import make_pixel_mesh

    truths, targets2, template = _batch_setup()
    targets = np.concatenate([targets2] * 4)  # K=8 over 8 devices
    mesh = make_pixel_mesh()
    kw = dict(fit_fields=("strength",), lr=5e-2, mesh=mesh)
    straight = gfit.fit_scene_batch(template, targets, steps=4, **kw)
    ckpt = str(tmp_path / "bm.ckpt")
    gfit.fit_scene_batch(template, targets, steps=2, checkpoint_path=ckpt,
                         checkpoint_every=1, **kw)
    resumed = gfit.fit_scene_batch(template, targets, steps=4,
                                   checkpoint_path=ckpt, checkpoint_every=1,
                                   **kw)
    np.testing.assert_array_equal(resumed.losses, straight.losses)


# ---------------------------------------------------------------------------
# multi-view fitting (fit_scene_multiview)
# ---------------------------------------------------------------------------


def _mview_setup(size=12, n_views=2):
    """A truth scene, K orbit views of it, and their rendered targets."""
    import dataclasses

    from gamer_tpu.engine.render import render_scene
    from gamer_tpu.scene.cameracontrols import orbit_path

    truth = _scene(default_galaxy(), size)
    cams = orbit_path(truth.camera, n_views, 90.0 * (n_views - 1) / n_views
                      if n_views > 1 else 0.0)
    targets = np.stack([
        render_scene(dataclasses.replace(truth, camera=c)) for c in cams])
    return truth, cams, targets


def test_fit_multiview_floor_and_converges():
    """At the true parameters the multi-view loss sits at the uint8
    quantization floor; from a perturbed start it converges back."""
    truth, cams, targets = _mview_setup()
    res0 = gfit.fit_scene_multiview(truth, targets, cams,
                                    fit_fields=("strength",), steps=0)
    assert res0.losses[0] < 1e-5

    start = _scene(default_galaxy(), 12)
    start.instances[0].galaxy.components[1].strength *= 0.5
    res = gfit.fit_scene_multiview(start, targets, cams,
                                   fit_fields=("strength",), steps=12,
                                   lr=5e-2)
    assert res.losses[-1] < 0.2 * res.losses[0]
    t = truth.instances[0].galaxy.components[1].strength
    s = start.instances[0].galaxy.components[1].strength
    fitted = res.scene.instances[0].galaxy.components[1].strength
    assert abs(fitted - t) < abs(s - t)


def test_fit_multiview_validation():
    truth, cams, targets = _mview_setup()
    with pytest.raises(ValueError, match="cameras"):
        gfit.fit_scene_multiview(truth, targets, cams[:1], steps=1)
    with pytest.raises(ValueError, match="targets"):
        gfit.fit_scene_multiview(truth, targets[0], cams, steps=1)


def test_fit_multiview_mesh_matches_single_device():
    """View-axis sharding over the mesh replays the single-device
    trajectory (params replicated, grads all-reduced by GSPMD)."""
    from gamer_tpu.parallel import make_pixel_mesh

    truth, cams, targets = _mview_setup(n_views=8)
    start = _scene(default_galaxy(), 12)
    start.instances[0].galaxy.components[1].strength *= 0.5
    kw = dict(fit_fields=("strength",), steps=3, lr=5e-2)
    plain = gfit.fit_scene_multiview(start, targets, cams, **kw)
    mesh = make_pixel_mesh()
    sharded = gfit.fit_scene_multiview(start, targets, cams, mesh=mesh, **kw)
    np.testing.assert_allclose(sharded.losses, plain.losses,
                               rtol=5e-5, atol=1e-9)
    with pytest.raises(ValueError, match="views must divide"):
        gfit.fit_scene_multiview(start, targets[:6], cams[:6], mesh=mesh,
                                 steps=1)


# ---------------------------------------------------------------------------
# frozen-noise march in the batch and multi-view fits
# ---------------------------------------------------------------------------


def test_fit_scene_batch_frozen_matches_tensor_start():
    """march='frozen' in the batch fit: the per-scene frozen precompute
    (vmapped over the K initial parameter stacks) makes step 0 bitwise
    equal to the tensor march, and the fit still converges."""
    truths, targets, template = _batch_setup()
    import copy

    starts = [copy.deepcopy(template), copy.deepcopy(template)]
    starts[1].instances[0].galaxy.components[1].strength *= 1.5
    kw = dict(fit_fields=("strength",), steps=6, lr=5e-2)
    tens = gfit.fit_scene_batch(starts, targets, march="tensor", **kw)
    froz = gfit.fit_scene_batch(starts, targets, march="frozen", **kw)
    # frozen forward == tensor forward at the precompute parameters, up to
    # the last ulp: the vmapped separate-jit precompute fuses differently
    # than the inline-noise tensor graph on CPU (the single-fit path IS
    # bitwise — test_frozen_forward_bitwise_matches_tensor)
    np.testing.assert_allclose(froz.losses[0], tens.losses[0],
                               rtol=1e-5, atol=1e-9)
    for k in range(2):
        assert min(froz.losses[:, k]) < froz.losses[0, k] * 0.6, (
            k, froz.losses[:, k])
    # fitting a noise-input field is rejected up front
    with pytest.raises(ValueError, match="frozen"):
        gfit.fit_scene_batch(starts, targets, fit_fields=("scale",),
                             steps=1, march="frozen")


def test_fit_scene_batch_frozen_single_template_broadcast():
    """scene_list=None with march='frozen': ONE precompute serves every
    scene (broadcast over the vmapped loss — ADVICE r2: no K x field
    memory), and the trajectory matches K explicit template copies."""
    import copy

    truths, targets, template = _batch_setup()
    kw = dict(fit_fields=("strength",), steps=3, lr=5e-2, march="frozen")
    bcast = gfit.fit_scene_batch(template, targets, **kw)
    expl = gfit.fit_scene_batch(
        [copy.deepcopy(template), copy.deepcopy(template)], targets, **kw)
    np.testing.assert_allclose(bcast.losses, expl.losses,
                               rtol=1e-5, atol=1e-9)


def test_fit_multiview_frozen_matches_tensor_start():
    """march='frozen' in the multi-view fit: per-view frozen fields
    (vmapped over the K ray grids / camera origins) reproduce the tensor
    march at step 0 and converge from a perturbed start."""
    truth, cams, targets = _mview_setup()
    start = _scene(default_galaxy(), 12)
    start.instances[0].galaxy.components[1].strength *= 0.5
    kw = dict(fit_fields=("strength",), steps=8, lr=5e-2)
    tens = gfit.fit_scene_multiview(start, targets, cams, march="tensor",
                                    **kw)
    froz = gfit.fit_scene_multiview(start, targets, cams, march="frozen",
                                    **kw)
    # last-ulp tolerance: see test_fit_scene_batch_frozen_matches_tensor_start
    np.testing.assert_allclose(froz.losses[0], tens.losses[0],
                               rtol=1e-5, atol=1e-9)
    assert froz.losses[-1] < 0.5 * froz.losses[0]
    with pytest.raises(ValueError, match="frozen"):
        gfit.fit_scene_multiview(start, targets, cams,
                                 fit_fields=("winding",), steps=1,
                                 march="frozen")
