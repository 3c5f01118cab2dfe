"""Tensorized march (engine/tensor_march) vs the scan path (engine/diff).

The tensor path reassociates the march arithmetic (suffix-cumsum
composition, incremental camera distance), so agreement is
fp-tolerance, not bit-exact: forward linear radiance to ~1e-3 relative
(threshold-flip outliers allowed at low density), gradients on the
default fit fields to a few percent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gamer_tpu
from gamer_tpu.engine.diff import render_rays_diff, step_bound_for_scene
from gamer_tpu.engine.scene_prep import flatten_scene
from gamer_tpu.engine.tensor_march import render_rays_tensor
from gamer_tpu.ops import camera as cam_ops
from gamer_tpu.scene import gax


def _setup(fixtures_dir, fixture="Spiral", size=20, dither=False):
    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=gax.load(fixtures_dir / f"{fixture}.gax"))],
        config=gamer_tpu.RenderConfig(size=size, ray_step=0.025,
                                      is_preview=True, dither=dither),
    )
    static, params = flatten_scene(scene)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    camera = jnp.asarray(scene.camera.camera, jnp.float32)
    inv_vp = jnp.asarray(cam_ops.inv_view_projection_host(
        np.asarray(scene.camera.camera, np.float32), scene.camera.target,
        scene.camera.up, scene.camera.fov))
    dirs = cam_ops.ray_grid(size, inv_vp)
    bound = step_bound_for_scene(scene)
    return static, params, camera, dirs, bound


@pytest.mark.parametrize("fixture", ["Spiral", "Sombrero"])
def test_tensor_forward_matches_scan(fixtures_dir, fixture):
    static, params, camera, dirs, bound = _setup(fixtures_dir, fixture)
    f = jnp.float32
    lin_s = np.asarray(render_rays_diff(
        static, params, dirs, camera, f(0.025), f(0.01), bound))
    lin_t = np.asarray(render_rays_tensor(
        static, params, dirs, camera, f(0.025), f(0.01), bound))
    scale = np.abs(lin_s).max() + 1e-9
    rel = np.abs(lin_s - lin_t) / scale
    assert np.median(rel) < 3e-4, f"median rel {np.median(rel)}"
    # threshold-flip outliers are discrete and rare
    assert (rel > 1e-2).mean() < 0.01, f"outlier fraction {(rel > 1e-2).mean()}"
    # chunked suffix composition reassociates across chunk boundaries;
    # ~0.4% L2 is sub-LSB at uint8 (post multiplies by 10, clamps at 255)
    assert np.linalg.norm(lin_s - lin_t) / np.linalg.norm(lin_s) < 6e-3


def test_tensor_forward_with_dither(fixtures_dir):
    static, params, camera, dirs, bound = _setup(
        fixtures_dir, "Sombrero", dither=True)
    f = jnp.float32
    lin_s = np.asarray(render_rays_diff(
        static, params, dirs, camera, f(0.025), f(0.01), bound))
    lin_t = np.asarray(render_rays_tensor(
        static, params, dirs, camera, f(0.025), f(0.01), bound))
    assert np.linalg.norm(lin_s - lin_t) / np.linalg.norm(lin_s) < 6e-3


def _grad_compare(fixtures_dir):
    """Reverse-mode gradients of the default fit fields (strength, r0, z0)
    and the camera pose agree between the two differentiable paths. The
    winding-driven leaves are excluded: multi-octave noise makes the true
    derivative there near-chaotic, and the two (equally valid) fp
    evaluations legitimately diverge."""
    static, params, camera, dirs, bound = _setup(fixtures_dir, "Spiral")
    f = jnp.float32

    def mkloss(fn):
        def L(p, cam):
            lin = fn(static, p, dirs, cam, f(0.025), f(0.01), bound)
            return jnp.mean(lin ** 2)
        return L

    gs_p, gs_c = jax.grad(mkloss(render_rays_diff), argnums=(0, 1))(
        params, camera)
    gt_p, gt_c = jax.grad(mkloss(render_rays_tensor), argnums=(0, 1))(
        params, camera)

    for field in ("strength", "r0", "z0"):
        for ci in range(len(static.instances[0].comps)):
            a = float(np.nan_to_num(np.asarray(gs_p[0]["comps"][ci][field])))
            b = float(np.nan_to_num(np.asarray(gt_p[0]["comps"][ci][field])))
            denom = abs(a) + abs(b)
            if denom < 1e-3:
                continue
            assert abs(a - b) / denom < 0.05, (
                f"comp {ci} {field}: scan {a} tensor {b}")

    # The camera gradient flows through the reassociated geometry (the
    # tensor path's incremental camera distance vs the scan path's per-step
    # norm), so the two valid linearizations differ more than the smooth
    # param leaves do; for optimization the DIRECTION is what matters.
    a, b = np.asarray(gs_c), np.asarray(gt_c)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.95, f"camera grad direction: scan {a} tensor {b} cos {cos}"
    ratio = np.linalg.norm(b) / (np.linalg.norm(a) + 1e-12)
    assert 0.7 < ratio < 1.4, f"camera grad magnitude ratio {ratio}"


def test_tensor_gradients_match_scan_on_fit_fields(fixtures_dir, tmp_path):
    """_grad_compare in a FRESH subprocess. Compiling BOTH differentiable
    marches' backward graphs segfaults XLA:CPU when it happens late in a
    long pytest process (reproduced twice at suite position ~150 in
    jax._src.compiler.backend_compile_and_load; passes in any fresh
    process) — so this heavyweight double-compile is isolated the same way
    the two-process distributed smoke test is."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    tests_dir = Path(__file__).resolve().parent
    worker = tmp_path / "grad_worker.py"
    worker.write_text(
        "import sys\n"
        f"sys.path.insert(0, {str(tests_dir)!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from pathlib import Path\n"
        "from test_tensor_march import _grad_compare\n"
        "_grad_compare(Path(sys.argv[1]))\n"
        "print('GRADS-OK')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(tests_dir.parent) + (
        (":" + env["PYTHONPATH"]) if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, str(worker), str(fixtures_dir)],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "GRADS-OK" in proc.stdout


def test_fit_scene_with_tensor_march(fixtures_dir):
    """fit_scene(march='tensor') recovers a perturbed strength like the
    scan path does (end-to-end through the tensorized gradients)."""
    import copy

    from gamer_tpu.engine.fit import fit_scene
    from gamer_tpu.engine.render import render_scene

    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=gax.load(fixtures_dir / "Spiral.gax"))],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025,
                                      is_preview=True, noise_octaves=3),
    )
    target = render_scene(scene)
    perturbed = copy.deepcopy(scene)
    for c in perturbed.instances[0].galaxy.components:
        c.strength *= 1.6
    res = fit_scene(perturbed, target, ("strength",), steps=25, lr=3e-2,
                    march="tensor")
    assert min(res.losses) < res.losses[0] * 0.5, res.losses[:3] + res.losses[-3:]


# ---------------------------------------------------------------------------
# Frozen-noise path (precompute_frozen / render_rays_tensor_frozen)
# ---------------------------------------------------------------------------


def test_frozen_forward_bitwise_matches_tensor(fixtures_dir):
    """With the noise fields precomputed by the same expressions the march
    uses, the frozen forward is BIT-identical to the tensor march at the
    precompute parameters (same graph, same values, only stop_gradient
    inserted)."""
    from gamer_tpu.engine.tensor_march import (
        precompute_frozen,
        render_rays_tensor_frozen,
    )

    static, params, camera, dirs, bound = _setup(fixtures_dir, "Spiral",
                                                 size=16)
    f = jnp.float32
    args = (static, params, dirs, camera, f(0.025), f(0.01), bound)
    lin_t = np.asarray(jax.jit(render_rays_tensor,
                               static_argnums=(0, 6))(*args))
    frozen = jax.jit(precompute_frozen, static_argnums=(0, 6))(*args)
    lin_f = np.asarray(jax.jit(render_rays_tensor_frozen,
                               static_argnums=(0, 6))(*args, frozen))
    np.testing.assert_array_equal(lin_t, lin_f)


def test_frozen_gradients_match_scan(fixtures_dir):
    """The frozen gradients sit CLOSER to the sequential (scan)
    linearization than the tensor march's own autodiff: stop_gradient cuts
    the noise-VJP terms, whose true value on the safe fields is zero a.e.
    (the fields enter noise only through discrete gate selections) but
    whose reassociated evaluation pollutes every leaf at the ~1% level
    (measured; the f64 finite difference of the tensor forward agrees with
    the FROZEN gradient to 8 digits, not with the tensor autodiff)."""
    from gamer_tpu.engine.tensor_march import (
        precompute_frozen,
        render_rays_tensor_frozen,
    )
    from gamer_tpu.engine.diff import render_rays_diff

    static, params, camera, dirs, bound = _setup(fixtures_dir, "Spiral",
                                                 size=12)
    f = jnp.float32
    args = (static, params, dirs, camera, f(0.025), f(0.01), bound)
    frozen = precompute_frozen(*args)
    target = jnp.asarray(np.asarray(render_rays_tensor(*args)) * 1.2)

    def mkloss(fn, extra=()):
        def L(p):
            lin = fn(static, p, dirs, camera, f(0.025), f(0.01), bound,
                     *extra)
            return jnp.mean((lin - target) ** 2)
        return L

    g_scan = jax.grad(mkloss(render_rays_diff))(params)
    g_froz = jax.grad(mkloss(render_rays_tensor_frozen, (frozen,)))(params)
    for ci, comp in enumerate(g_scan[0]["comps"]):
        for leaf in ("strength", "r0", "z0"):
            a = float(np.asarray(comp[leaf]))
            b = float(np.asarray(g_froz[0]["comps"][ci][leaf]))
            denom = max(abs(a), 1e-3)
            assert abs(a - b) / denom < 0.05, (ci, leaf, a, b)


def test_frozen_guard_rejects_noise_fields(fixtures_dir):
    """check_frozen_fields rejects fields that feed the raw fractal noise;
    fit_scene(march='frozen') surfaces the same error; other fit entry
    points reject march='frozen' outright."""
    from gamer_tpu.engine.fit import fit_scene, fit_pose
    from gamer_tpu.engine.tensor_march import check_frozen_fields

    static, params, camera, dirs, bound = _setup(fixtures_dir, "Spiral",
                                                 size=12)
    for bad in ("scale", "ks", "winding", "winding_b", "axis"):
        with pytest.raises(ValueError, match="frozen"):
            check_frozen_fields(static, (bad, "strength"))
    # Spiral has a ridged component (dust2/dust positive) -> offset/tilt
    # are noise inputs there
    from gamer_tpu.scene.schema import CID_DUST2, CID_DUST_POSITIVE

    if any(cs.cid in (CID_DUST2, CID_DUST_POSITIVE)
           for st in static.instances for cs in st.comps):
        with pytest.raises(ValueError, match="frozen"):
            check_frozen_fields(static, ("noise_tilt",))
    # safe set passes
    check_frozen_fields(static, ("strength", "r0", "z0", "inner", "delta"))

    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=gax.load(fixtures_dir / "Spiral.gax"))],
        config=gamer_tpu.RenderConfig(size=12, ray_step=0.025,
                                      is_preview=True, noise_octaves=3),
    )
    from gamer_tpu.engine.render import render_scene

    target = render_scene(scene)
    with pytest.raises(ValueError, match="frozen"):
        fit_scene(scene, target, ("scale",), steps=1, march="frozen")
    with pytest.raises(ValueError, match="frozen"):
        fit_pose(scene, target, steps=1, march="frozen")


def test_fit_scene_with_frozen_march(fixtures_dir):
    """fit_scene(march='frozen') recovers a perturbed strength — the
    precompute-once path end-to-end."""
    import copy

    from gamer_tpu.engine.fit import fit_scene
    from gamer_tpu.engine.render import render_scene

    scene = gamer_tpu.Scene(
        camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                      up=(0, 1, 0), fov=90.0),
        instances=[gamer_tpu.GalaxyInstance(
            galaxy=gax.load(fixtures_dir / "Spiral.gax"))],
        config=gamer_tpu.RenderConfig(size=16, ray_step=0.025,
                                      is_preview=True, noise_octaves=3),
    )
    target = render_scene(scene)
    perturbed = copy.deepcopy(scene)
    for c in perturbed.instances[0].galaxy.components:
        c.strength *= 1.6
    res = fit_scene(perturbed, target, ("strength",), steps=25, lr=3e-2,
                    march="frozen")
    assert min(res.losses) < res.losses[0] * 0.5, res.losses[:3] + res.losses[-3:]
