"""Gradient-based galaxy fitting — inverse rendering on the differentiable
march paths.

Given a target image and an initial scene, optimize selected galaxy
parameters so the rendered frame matches the target, by running Adam on
gradients taken *through the whole render pipeline*. Nothing comparable
exists in the reference — its only workflow for matching a look is
hand-tuning in the Qt editor (mainwindow.cpp parameter tabs); this module
turns every one of those tab knobs into a differentiable degree of freedom.

Three march backends (``march=``): "tensor" (default — engine/tensor_march,
the reassociated parallel formulation; measured v5e-1 64^2 LOD4 fit step
0.34 s vs round 1's 3.5 s, 128^2 1.1 s), "frozen" (every fixed-camera fit
— fit_scene / multiscale / batch / multiview; NOT fit_pose, which moves
the noise inputs with the camera — tensor march with the raw fractal-noise
fields precomputed ONCE per fit (per scene/view for batch/multiview) and
stop_gradient'ed; valid whenever the fitted fields do not feed the
noise (check_frozen_fields), which holds for the default strength/r0/z0
set; per-step cost drops to the differentiable algebra AND the gradients
land closer to the sequential linearization, because the noise-VJP terms —
zero a.e. in exact arithmetic for these fields — otherwise pollute every
leaf at the ~1% level), and "scan" (engine/diff — forward bit-exact vs the
production while-loop march; use it when the fitted field set leans on
winding-driven gradients, where the reassociated linearizations diverge).

Design notes:
  - The scene STRUCTURE stays fixed (same compiled render serves every
    optimizer step — the architecture invariant from engine/scene_prep);
    only numeric leaves move.
  - Which leaves move is chosen by field name (``fit_fields``) over the
    flattened params pytree: per-component knobs (strength, r0, z0, arm,
    delta, winding, scale, noise_offset, noise_tilt, ks, inner, spec) and
    instance/galaxy-level knobs (intensity_scale, position, axis,
    winding_b, winding_n, arms). Derived rotation state (orientation,
    rotmat, twirl_axis) and the structural arm-ladder count (no_arms) are
    never fitted.
  - Gradients are sanitized (nan_to_num) and masked, then a projection
    step clamps fields with hard domain constraints (z0/r0/winding_b
    appear in divisions).
  - ``apply_fit_to_scene`` writes fitted leaves back into a deep copy of
    the Scene (the exact inverse of scene_prep.flatten_scene's traversal),
    so results round-trip to .gax / scene-dict form.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import qtmath as qm
from ..ops import camera as cam_ops
from ..scene.schema import CameraParams, Scene
from .diff import post_process_float, render_rays_diff, step_bound_for_scene
from .scene_prep import COMP_FIELDS, flatten_scene

# Component-level + instance/galaxy-level leaves that may be optimized.
COMP_FITTABLE = COMP_FIELDS + ("spec",)
INSTANCE_FITTABLE = (
    "intensity_scale", "position", "axis", "winding_b", "winding_n", "arms",
)
FITTABLE_FIELDS = COMP_FITTABLE + INSTANCE_FITTABLE

# Hard domain constraints, projected after each update: these leaves are
# divided by (or exponentiate) in the shading math.
_FIT_BOUNDS = {
    "z0": 1e-4,
    "r0": 1e-4,
    "winding_b": 1e-3,
    "scale": 0.0,
    # inner == 0 puts a zero-width edge into qt_smoothstep (0/0 division):
    # forward-harmless (NaN -> clamp -> 1, matching the oracle) but its
    # gradient is identically NaN, so a fitted inner is kept off zero —
    # smoothstep(0, 1e-4, r) is visually identical to inner = 0.
    "inner": 1e-4,
    # axis appears as 1/(axis*axis) in the intersector and /axis[0] in the
    # radius; a nonpositive semi-axis is a NaN factory.
    "axis": 1e-2,
}

DEFAULT_FIT_FIELDS = ("strength", "r0", "z0")


def _pixel_sharding(mesh, ndim: int):
    """NamedSharding partitioning an array's leading (pixel-row) axis over a
    1-D mesh — the fit-path analog of parallel/sharding.py's row sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(mesh.axis_names) != 1:
        raise ValueError(f"need a 1-D mesh, got axes {mesh.axis_names}")
    return NamedSharding(
        mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))


def _check_mesh_divides(mesh, size: int, pool: int, who: str) -> None:
    n_dev = mesh.devices.size
    if (size // pool) % n_dev:
        raise ValueError(
            f"{who}: pooled frame rows {size // pool} must divide the mesh "
            f"({n_dev} devices) so every device owns whole output rows")


def _ss_setup(scene: Scene, size: int):
    """Supersampling for the differentiable forward model.

    Returns ``(ss, pool_linear)``: the forward renders ss² rays per pixel
    (a ``size*ss`` ray grid) and ``pool_linear`` box-averages them in
    LINEAR space before the nonlinear post chain — the same semantics as
    render.render_frame_ss, so fitting against an AA-rendered target
    carries no sampling-mismatch bias (the forward model and the target
    see the same pixel integral)."""
    ss = int(scene.config.supersample)
    if ss <= 1:
        return 1, (lambda linear: linear)

    def pool_linear(linear):
        return linear.reshape(size, ss, size, ss, 3).mean(axis=(1, 3))

    return ss, pool_linear


def _ckpt_save(path: str, fingerprint: str, i: int, params, opt_state,
               losses, best_loss: float, best_params) -> None:
    """Atomically persist one optimizer step boundary (engine/jobs.py's
    manifest-resume discipline applied to a training loop)."""
    import os

    leaves = {}
    for tag, tree in (("p", params), ("o", opt_state), ("b", best_params)):
        for k, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
            leaves[f"{tag}{k}"] = np.asarray(leaf)
    tmp = f"{path}.tmp"
    np.savez(tmp, __fingerprint__=np.frombuffer(
        fingerprint.encode(), np.uint8), __step__=np.int64(i),
        __losses__=np.asarray(losses, np.float64),
        # scalar for fit_scene/fit_pose, a (K,) vector for fit_scene_batch
        __best_loss__=np.asarray(best_loss, np.float64), **leaves)
    os.replace(tmp + (".npz" if not tmp.endswith(".npz") else ""), path)


def _ckpt_load(path: str, fingerprint: str, params, opt_state, best_params):
    """Restore (step, params, opt_state, losses, best_loss, best_params)
    from ``path``, or None if absent. A checkpoint written by a different
    fit setup is rejected loudly, like DatasetJob's manifest mismatch."""
    import os

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        saved_fp = bytes(z["__fingerprint__"]).decode()
        if saved_fp != fingerprint:
            raise ValueError(
                f"checkpoint {path} was written by a different fit "
                f"(fields/lr/march/scene/target changed); delete it or use "
                f"another path")

        def restore(tag, tree):
            # restore each leaf onto the LIVE leaf's sharding: a resumed
            # mesh run (fit_scene_batch mesh=) must keep its batch-axis
            # partitioning instead of silently landing on the default
            # device. Leaves whose live sharding is single-device (e.g.
            # optax's scalar step count) stay UNCOMMITTED — device_put
            # would pin them to device 0, and jit rejects a computation
            # mixing device-0-committed and mesh-committed arguments.
            live, treedef = jax.tree_util.tree_flatten(tree)
            out = []
            for k, ref in enumerate(live):
                a = jnp.asarray(z[f"{tag}{k}"])
                sharding = getattr(ref, "sharding", None)
                if sharding is not None and len(sharding.device_set) > 1:
                    a = jax.device_put(a, sharding)
                out.append(a)
            return jax.tree_util.tree_unflatten(treedef, out)

        return (int(z["__step__"]), restore("p", params),
                restore("o", opt_state), list(z["__losses__"]),
                np.asarray(z["__best_loss__"]), restore("b", best_params))


def _optimize(loss_fn, params, mask, *, steps, lr, optimizer, on_step,
              project_fn=None, checkpoint_path=None, checkpoint_every=1,
              fingerprint="", batch: int = 0, captures=()):
    """The shared masked-Adam loop of fit_scene, fit_pose and
    fit_scene_batch.

    - Gradients are nan_to_num-sanitized and masked to the fitted leaves.
    - With the default optimizer, updates are scaled by each leaf's initial
      magnitude (relative stepping: galaxy knobs span ~4 orders of
      magnitude, so lr becomes a per-step relative change).
    - ``project_fn(params)`` re-applies domain constraints after each step.
    - ``on_step(i, loss)`` returning False aborts the loop cooperatively
      (any other return value, including None, continues).
    - ``checkpoint_path`` persists (params, optimizer state, loss trace)
      every ``checkpoint_every`` steps and resumes from it when present;
      the relative-step scales derive from the CALLER's initial params, so
      a resumed run replays the exact trajectory of an uninterrupted one.
    - Returns (best_params, losses): each step's loss belongs to the
      PRE-update params, and the final iterate's loss is evaluated once at
      the end (appended to losses), so the best (loss, params) pair is
      chosen over every iterate including the last — the loss is noisy
      near convergence and a final step can overshoot.
    - ``batch`` = K > 0 means ``loss_fn`` returns a (K,) per-scene loss
      vector (fit_scene_batch): gradients descend the SUM, every leaf
      carries a leading K axis, and the best iterate is tracked PER SCENE
      (each scene keeps the best of its own trajectory, exactly as K
      independent fits would).
    - ``captures``: LARGE device arrays the loss depends on (the frozen
      noise fields), passed as ``loss_fn(p, *captures)``. They are
      threaded through jit as explicit ARGUMENTS: a closed-over array is
      inlined into the lowered module as a constant, so a K-view frozen
      precompute (K x ~134 MB at 128^2) serialized into every compile
      payload — which both re-uploads device-resident data and exceeds
      the axon tunnel's remote_compile body limit (HTTP 413 at 4 views).
      Argument-passing keeps the compile payload small and the fields on
      device. Small closures (ray dirs, pooled targets) stay closures.
    """
    import optax

    if optimizer is None:
        opt = optax.adam(lr)
        rel = jax.tree_util.tree_map(
            lambda leaf: jnp.maximum(jnp.abs(jnp.asarray(leaf)), 0.1), params
        )
    else:
        opt = optimizer
        rel = jax.tree_util.tree_map(
            lambda leaf: jnp.ones_like(jnp.asarray(leaf)), params
        )
    opt_state = opt.init(params)

    caps = tuple(captures)

    if batch:
        # SUM, not mean: the gradient of the sum w.r.t. scene k's leaves IS
        # scene k's independent gradient, so each scene's Adam trajectory
        # matches its standalone fit exactly (a mean's 1/K rescaling is
        # Adam-invariant only while gradients dominate Adam's eps — it
        # visibly bends trajectories of scenes near their minimum).
        def value_fn(p, cap):
            lv = loss_fn(p, *cap)
            return jnp.sum(lv), lv
    else:
        def value_fn(p, cap):
            loss = loss_fn(p, *cap)
            return loss, loss

    @jax.jit
    def step_fn(p, s, cap):
        (_, loss), grads = jax.value_and_grad(value_fn, has_aux=True)(p, cap)
        grads = jax.tree_util.tree_map(
            lambda g, m: jnp.nan_to_num(g) * m, grads, mask
        )
        updates, s = opt.update(grads, s, p)
        updates = jax.tree_util.tree_map(lambda u, r: u * r, updates, rel)
        p = optax.apply_updates(p, updates)
        if project_fn is not None:
            p = project_fn(p)
        return p, s, loss

    def improve(loss_now, params_now):
        """Fold one iterate into the running (best_loss, best_params)."""
        nonlocal best_loss, best_params
        if not batch:
            if loss_now < best_loss:
                best_loss, best_params = loss_now, params_now
            return
        imp = np.asarray(loss_now) < np.asarray(best_loss)
        if imp.any():
            impj = jnp.asarray(imp)
            best_params = jax.tree_util.tree_map(
                lambda b, c: jnp.where(
                    impj.reshape(imp.shape + (1,) * (jnp.ndim(c) - 1)), c, b),
                best_params, params_now)
            best_loss = np.where(imp, np.asarray(loss_now),
                                 np.asarray(best_loss))

    losses: List[float] = []
    best_params = params
    best_loss = np.full((batch,), np.inf) if batch else np.inf
    start = 0
    if checkpoint_path:
        resumed = _ckpt_load(checkpoint_path, fingerprint, params, opt_state,
                             best_params)
        if resumed is not None:
            start, params, opt_state, losses, bl, best_params = resumed
            best_loss = np.asarray(bl) if batch else float(bl)
            if start > steps:
                raise ValueError(
                    f"checkpoint {checkpoint_path} already holds {start} "
                    f"steps but only {steps} were requested — increase "
                    f"steps to extend the run, or delete the checkpoint "
                    f"to start over")
    for i in range(start, steps):
        new_params, opt_state, loss = step_fn(params, opt_state, caps)
        losses.append(np.asarray(loss) if batch else float(loss))
        improve(losses[-1], params)
        params = new_params
        if checkpoint_path and ((i + 1) % max(1, checkpoint_every) == 0
                                or i + 1 == steps):
            # the final step saves unconditionally: a completed run must be
            # extendable (rerun with larger steps resumes, not restarts)
            _ckpt_save(checkpoint_path, fingerprint, i + 1, params, opt_state,
                       losses, best_loss, best_params)
        if on_step is not None and on_step(i, losses[-1]) is False:
            # cooperative abort (serve.py DELETE /job): stop after the
            # current step; best-so-far params are still returned below,
            # mirroring the render path's partial-frame-on-abort contract
            break
    # the final iterate's loss was never seen by the loop above
    final_loss = jax.jit(lambda p, cap: loss_fn(p, *cap))(params, caps)
    losses.append(np.asarray(final_loss) if batch else float(final_loss))
    improve(losses[-1], params)
    return best_params, losses


def _fit_fingerprint(kind: str, fit_fields, lr, march, size, params,
                     target, extra: str = "", aux=()) -> str:
    """Identity of a fit setup for checkpoint-resume validation: the same
    (loss surface, fitted leaves, step rule) — steps excluded so a resume
    may extend a run. ``extra`` carries per-call loss-shape knobs (pool,
    noise LOD); ``aux`` carries every remaining numeric input of the loss
    (camera pose, step sizes, post knobs, trip bound, held-constant galaxy
    params) so a checkpoint cannot silently resume a DIFFERENT problem."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves((params, list(aux))):
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float64)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(target)).tobytes())
    return (f"{kind}|{','.join(sorted(fit_fields))}|{lr:g}|{march}|{size}|"
            f"{extra}|{h.hexdigest()[:16]}")


@dataclass
class FitResult:
    """Outcome of fit_scene: fitted scene + optimization trace."""

    scene: Scene   # deep copy with fitted values written back
    # fitted parameter pytree: flatten_scene's tuple-of-dicts for
    # fit_scene, the {camera, target, fov} pose dict for fit_pose
    params: object
    losses: List[float] = field(default_factory=list)
    fit_fields: Tuple[str, ...] = ()


def _leaf_name(path) -> str:
    """Last dict key on a tree path ('' for positional-only paths)."""
    for entry in reversed(path):
        key = getattr(entry, "key", None)
        if isinstance(key, str):
            return key
    return ""


def _fit_mask(params, fit_fields: Sequence[str]):
    wanted = set(fit_fields)
    unknown = wanted - set(FITTABLE_FIELDS)
    if unknown:
        raise ValueError(
            f"unknown fit fields {sorted(unknown)}; fittable: {FITTABLE_FIELDS}"
        )
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.float32(1.0 if _leaf_name(path) in wanted else 0.0),
        params,
    )


def _project_bounds(params, fit_fields: Sequence[str]):
    wanted = set(fit_fields) & set(_FIT_BOUNDS)
    if not wanted:
        return params
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jnp.maximum(leaf, _FIT_BOUNDS[_leaf_name(path)])
            if _leaf_name(path) in wanted else leaf
        ),
        params,
    )


def _march_fn(march: str):
    """The differentiable march backend: 'scan' (bit-exact vs the while
    path, sequential backward) or 'tensor' (engine/tensor_march — the
    reassociated parallel formulation, fp-tolerance forward)."""
    if march == "scan":
        return render_rays_diff
    if march == "tensor":
        from .tensor_march import render_rays_tensor

        return render_rays_tensor
    if march == "frozen":
        raise ValueError(
            "march='frozen' is only supported by fit_scene / "
            "fit_scene_multiscale / fit_scene_batch / fit_scene_multiview "
            "(fixed cameras, per-call noise precompute); fit_pose moves "
            "the camera, which moves every noise input — use "
            "march='tensor' there")
    raise ValueError(
        f"unknown march backend {march!r}; use 'scan', 'tensor' or 'frozen'")


# fields whose gradients flow through the spiral winding angle — the one
# leaf family where the tensor march's reassociated gradients legitimately
# diverge from the sequential linearization (chaotic sensitivity; see
# engine/tensor_march docstring / tests/test_tensor_march.py)
_WINDING_FIELDS = frozenset({"winding", "winding_b", "winding_n"})


def _check_march_fields(march: str, fit_fields) -> None:
    bad = _WINDING_FIELDS & set(fit_fields)
    if march == "tensor" and bad:
        import warnings

        warnings.warn(
            f"fitting winding-family fields {sorted(bad)} with the tensor "
            "march: their reassociated gradients diverge from the true "
            "linearization (chaotic winding sensitivity) — pass "
            "march='scan' for trustworthy winding gradients, or use "
            "fit_scene_fd (march='fd' on the CLI) for the fast "
            "production-kernel probe path.",
            RuntimeWarning, stacklevel=3)


def fit_scene(
    scene: Scene,
    target_image,
    fit_fields: Sequence[str] = DEFAULT_FIT_FIELDS,
    *,
    steps: int = 100,
    lr: float = 2e-2,
    max_steps: Optional[int] = None,
    optimizer=None,
    on_step: Optional[Callable[[int, float], None]] = None,
    march: str = "tensor",
    pool: int = 1,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """Fit ``fit_fields`` of ``scene`` so its render matches ``target_image``.

    target_image: (size, size, 3) uint8 or float array in [0, 255] — the
    post-processed image space (what the reference saves to PNG). The loss
    is the mean squared error in [0, 1]-normalized image space; ``pool``
    box-averages BOTH images by that factor first (used by the multiscale
    ladder: pooling suppresses the fractal-scale mismatch between an
    LOD-capped forward model and a full-quality target, which otherwise
    biases brightness fields).

    ``mesh`` (a 1-D jax.sharding.Mesh) runs the whole training step
    multi-chip: the ray grid and target rows are sharded across the mesh
    (data parallelism over pixels — the fit-path analog of the render
    path's row sharding, SURVEY.md §2.5), parameters stay replicated, and
    the per-device gradient contributions meet in the all-reduce XLA
    inserts for the replicated-parameter grads. The pooled frame rows must
    divide the mesh.

    Returns a FitResult whose ``scene`` is a deep copy with the fitted
    values written back (round-trippable to .gax / scene dict).

    ``checkpoint_path`` persists the optimizer state every
    ``checkpoint_every`` steps and resumes from it when the file exists —
    an interrupted fit rerun with the same arguments replays the exact
    uninterrupted trajectory; a checkpoint from a DIFFERENT setup (fields,
    lr, march, scene, target) is rejected.
    """
    target = jnp.asarray(np.asarray(target_image, np.float32) / 255.0)
    size = target.shape[0]
    if target.shape != (size, size, 3):
        raise ValueError(f"target must be (N, N, 3), got {target.shape}")
    if size != scene.config.size:
        raise ValueError(
            f"target size {size} != scene.config.size {scene.config.size}"
        )
    if pool < 1 or size % pool != 0:
        raise ValueError(f"pool {pool} must divide the size {size}")
    ss, _linear_pooled = _ss_setup(scene, size)

    def _pooled(img):
        if pool > 1:
            o = size // pool
            img = img.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
        return img

    target_pooled = _pooled(target)

    cfg = scene.config
    static, params0 = flatten_scene(scene)
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    camera = jnp.asarray(scene.camera.camera, jnp.float32)
    inv_vp = jnp.asarray(cam_ops.inv_view_projection_host(
        np.asarray(scene.camera.camera, np.float32),
        scene.camera.target, scene.camera.up, scene.camera.fov,
    ))
    dirs = cam_ops.ray_grid(size * ss, inv_vp)
    if mesh is not None:
        _check_mesh_divides(mesh, size, pool, "fit_scene")
        # committing the ray grid and target rows to the mesh is the only
        # annotation needed: jit/GSPMD propagates the row partitioning
        # through march+post+loss and all-reduces the parameter gradients
        dirs = jax.device_put(dirs, _pixel_sharding(mesh, dirs.ndim))
        target_pooled = jax.device_put(
            target_pooled, _pixel_sharding(mesh, target_pooled.ndim))
    if max_steps is not None:
        trip_bound = max_steps
    else:
        trip_bound = step_bound_for_scene(scene)
        if "axis" in fit_fields:
            # The trip bound is static but the chord scales with the fitted
            # axis: reserve 2x headroom (growth beyond 2x the starting axis
            # would silently truncate the march).
            from .diff import conservative_step_bound

            max_axis = max(
                (max(gi.galaxy.params.axis) for gi in scene.instances),
                default=1.0,
            )
            trip_bound = conservative_step_bound(
                cfg.ray_step, cfg.min_ray_step, 2.0 * max_axis
            )
    f = jnp.float32

    _check_march_fields(march, fit_fields)
    if march == "frozen":
        # Precompute the fractal noise fields ONCE (engine/tensor_march):
        # valid because check_frozen_fields rejects any fitted field that
        # feeds the raw noise — per step only the cheap differentiable
        # algebra around the frozen fields runs.
        from .tensor_march import (
            check_frozen_fields,
            precompute_frozen,
            render_rays_tensor_frozen,
        )

        check_frozen_fields(static, fit_fields)
        frozen = jax.jit(precompute_frozen, static_argnums=(0, 6))(
            static, params, dirs, camera, f(cfg.ray_step),
            f(cfg.min_ray_step), trip_bound)
        captures = (jax.block_until_ready(frozen),)

        def march_fn(st, p, d, c, rs, ms, tb, fz):
            return render_rays_tensor_frozen(st, p, d, c, rs, ms, tb, fz)
    else:
        _march = _march_fn(march)
        captures = ()

        def march_fn(st, p, d, c, rs, ms, tb, fz):
            return _march(st, p, d, c, rs, ms, tb)

    def loss_fn(p, *cap):
        # cap carries the frozen fields as a jit ARGUMENT (see _optimize's
        # ``captures``: a 134 MB closure would be inlined per compile)
        linear = _linear_pooled(march_fn(
            static, p, dirs, camera, f(cfg.ray_step), f(cfg.min_ray_step),
            trip_bound, cap[0] if cap else None,
        ))
        img = post_process_float(
            linear, f(cfg.exposure), f(cfg.gamma), f(cfg.saturation)
        ) / 255.0
        return jnp.mean((_pooled(img) - target_pooled) ** 2)

    mask = _fit_mask(params, fit_fields)
    # Project the starting point too: a fitted field sitting exactly on a
    # singular value (e.g. inner == 0) would never receive a usable gradient.
    params = _project_bounds(params, fit_fields)
    best_params, losses = _optimize(
        loss_fn, params, mask, steps=steps, lr=lr, optimizer=optimizer,
        on_step=on_step,
        project_fn=lambda p: _project_bounds(p, fit_fields),
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        fingerprint=_fit_fingerprint(
            "scene", fit_fields, lr, march, size, params, target,
            extra=(f"pool{pool}|lod{cfg.noise_octaves}"
                   + (f"|ss{ss}" if ss > 1 else "")),
            aux=(scene.camera.camera, scene.camera.target, scene.camera.up,
                 scene.camera.fov, cfg.ray_step, cfg.min_ray_step,
                 cfg.exposure, cfg.gamma, cfg.saturation, trip_bound)),
        captures=captures,
    )

    fitted = jax.tree_util.tree_map(np.asarray, best_params)
    return FitResult(
        scene=apply_fit_to_scene(scene, fitted, fit_fields),
        params=fitted,
        losses=losses,
        fit_fields=tuple(fit_fields),
    )


@dataclass
class BatchFitResult:
    """Outcome of fit_scene_batch: K fitted scenes + per-scene traces."""

    scenes: List[Scene]      # K deep copies with fitted values written back
    params: object           # batched params pytree (leading K axis)
    losses: "np.ndarray"     # (steps+1, K) per-scene loss trace
    fit_fields: Tuple[str, ...] = ()


def fit_scene_batch(
    scenes,
    target_images,
    fit_fields: Sequence[str] = DEFAULT_FIT_FIELDS,
    *,
    steps: int = 100,
    lr: float = 2e-2,
    max_steps: Optional[int] = None,
    optimizer=None,
    on_step: Optional[Callable[[int, object], None]] = None,
    march: str = "tensor",
    pool: int = 1,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> BatchFitResult:
    """Fit K independent scenes to K targets in ONE vmapped optimization —
    inverse rendering at dataset scale.

    The reference has no batch story at all (one Qt editor, one galaxy);
    here the scene-structure/parameter split (engine/scene_prep) makes K
    fits of the SAME structure a single program: parameters gain a leading
    K axis, the forward model vmaps over (params_k, target_k), gradients
    descend the SUM of the per-scene losses (whose gradient w.r.t. scene
    k's leaves is exactly scene k's independent gradient), Adam runs
    elementwise, and the best iterate is tracked PER SCENE — each scene's
    trajectory is what its standalone fit_scene would produce, in one
    program.

    ``scenes``: one template Scene (every fit starts from the same initial
    parameters) or a sequence of K Scenes sharing the same compiled
    STRUCTURE, camera pose and render config (each fit starts from its own
    initial values). ``target_images``: (K, size, size, 3) uint8/float
    stack in [0, 255] image space.

    ``mesh`` (a 1-D jax.sharding.Mesh) shards the BATCH axis across
    devices (scene-level data parallelism — each device fits K/n_dev
    scenes with no cross-device traffic except the scalar mean loss), the
    natural multi-chip axis for catalog-scale fitting; K must divide the
    mesh. This is the complement of fit_scene's pixel-row sharding (one
    big fit across chips) — here many small fits pack the chips instead.

    ``checkpoint_path``: exact-replay resume of the whole batch, as in
    fit_scene. ``on_step(i, loss_vec)`` sees the (K,) per-scene losses.

    Returns a BatchFitResult; ``scenes[k]`` re-renders at its own fitted
    loss and round-trips to .gax / scene-dict form.
    """
    if isinstance(scenes, Scene):
        scene_list = None
        template = scenes
    else:
        scene_list = list(scenes)
        if not scene_list:
            raise ValueError("fit_scene_batch needs at least one scene")
        template = scene_list[0]

    targets = np.asarray(target_images, np.float32)
    if targets.ndim != 4 or targets.shape[-1] != 3 \
            or targets.shape[1] != targets.shape[2]:
        raise ValueError(
            f"target_images must be (K, N, N, 3), got {targets.shape}")
    K = targets.shape[0]
    size = targets.shape[1]
    if size != template.config.size:
        raise ValueError(
            f"target size {size} != scene.config.size {template.config.size}")
    if scene_list is not None and len(scene_list) != K:
        raise ValueError(
            f"{len(scene_list)} scenes but {K} targets")
    if pool < 1 or size % pool != 0:
        raise ValueError(f"pool {pool} must divide the size {size}")
    ss, _linear_pooled = _ss_setup(template, size)
    _check_march_fields(march, fit_fields)

    cfg = template.config
    static, params0 = flatten_scene(template)
    if scene_list is None:
        # one template: every scene starts from the same initial values
        params = jax.tree_util.tree_map(
            lambda leaf: jnp.repeat(jnp.asarray(leaf)[None], K, axis=0),
            params0)
    else:
        flats = []
        for k, sc in enumerate(scene_list):
            st_k, p_k = flatten_scene(sc)
            if st_k != static:
                raise ValueError(
                    f"scene {k} has a different compiled structure than "
                    f"scene 0 — fit_scene_batch requires one structure "
                    f"(same components/arms/LOD/dither) across the batch")
            if tuple(sc.camera.camera) != tuple(template.camera.camera) or \
                    tuple(sc.camera.target) != tuple(template.camera.target) or \
                    tuple(sc.camera.up) != tuple(template.camera.up) or \
                    sc.camera.fov != template.camera.fov:
                raise ValueError(
                    f"scene {k} has a different camera pose — the batch "
                    f"shares one ray grid; fit poses with fit_pose")
            for fld in ("size", "ray_step", "min_ray_step", "exposure",
                        "gamma", "saturation", "supersample"):
                if getattr(sc.config, fld) != getattr(template.config, fld):
                    raise ValueError(
                        f"scene {k} has config.{fld}="
                        f"{getattr(sc.config, fld)!r} but scene 0 has "
                        f"{getattr(template.config, fld)!r} — the batch "
                        f"shares ONE forward model (ray grid, march step, "
                        f"post chain), so render configs must match")
            flats.append(p_k)
        params = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack([jnp.asarray(v) for v in leaves]),
            *flats)

    target = jnp.asarray(targets / 255.0)

    def _pooled(img):
        if pool > 1:
            o = size // pool
            img = img.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
        return img

    target_pooled = jax.vmap(_pooled)(target)

    camera = jnp.asarray(template.camera.camera, jnp.float32)
    inv_vp = jnp.asarray(cam_ops.inv_view_projection_host(
        np.asarray(template.camera.camera, np.float32),
        template.camera.target, template.camera.up, template.camera.fov,
    ))
    dirs = cam_ops.ray_grid(size * ss, inv_vp)
    if mesh is not None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"need a 1-D mesh, got axes {mesh.axis_names}")
        n_dev = mesh.devices.size
        if K % n_dev:
            raise ValueError(
                f"fit_scene_batch: batch size {K} must divide the mesh "
                f"({n_dev} devices) so every device owns whole scenes")
        shard = lambda a: jax.device_put(  # noqa: E731
            a, _pixel_sharding(mesh, jnp.ndim(a)))
        target_pooled = shard(target_pooled)
        params = jax.tree_util.tree_map(shard, params)

    if max_steps is not None:
        trip_bound = max_steps
    else:
        # bound over EVERY scene's geometry, not just the template's: a
        # batch member whose axes exceed the template's would otherwise
        # march with a too-small static trip count (silent truncation)
        bound_scenes = scene_list if scene_list is not None else [template]
        trip_bound = max(step_bound_for_scene(sc) for sc in bound_scenes)
        if "axis" in fit_fields:
            # same 2x growth headroom as fit_scene: the trip bound is
            # static but the chord scales with the fitted axis
            from .diff import conservative_step_bound

            max_axis = max(
                (max(gi.galaxy.params.axis)
                 for sc in bound_scenes for gi in sc.instances),
                default=1.0,
            )
            trip_bound = conservative_step_bound(
                cfg.ray_step, cfg.min_ray_step, 2.0 * max_axis
            )
    f = jnp.float32
    if march == "frozen":
        # Frozen noise is valid here for the same reason as fit_scene:
        # check_frozen_fields rejects any fitted field that feeds the
        # noise inputs, so the raw fractal fields are constants of the fit.
        from .tensor_march import (
            check_frozen_fields,
            precompute_frozen,
            render_rays_tensor_frozen,
        )

        check_frozen_fields(static, fit_fields)
        if scene_list is None:
            # one template: the K parameter stacks are bitwise-identical,
            # so ONE field set serves every scene (broadcast in the vmapped
            # loss below) instead of paying K x the precompute memory
            # (~134 MB/scene at 128^2 — this OOM'd at catalog scale).
            _pf1 = lambda p_k: precompute_frozen(  # noqa: E731
                static, p_k, dirs, camera, f(cfg.ray_step),
                f(cfg.min_ray_step), trip_bound)
            frozen = jax.block_until_ready(jax.jit(_pf1)(params0))
            frozen_axis = None
        else:
            # per-scene frozen noise: the raw fractal fields depend on each
            # scene's INITIAL parameter values, so the precompute vmaps
            # over the K parameter stacks — one field set per scene
            _pf = jax.vmap(lambda p_k: precompute_frozen(
                static, p_k, dirs, camera, f(cfg.ray_step),
                f(cfg.min_ray_step), trip_bound))
            frozen = jax.block_until_ready(jax.jit(_pf)(params))
            frozen_axis = 0

        def march_scene(p, fz):
            return render_rays_tensor_frozen(
                static, p, dirs, camera, f(cfg.ray_step),
                f(cfg.min_ray_step), trip_bound, fz)
    else:
        _march = _march_fn(march)
        frozen = None

        def march_scene(p, fz):
            return _march(static, p, dirs, camera, f(cfg.ray_step),
                          f(cfg.min_ray_step), trip_bound)

    def per_scene_loss(p, t, *fz):
        linear = _linear_pooled(
            march_scene(p, fz[0] if fz else None))
        img = post_process_float(
            linear, f(cfg.exposure), f(cfg.gamma), f(cfg.saturation)
        ) / 255.0
        return jnp.mean((_pooled(img) - t) ** 2)

    if frozen is not None:
        captures = (frozen,)

        def loss_fn(p, fz):
            return jax.vmap(per_scene_loss,
                            in_axes=(0, 0, frozen_axis))(p, target_pooled,
                                                         fz)
    else:
        captures = ()

        def loss_fn(p):
            return jax.vmap(per_scene_loss)(p, target_pooled)

    mask = _fit_mask(params, fit_fields)
    params = _project_bounds(params, fit_fields)
    best_params, losses = _optimize(
        loss_fn, params, mask, steps=steps, lr=lr, optimizer=optimizer,
        on_step=on_step,
        project_fn=lambda p: _project_bounds(p, fit_fields),
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        fingerprint=_fit_fingerprint(
            "batch", fit_fields, lr, march, size, params, targets,
            extra=(f"pool{pool}|lod{cfg.noise_octaves}|K{K}"
                   + (f"|ss{ss}" if ss > 1 else "")),
            aux=(template.camera.camera, template.camera.target,
                 template.camera.up, template.camera.fov, cfg.ray_step,
                 cfg.min_ray_step, cfg.exposure, cfg.gamma, cfg.saturation,
                 trip_bound)),
        batch=K,
        captures=captures,
    )

    fitted = jax.tree_util.tree_map(np.asarray, best_params)
    base_scenes = scene_list if scene_list is not None else [template] * K
    out_scenes = [
        apply_fit_to_scene(
            base_scenes[k],
            jax.tree_util.tree_map(lambda leaf: leaf[k], fitted),
            fit_fields)
        for k in range(K)
    ]
    return BatchFitResult(
        scenes=out_scenes,
        params=fitted,
        losses=np.stack([np.asarray(v) for v in losses]),
        fit_fields=tuple(fit_fields),
    )


def fit_scene_multiview(
    scene: Scene,
    targets,
    cameras: Sequence,
    fit_fields: Sequence[str] = DEFAULT_FIT_FIELDS,
    *,
    steps: int = 100,
    lr: float = 2e-2,
    max_steps: Optional[int] = None,
    optimizer=None,
    on_step: Optional[Callable[[int, float], None]] = None,
    pool: int = 1,
    march: str = "tensor",
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """Fit ONE galaxy's parameters against K views of it at once.

    ``targets``: (K, size, size, 3) uint8/float renders of the same galaxy
    from K known camera poses (``cameras``: K CameraParams). The loss is
    the mean of the per-view MSEs, so gradients triangulate: a single view
    cannot distinguish (e.g.) a thicker disk from a brighter one along the
    line of sight, but views from different directions constrain the 3-D
    structure jointly. No analog exists in the reference — its editor
    matches one view by hand (mainwindow.cpp parameter tabs).

    TPU mapping: the forward model is one vmap over the view axis (each
    view is the same march with its own ray grid and camera origin);
    ``mesh`` (1-D) shards the VIEW axis across devices (K must divide the
    mesh), parameters stay replicated and their gradients all-reduce via
    GSPMD — the same pattern as fit_scene_batch's scene axis.

    The scene's own camera is untouched (it is not one of the views unless
    passed in ``cameras``). ``pool``/``march``/``checkpoint_path`` behave
    exactly as in fit_scene; config.supersample is honored per view
    (ss² rays/pixel pooled in linear space). Poses are held fixed — refine
    an uncertain pose per view with fit_pose first.
    """
    targets = jnp.asarray(targets, jnp.float32) / 255.0
    size = int(scene.config.size)
    if targets.ndim != 4 or targets.shape[1:] != (size, size, 3):
        raise ValueError(
            f"targets must be (K, {size}, {size}, 3), got {targets.shape}")
    K = int(targets.shape[0])
    cameras = list(cameras)
    if len(cameras) != K:
        raise ValueError(
            f"{K} target views but {len(cameras)} cameras")
    if pool < 1 or size % pool != 0:
        raise ValueError(f"pool {pool} must divide the size {size}")
    ss, _linear_pooled = _ss_setup(scene, size)

    def _pooled(img):
        if pool > 1:
            o = size // pool
            img = img.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
        return img

    targets_pooled = jax.vmap(_pooled)(targets)

    cfg = scene.config
    static, params0 = flatten_scene(scene)
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    inv_vps = cam_ops.inv_view_projection_host_batch(
        np.asarray([c.camera for c in cameras], np.float32),
        np.asarray([c.target for c in cameras], np.float32),
        np.asarray([c.up for c in cameras], np.float32),
        np.asarray([c.fov for c in cameras], np.float32))
    dirs = jax.vmap(lambda m: cam_ops.ray_grid(size * ss, m))(
        jnp.asarray(inv_vps))
    cam_pos = jnp.asarray([c.camera for c in cameras], jnp.float32)
    if mesh is not None:
        n_dev = mesh.devices.size
        if K % n_dev:
            raise ValueError(
                f"fit_scene_multiview: {K} views must divide the mesh "
                f"({n_dev} devices) so every device owns whole views")
        shard = lambda a: jax.device_put(  # noqa: E731
            a, _pixel_sharding(mesh, jnp.ndim(a)))
        dirs = shard(dirs)
        cam_pos = shard(cam_pos)
        targets_pooled = shard(targets_pooled)
    if max_steps is not None:
        trip_bound = max_steps
    else:
        trip_bound = step_bound_for_scene(scene)
        if "axis" in fit_fields:
            # static trip bound vs fitted chord growth: same 2x headroom
            # as fit_scene
            from .diff import conservative_step_bound

            max_axis = max(
                (max(gi.galaxy.params.axis) for gi in scene.instances),
                default=1.0,
            )
            trip_bound = conservative_step_bound(
                cfg.ray_step, cfg.min_ray_step, 2.0 * max_axis
            )
    f = jnp.float32

    _check_march_fields(march, fit_fields)
    if march == "frozen":
        # Per-view frozen noise: each view has its own fixed ray grid and
        # camera origin, so the precompute vmaps over the view axis — K
        # field sets, K x the single-fit precompute memory. Under mesh=
        # the vmapped precompute inherits the view sharding of dirs/
        # cam_pos, so each device freezes only its own views.
        from .tensor_march import (
            check_frozen_fields,
            precompute_frozen,
            render_rays_tensor_frozen,
        )

        check_frozen_fields(static, fit_fields)
        _pf = jax.vmap(lambda d_v, c_v: precompute_frozen(
            static, params, d_v, c_v, f(cfg.ray_step), f(cfg.min_ray_step),
            trip_bound))
        frozen = jax.block_until_ready(jax.jit(_pf)(dirs, cam_pos))

        def march_view(p, dirs_v, cam_v, fz):
            return render_rays_tensor_frozen(
                static, p, dirs_v, cam_v, f(cfg.ray_step),
                f(cfg.min_ray_step), trip_bound, fz)
    else:
        _march = _march_fn(march)
        frozen = None

        def march_view(p, dirs_v, cam_v, fz):
            return _march(static, p, dirs_v, cam_v, f(cfg.ray_step),
                          f(cfg.min_ray_step), trip_bound)

    def view_loss(p, dirs_v, cam_v, t_v, *fz):
        linear = _linear_pooled(
            march_view(p, dirs_v, cam_v, fz[0] if fz else None))
        img = post_process_float(
            linear, f(cfg.exposure), f(cfg.gamma), f(cfg.saturation)
        ) / 255.0
        return jnp.mean((_pooled(img) - t_v) ** 2)

    # the K frozen field sets (K x ~134 MB at 128^2) ride _optimize's
    # ``captures`` — closed over, they would be inlined into the compile
    # payload (the axon tunnel 413s at K=4)
    captures = () if frozen is None else (frozen,)

    def loss_fn(p, *cap):
        if cap:
            losses = jax.vmap(view_loss, in_axes=(None, 0, 0, 0, 0))(
                p, dirs, cam_pos, targets_pooled, cap[0])
        else:
            losses = jax.vmap(view_loss, in_axes=(None, 0, 0, 0))(
                p, dirs, cam_pos, targets_pooled)
        return jnp.mean(losses)

    mask = _fit_mask(params, fit_fields)
    params = _project_bounds(params, fit_fields)
    best_params, losses = _optimize(
        loss_fn, params, mask, steps=steps, lr=lr, optimizer=optimizer,
        on_step=on_step,
        project_fn=lambda p: _project_bounds(p, fit_fields),
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        fingerprint=_fit_fingerprint(
            "mview", fit_fields, lr, march, size, params, targets,
            extra=(f"pool{pool}|lod{cfg.noise_octaves}|K{K}"
                   + (f"|ss{ss}" if ss > 1 else "")),
            aux=(tuple((c.camera, c.target, c.up, c.fov) for c in cameras),
                 cfg.ray_step, cfg.min_ray_step, cfg.exposure, cfg.gamma,
                 cfg.saturation, trip_bound)),
        captures=captures,
    )

    fitted = jax.tree_util.tree_map(np.asarray, best_params)
    return FitResult(
        scene=apply_fit_to_scene(scene, fitted, fit_fields),
        params=fitted,
        losses=losses,
        fit_fields=tuple(fit_fields),
    )


POSE_FITTABLE = ("camera", "target", "fov")


def fit_pose(
    scene: Scene,
    target_image,
    fit_fields: Sequence[str] = ("camera", "target"),
    *,
    steps: int = 100,
    lr: float = 2e-2,
    max_steps: Optional[int] = None,
    optimizer=None,
    on_step: Optional[Callable[[int, float], None]] = None,
    normalize: bool = True,
    pool: int = 1,
    march: str = "tensor",
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """Refine the camera pose toward the one that produced ``target_image``.

    ``checkpoint_path``/``checkpoint_every``: exact-resume optimizer
    checkpoints, as in fit_scene.

    ``mesh`` (1-D) shards the training step's pixel rows across devices
    exactly like fit_scene's — here the ray grid is itself a function of
    the fitted pose, so it is sharding-constrained in-graph instead of
    committed as an input.

    The whole camera chain is in-graph (ops/camera.inv_view_projection is
    plain jnp), so gradients flow target pixels -> post -> march -> ray
    grid -> view matrix -> camera/target/fov. The up vector stays fixed
    (it gauges roll together with target). Galaxy parameters are held
    constant. Returns a FitResult whose scene carries the fitted
    CameraParams; ``params`` is the fitted pose dict.

    This is LOCAL refinement, and the loss landscape demands two cautions:

    - Full-octave noise decorrelates under millimeter camera moves, so the
      image-space gradient is noise-dominated. Fit with a LOD cap
      (``scene.config.noise_octaves`` of 2-4) so the volume is smooth at
      the displacement scale, then re-render at full quality. Measured
      (full-quality 16^2 target, LOD-3 normalized fit): position error
      0.049 -> 0.011 in 40 steps, vs a random walk at full octaves.
    - fov and camera distance are near-ambiguous (dolly-zoom): fitting
      both lets the optimizer trade one against the other. Fit
      ("camera",) alone when fov is known.

    ``normalize`` (default on) compares mean-normalized images: fitting at
    an LOD against a full-quality target shifts global brightness (capped
    dust absorbs less), and an un-normalized MSE chases that gain with
    pose instead of aligning structure. ``pool`` box-averages both images
    by the given factor first (must divide size), low-passing the fine
    grain the LOD render does not model.
    """
    wanted = set(fit_fields)
    unknown = wanted - set(POSE_FITTABLE)
    if unknown:
        raise ValueError(
            f"unknown pose fields {sorted(unknown)}; fittable: {POSE_FITTABLE}"
        )

    target = jnp.asarray(np.asarray(target_image, np.float32) / 255.0)
    size = target.shape[0]
    if target.shape != (size, size, 3) or size != scene.config.size:
        raise ValueError(
            f"target must be ({scene.config.size}, {scene.config.size}, 3), "
            f"got {target.shape}"
        )
    if pool < 1 or size % pool != 0:
        raise ValueError(f"pool {pool} must divide the size {size}")
    ss, _linear_pooled = _ss_setup(scene, size)

    def _prep(img):
        if pool > 1:
            o = size // pool
            img = img.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
        if normalize:
            img = img / (jnp.mean(img) + 1e-6)
        return img

    target_prepped = _prep(target)
    dirs_sharding = None
    if mesh is not None:
        _check_mesh_divides(mesh, size, pool, "fit_pose")
        dirs_sharding = _pixel_sharding(mesh, 3)
        target_prepped = jax.device_put(
            target_prepped, _pixel_sharding(mesh, target_prepped.ndim))

    cfg = scene.config
    static, gal_params = flatten_scene(scene)
    gal_params = jax.tree_util.tree_map(jnp.asarray, gal_params)
    up = jnp.asarray(scene.camera.up, jnp.float32)
    pose = {
        "camera": jnp.asarray(scene.camera.camera, jnp.float32),
        "target": jnp.asarray(scene.camera.target, jnp.float32),
        "fov": jnp.asarray(scene.camera.fov, jnp.float32),
    }
    trip_bound = max_steps if max_steps is not None else step_bound_for_scene(scene)
    f = jnp.float32

    march_fn = _march_fn(march)

    def loss_fn(p):
        inv_vp = cam_ops.inv_view_projection(p["camera"], p["target"], up,
                                             p["fov"])
        dirs = cam_ops.ray_grid(size * ss, inv_vp)
        if dirs_sharding is not None:
            dirs = jax.lax.with_sharding_constraint(dirs, dirs_sharding)
        linear = _linear_pooled(march_fn(
            static, gal_params, dirs, p["camera"], f(cfg.ray_step),
            f(cfg.min_ray_step), trip_bound,
        ))
        img = post_process_float(
            linear, f(cfg.exposure), f(cfg.gamma), f(cfg.saturation)
        ) / 255.0
        return jnp.mean((_prep(img) - target_prepped) ** 2)

    mask = {k: jnp.float32(1.0 if k in wanted else 0.0) for k in pose}

    def project(p):
        # domain-constrain ONLY fitted fields: clipping an unfitted fov
        # would silently mutate a parameter the caller asked us to freeze
        if "fov" in wanted:
            p = dict(p, fov=jnp.clip(p["fov"], 5.0, 170.0))
        return p

    best_pose, losses = _optimize(
        loss_fn, pose, mask, steps=steps, lr=lr, optimizer=optimizer,
        on_step=on_step, project_fn=project,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        fingerprint=_fit_fingerprint(
            "pose", fit_fields, lr, march, size,
            # the held-constant galaxy params ARE the pose loss surface —
            # a checkpoint from a different .gax must not resume
            {"pose": pose, "galaxy": gal_params}, target,
            extra=(f"pool{pool}|lod{cfg.noise_octaves}"
                   f"|norm{int(normalize)}"
                   + (f"|ss{ss}" if ss > 1 else "")),
            aux=(scene.camera.up, cfg.ray_step, cfg.min_ray_step,
                 cfg.exposure, cfg.gamma, cfg.saturation, trip_bound)),
    )

    fitted_pose = jax.tree_util.tree_map(np.asarray, best_pose)
    new_scene = copy.deepcopy(scene)
    new_scene.camera.camera = tuple(float(v) for v in fitted_pose["camera"])
    new_scene.camera.target = tuple(float(v) for v in fitted_pose["target"])
    new_scene.camera.fov = float(fitted_pose["fov"])
    return FitResult(scene=new_scene, params=fitted_pose, losses=losses,
                     fit_fields=tuple(fit_fields))


def fit_pose_fd(
    scene: Scene,
    target_image,
    fit_fields: Sequence[str] = ("camera",),
    *,
    steps: int = 60,
    lr: float = 1e-2,
    eps: float = 1.0,
    on_step: Optional[Callable[[int, float], None]] = None,
    normalize: bool = True,
    pool: int = 1,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """Pose refinement by central differences through the PRODUCTION kernel.

    fit_pose differentiates the march in reverse mode, which is exact but
    (a) needs a noise LOD — full-octave simplex decorrelates under
    sub-pixel camera moves, so the infinitesimal pose gradient is noise —
    and (b) pays the differentiable march (seconds per step at exact
    quality). This variant descends the SECANT gradient instead: every
    fitted pose scalar is probed at ±eps where eps defaults to ONE PIXEL
    of image motion (``eps`` scales it) — far above the noise correlation
    length, so the probe difference reads the structure-alignment slope of
    the loss basin rather than the noise. That makes it stable at FULL
    octaves with no LOD ladder, and it needs no differentiable march at
    all: the 2K+1 probe frames render as ONE batched launch of the
    production Pallas kernel per step (engine/batch.render_batch_linear),
    so a 128² camera-only step is a 7-frame batch — the same executable
    every step.

    The optimizer is host-side Adam on the K pose scalars with the same
    relative stepping as ``_optimize`` (eager device ops on K scalars
    would pay a tunnel round trip each). ``mesh`` batch-shards the probe
    frames. Checkpoints resume exactly (the host optimizer moments are in
    the file). The trade vs fit_pose: two loss evaluations per degree of
    freedom per step instead of one reverse sweep — a win while K is
    small (pose K ≤ 7) and each evaluation is a production-kernel frame.

    No reference analog (the reference has no camera estimation at all);
    the probe-batch shape is the TPU-native replacement for its
    interactive orbit (mainwindow.cpp camera tab).
    """
    import dataclasses
    import math

    from .batch import render_batch_linear

    wanted = set(fit_fields)
    unknown = wanted - set(POSE_FITTABLE)
    if unknown:
        raise ValueError(
            f"unknown pose fields {sorted(unknown)}; fittable: {POSE_FITTABLE}"
        )

    target = np.asarray(target_image, np.float32) / 255.0
    size = target.shape[0]
    if target.shape != (size, size, 3) or size != scene.config.size:
        raise ValueError(
            f"target must be ({scene.config.size}, {scene.config.size}, 3), "
            f"got {target.shape}"
        )
    if pool < 1 or size % pool != 0:
        raise ValueError(f"pool {pool} must divide the size {size}")

    cfg = scene.config
    # all persisted state is float32: _ckpt_load round-trips f32 exactly,
    # so a resumed run replays the uninterrupted trajectory bitwise (the
    # per-step update math may promote internally — it is a deterministic
    # function of the f32 state either way)
    pose = {
        "camera": np.asarray(scene.camera.camera, np.float32),
        "target": np.asarray(scene.camera.target, np.float32),
        "fov": np.asarray(float(scene.camera.fov), np.float32),
    }
    # fixed probe order: the checkpoint fingerprint and the FD gradient
    # layout both key on it
    dims = [(f_, i) for f_, n in (("camera", 3), ("target", 3), ("fov", 1))
            if f_ in wanted for i in range(n)]
    K = len(dims)

    # eps = one pixel of image motion per probe: transverse displacement
    # dist·(2·tan(fov/2)/size) for position scalars, 2·(2·tan(fov/2)/size)
    # of field angle for fov (one pixel of edge zoom)
    dist = float(np.linalg.norm(pose["camera"] - pose["target"]))
    px_angle = 2.0 * math.tan(math.radians(float(pose["fov"])) / 2.0) / size
    eps_pos = float(eps) * max(dist, 1e-3) * px_angle
    eps_fov = float(eps) * math.degrees(2.0 * px_angle)

    def _eps(field_name: str) -> float:
        return eps_fov if field_name == "fov" else eps_pos

    # target prep mirrors fit_pose's _prep (pool then normalize), host-side
    tprep = target
    if pool > 1:
        o = size // pool
        tprep = tprep.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
    if normalize:
        tprep = tprep / (tprep.mean() + 1e-6)
    tprep_j = jnp.asarray(tprep)

    f = jnp.float32

    @jax.jit
    def losses_of(linear):
        # (B, S, S, 3) linear -> (B,) MSE vs the prepped target, ON DEVICE:
        # only 2K+1 scalars cross the link per step
        img = post_process_float(
            linear, f(cfg.exposure), f(cfg.gamma), f(cfg.saturation)
        ) / 255.0
        if pool > 1:
            o = size // pool
            img = img.reshape(-1, o, pool, o, pool, 3).mean(axis=(2, 4))
        if normalize:
            img = img / (jnp.mean(img, axis=(1, 2, 3), keepdims=True) + 1e-6)
        return jnp.mean((img - tprep_j) ** 2, axis=(1, 2, 3))

    def probe_scenes(p):
        cams = [p]
        for field_name, i in dims:
            for sgn in (1.0, -1.0):
                q = {k: v.copy() for k, v in p.items()}
                if field_name == "fov":
                    q["fov"] = q["fov"] + sgn * eps_fov
                else:
                    q[field_name][i] += sgn * eps_pos
                cams.append(q)
        return [dataclasses.replace(scene, camera=CameraParams(
            camera=tuple(float(v) for v in q["camera"]),
            target=tuple(float(v) for v in q["target"]),
            up=scene.camera.up, fov=float(q["fov"]))) for q in cams]

    def project(p):
        if "fov" in wanted:
            p["fov"] = np.asarray(np.clip(p["fov"], 5.0, 170.0), np.float32)
        return p

    def _theta(p):
        return np.array([float(p[f_]) if f_ == "fov" else p[f_][i]
                         for f_, i in dims], np.float64)

    # host Adam with _optimize's relative stepping (lr = per-step relative
    # change; pose scalars span ~0.01..90)
    rel = np.maximum(np.abs(_theta(pose)), 0.1)
    m = np.zeros(K, np.float32)
    v = np.zeros(K, np.float32)
    t = 0
    b1, b2, aeps = 0.9, 0.999, 1e-8

    _, gal_params = flatten_scene(scene)
    fingerprint = _fit_fingerprint(
        "posefd", fit_fields, lr, "fd", size,
        {"pose": pose, "galaxy": gal_params}, target,
        extra=(f"pool{pool}|norm{int(normalize)}"
               f"|eps{eps_pos:g},{eps_fov:g}|ss{cfg.supersample}"),
        aux=(scene.camera.up, cfg.ray_step, cfg.min_ray_step,
             cfg.exposure, cfg.gamma, cfg.saturation))

    losses: List[float] = []
    best_loss = np.inf
    best_pose = {k: np.asarray(v_).copy() for k, v_ in pose.items()}
    start = 0
    if checkpoint_path:
        resumed = _ckpt_load(checkpoint_path, fingerprint, pose,
                             {"m": m, "t": np.int64(t), "v": v}, best_pose)
        if resumed is not None:
            start, pose_j, opt_j, losses, bl, best_j = resumed
            # np.array, not asarray: a numpy view of a jax array is
            # read-only, and the loop writes pose[field][i] in place
            pose = {k: np.array(v_, np.float32) for k, v_ in pose_j.items()}
            m = np.array(opt_j["m"], np.float32)
            v = np.array(opt_j["v"], np.float32)
            t = int(opt_j["t"])
            best_loss = float(bl)
            best_pose = {k: np.array(v_, np.float32)
                         for k, v_ in best_j.items()}
            if start > steps:
                raise ValueError(
                    f"checkpoint {checkpoint_path} already holds {start} "
                    f"steps but only {steps} were requested — increase "
                    f"steps to extend the run, or delete the checkpoint "
                    f"to start over")

    aborted = False
    for i in range(start, steps):
        L = np.asarray(losses_of(render_batch_linear(probe_scenes(pose),
                                                     mesh=mesh)), np.float64)
        losses.append(float(L[0]))
        if L[0] < best_loss:
            best_loss = float(L[0])
            best_pose = {k: v_.copy() for k, v_ in pose.items()}
        g = np.array([(L[1 + 2 * k] - L[2 + 2 * k]) / (2.0 * _eps(dims[k][0]))
                      for k in range(K)])
        g = np.nan_to_num(g)
        t += 1
        m = (b1 * m + (1 - b1) * g).astype(np.float32)
        v = (b2 * v + (1 - b2) * g * g).astype(np.float32)
        upd = lr * (m / (1 - b1 ** t)) / (np.sqrt(v / (1 - b2 ** t)) + aeps)
        theta = _theta(pose) - upd * rel
        for k, (f_, ax) in enumerate(dims):
            if f_ == "fov":
                pose["fov"] = np.asarray(theta[k], np.float32)
            else:
                pose[f_][ax] = np.float32(theta[k])
        pose = project(pose)
        if checkpoint_path and ((i + 1) % max(1, checkpoint_every) == 0
                                or i + 1 == steps):
            _ckpt_save(checkpoint_path, fingerprint, i + 1, pose,
                       {"m": m, "t": np.int64(t), "v": v}, losses,
                       best_loss, best_pose)
        if on_step is not None and on_step(i, losses[-1]) is False:
            aborted = True
            break
    if not aborted:
        # the final iterate's loss was never seen by the loop (same B
        # launch — a 1-frame eval would compile a second executable)
        L = np.asarray(losses_of(render_batch_linear(probe_scenes(pose),
                                                     mesh=mesh)), np.float64)
        losses.append(float(L[0]))
        if L[0] < best_loss:
            best_loss = float(L[0])
            best_pose = {k: v_.copy() for k, v_ in pose.items()}

    fitted = {k: np.asarray(v_, np.float32) for k, v_ in best_pose.items()}
    new_scene = copy.deepcopy(scene)
    new_scene.camera.camera = tuple(float(v_) for v_ in fitted["camera"])
    new_scene.camera.target = tuple(float(v_) for v_ in fitted["target"])
    new_scene.camera.fov = float(fitted["fov"])
    return FitResult(scene=new_scene, params=fitted, losses=losses,
                     fit_fields=tuple(fit_fields))


# Vector-valued fittable leaves and their lengths (everything else is a
# scalar); used by fit_scene_fd's probe-dimension enumeration.
_FD_VECTOR_FIELDS = {"position": 3, "axis": 3, "arms": 4, "spec": 3}

# Leaves whose NONZERO-ness is compiled into SceneStatic (scene_prep.py:
# arm_enabled / winding_enabled): an FD probe or update crossing zero would
# change the executable AND the semantics mid-fit, so these stay on their
# initial sign.
_FD_SIGN_STATIC = frozenset({"winding", "arm"})


def fit_scene_fd(
    scene: Scene,
    target_image,
    fit_fields: Sequence[str] = ("winding_b", "winding_n"),
    *,
    steps: int = 60,
    lr: float = 2e-2,
    eps: float = 0.05,
    sweep: int = 0,
    sweep_span: float = 0.5,
    sweep_rounds: int = 3,
    sweep_groups: Optional[Sequence[Sequence[str]]] = None,
    on_step: Optional[Callable[[int, float], None]] = None,
    normalize: bool = False,
    pool: int = 1,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """Scene-parameter fitting by central differences through the
    PRODUCTION Pallas kernel — the trustworthy fast path for the chaotic
    structure fields.

    fit_scene's differentiable marches cover the default strength/r0/z0
    family well, but the spiral-DEFINING knobs are exactly the ones they
    handle worst: winding/winding_b/winding_n gradients diverge under the
    tensor march's reassociation (chaotic sensitivity — _check_march_fields
    warns and routes to the slow sequential scan), and scale/ks move the
    noise inputs, so the frozen march excludes them and infinitesimal
    autodiff through full-octave noise reads decorrelation noise rather
    than structure (galaxycomponent.h:156-165 is the reference math that
    makes these fields the structure-critical set). This is the same
    problem fit_pose_fd solved for camera scalars, generalized: probe every
    fitted scalar at ±h where h is a RELATIVE step (``eps``·max(|θ|, 0.1) —
    a few percent of the value, far above the noise correlation length),
    render all 2K+1 probes as ONE batched production-kernel launch per step
    (engine/batch.render_batch_linear — parameter changes never recompile),
    and run host-side Adam on the K scalars with fit_pose_fd's relative
    stepping. No differentiable march, no LOD ladder, full production
    quality and speed.

    Field handling: any FITTABLE_FIELDS leaf is accepted (per-component
    scalars probe one dim per active component; position/axis/arms/spec
    probe per vector lane). Bounded leaves (_FIT_BOUNDS) keep their probes
    and updates above the bound (the FD denominator uses the actual probe
    spread). winding/arm keep their initial sign — their nonzero-ness is
    part of the compiled structure (scene_prep CompStatic) — and dims whose
    initial value is exactly 0 are dropped with a warning (the flag is off;
    the render is insensitive to them).

    ``sweep``: the chaotic fields' loss landscapes are hostile to pure
    local descent in THREE measured ways (Spiral, 128^2, production
    kernel): winding_b has a SPURIOUS basin at 1.42x truth that captures
    any start beyond ~1.2x (arm aliasing, present at every loss pooling);
    per-component scale has a funnel only ~2% wide around truth with
    noise-decorrelation bumps outside it; and the two COUPLE deceptively —
    with every scale at 1.2x, the loss-vs-winding_b minimum sits at 0.74x
    truth, so no per-coordinate method (descent OR exhaustive coordinate
    search) can reach the joint minimum. A nonzero ``sweep`` prepends a
    staged global search, every stage a handful of batched
    production-kernel launches:

      stage 0 (only with ``sweep_groups``): a JOINT Cartesian grid over
        grouped super-dims — each group is a set of field names moved by
        one COMMON relative multiplier (e.g. ``(("winding_b",),
        ("scale",))`` grids spiral geometry against a global noise-scale
        factor, the measured deceptive pair). ``sweep`` points per group;
        grids above 4096 frames are rejected.
      stage 1: ``sweep_rounds`` ZOOMING per-dim coordinate sweeps —
        ``sweep`` points spanning +-``sweep_span`` (relative, floored
        like the FD probes), one launch per (dim, round), span shrinking
        to 2x the previous grid's resolution each round, a move accepted
        only if it beats the current point.

    The sweeps land inside the true funnel; the FD descent then polishes
    (use a small ``eps``, ~0.01, when sweeping — the probes must sit
    inside the funnel).

    No reference analog; completes the inverse-rendering suite for the
    parameter family the reference itself documents as "what makes it a
    spiral" (TabGalaxyHelp.txt winding section).
    """
    import warnings

    from .batch import render_batch_linear

    wanted = set(fit_fields)
    unknown = wanted - set(FITTABLE_FIELDS)
    if unknown:
        raise ValueError(
            f"unknown fit fields {sorted(unknown)}; fittable: {FITTABLE_FIELDS}"
        )

    target = np.asarray(target_image, np.float32) / 255.0
    size = target.shape[0]
    if target.shape != (size, size, 3) or size != scene.config.size:
        raise ValueError(
            f"target must be ({scene.config.size}, {scene.config.size}, 3), "
            f"got {target.shape}"
        )
    if pool < 1 or size % pool != 0:
        raise ValueError(f"pool {pool} must divide the size {size}")

    cfg = scene.config
    _, params0 = flatten_scene(scene)
    # mutable float64 working copy (written scalar-wise by the probe loop)
    params0 = jax.tree_util.tree_map(
        lambda a: np.array(a, np.float64), params0)

    # --- probe-dimension enumeration (fixed order: checkpoint + gradient
    # layout key on it) ---------------------------------------------------
    dims: List[tuple] = []  # (inst_k, field, comp_j | None, lane_i | None)
    dropped = []
    for k, pr in enumerate(params0):
        for fld in INSTANCE_FITTABLE:
            if fld not in wanted:
                continue
            n = _FD_VECTOR_FIELDS.get(fld)
            dims += [(k, fld, None, i) for i in range(n)] if n else [
                (k, fld, None, None)]
        for j, cp in enumerate(pr["comps"]):
            for fld in COMP_FITTABLE:
                if fld not in wanted:
                    continue
                if fld in _FD_SIGN_STATIC and float(cp[fld]) == 0.0:
                    dropped.append((k, j, fld))
                    continue
                n = _FD_VECTOR_FIELDS.get(fld)
                dims += [(k, fld, j, i) for i in range(n)] if n else [
                    (k, fld, j, None)]
    if dropped:
        warnings.warn(
            f"fit_scene_fd: dropping zero-valued structure-flag dims "
            f"{dropped} — winding/arm nonzero-ness is compiled structure "
            f"and the render is insensitive to a disabled flag's value",
            RuntimeWarning, stacklevel=2)
    K = len(dims)
    if K == 0:
        raise ValueError("no probe dimensions: fit_fields matched nothing")

    def _get(params, dim) -> float:
        k, fld, j, i = dim
        node = params[k]["comps"][j][fld] if j is not None else params[k][fld]
        return float(node if i is None else node[i])

    def _set(params, dim, val: float) -> None:
        k, fld, j, i = dim
        tgt = params[k]["comps"][j] if j is not None else params[k]
        if i is None:
            tgt[fld] = np.float64(val)
        else:
            tgt[fld][i] = val

    def _theta(params):
        return np.array([_get(params, d) for d in dims], np.float64)

    def _clamp(dim, val: float) -> float:
        fld = dim[1]
        lo = _FIT_BOUNDS.get(fld)
        if lo is not None:
            val = max(val, lo)
        if fld in _FD_SIGN_STATIC:
            s = np.sign(_get(params0, dim)) or 1.0
            val = s * max(s * val, 1e-4)  # stay on the initial sign
        return val

    theta = _theta(params0)

    def params_of(th):
        p = jax.tree_util.tree_map(lambda a: np.array(a), params0)
        for d, v in zip(dims, th):
            _set(p, d, v)
        return p

    # --- device loss (identical shape to fit_pose_fd's) -------------------
    tprep = target
    if pool > 1:
        o = size // pool
        tprep = tprep.reshape(o, pool, o, pool, 3).mean(axis=(1, 3))
    if normalize:
        tprep = tprep / (tprep.mean() + 1e-6)
    tprep_j = jnp.asarray(tprep)
    f = jnp.float32

    @jax.jit
    def losses_of(linear):
        img = post_process_float(
            linear, f(cfg.exposure), f(cfg.gamma), f(cfg.saturation)
        ) / 255.0
        if pool > 1:
            o = size // pool
            img = img.reshape(-1, o, pool, o, pool, 3).mean(axis=(2, 4))
        if normalize:
            img = img / (jnp.mean(img, axis=(1, 2, 3), keepdims=True) + 1e-6)
        return jnp.mean((img - tprep_j) ** 2, axis=(1, 2, 3))

    def _h(th):
        return float(eps) * np.maximum(np.abs(th), 0.1)

    def probe_scenes(th):
        """[current, +h/-h per dim] as Scenes sharing ONE static."""
        h = _h(th)
        out = [apply_fit_to_scene(scene, params_of(th), fit_fields)]
        spreads = np.empty(K, np.float64)
        for kd, d in enumerate(dims):
            vp = _clamp(d, th[kd] + h[kd])
            vm = _clamp(d, th[kd] - h[kd])
            spreads[kd] = vp - vm
            for v in (vp, vm):
                tq = th.copy()
                tq[kd] = v
                out.append(apply_fit_to_scene(scene, params_of(tq),
                                              fit_fields))
        return out, spreads

    # --- host Adam with relative stepping ---------------------------------
    rel = np.maximum(np.abs(theta), 0.1)
    m = np.zeros(K, np.float32)
    v = np.zeros(K, np.float32)
    t = 0
    b1, b2, aeps = 0.9, 0.999, 1e-8

    fingerprint = _fit_fingerprint(
        "scenefd", fit_fields, lr, "fd", size, params0, target,
        extra=(f"pool{pool}|norm{int(normalize)}|eps{eps:g}"
               f"|sw{sweep}x{sweep_span:g}r{sweep_rounds}"
               f"g{'/'.join(','.join(sorted(g)) for g in (sweep_groups or ()))}"
               f"|ss{cfg.supersample}"),
        aux=(scene.camera.camera, scene.camera.target, scene.camera.up,
             scene.camera.fov, cfg.ray_step, cfg.min_ray_step,
             cfg.exposure, cfg.gamma, cfg.saturation))

    losses: List[float] = []
    best_loss = np.inf
    best_theta = theta.copy()
    start = 0
    if checkpoint_path:
        resumed = _ckpt_load(checkpoint_path, fingerprint, {"th": theta},
                             {"m": m, "t": np.int64(t), "v": v},
                             {"th": best_theta})
        if resumed is not None:
            start, th_j, opt_j, losses, bl, best_j = resumed
            theta = np.array(th_j["th"], np.float64)
            m = np.array(opt_j["m"], np.float32)
            v = np.array(opt_j["v"], np.float32)
            t = int(opt_j["t"])
            best_loss = float(bl)
            best_theta = np.array(best_j["th"], np.float64)
            if start > steps:
                raise ValueError(
                    f"checkpoint {checkpoint_path} already holds {start} "
                    f"steps but only {steps} were requested — increase "
                    f"steps to extend the run, or delete the checkpoint "
                    f"to start over")

    if sweep and start == 0:
        # zooming coordinate-sweep init (see docstring): sweep_rounds
        # batched launches of K*sweep ladder frames + the base, the span
        # shrinking each round to twice the previous round's resolution
        # (a per-coordinate golden-ish zoom). Each dim jumps to its own
        # argmin if it beats the base; recentering between rounds also
        # iterates out dim coupling, coordinate-descent style. Runs only
        # on a FRESH fit — a resumed checkpoint already holds the
        # post-sweep trajectory (and `rel` stays anchored to the
        # PRE-sweep theta either way, so resume replays bitwise).
        if sweep_groups:
            import itertools

            group_dims = []
            for grp in sweep_groups:
                gd = [kd for kd, d in enumerate(dims) if d[1] in set(grp)]
                if not gd:
                    raise ValueError(
                        f"sweep group {tuple(grp)} matches no probe dims")
                group_dims.append(gd)
            # the grid launch is capped at ~1024 frames (a 128^2 grid of
            # 1024 is ~200 MB of linear output); per-group points shrink
            # to fit — the per-dim zoom rounds recover the resolution
            g = len(group_dims)
            pts = int(sweep)
            while pts > 2 and pts ** g > 1024:
                pts -= 1
            mults = np.linspace(1.0 - float(sweep_span),
                                1.0 + float(sweep_span), pts)
            combos = list(itertools.product(range(pts), repeat=g))
            grid_scenes = []
            for combo in combos:
                tq = theta.copy()
                for gi, mi in enumerate(combo):
                    for kd in group_dims[gi]:
                        tq[kd] = _clamp(dims[kd], theta[kd] * mults[mi])
                grid_scenes.append(apply_fit_to_scene(
                    scene, params_of(tq), fit_fields))
            L = np.asarray(losses_of(render_batch_linear(
                grid_scenes, mesh=mesh)), np.float64)
            best = combos[int(np.argmin(L))]
            for gi, mi in enumerate(best):
                for kd in group_dims[gi]:
                    theta[kd] = _clamp(dims[kd], theta[kd] * mults[mi])

        span_r = float(sweep_span)
        for _round in range(int(sweep_rounds)):
            for kd, d in enumerate(dims):
                span = span_r * max(abs(theta[kd]), 0.1)
                vals = [_clamp(d, v) for v in np.linspace(
                    theta[kd] - span, theta[kd] + span, int(sweep))]
                ladder = [apply_fit_to_scene(scene, params_of(theta),
                                             fit_fields)]
                for v in vals:
                    tq = theta.copy()
                    tq[kd] = v
                    ladder.append(apply_fit_to_scene(
                        scene, params_of(tq), fit_fields))
                L = np.asarray(losses_of(render_batch_linear(
                    ladder, mesh=mesh)), np.float64)
                j = int(np.argmin(L[1:]))
                if L[1 + j] < L[0]:  # only ever improve on the base
                    theta[kd] = vals[j]
            # next round resolves 2x finer than this round's grid spacing
            span_r = 4.0 * span_r / max(int(sweep) - 1, 1)

    aborted = False
    for i in range(start, steps):
        scenes, spreads = probe_scenes(theta)
        L = np.asarray(losses_of(render_batch_linear(scenes, mesh=mesh)),
                       np.float64)
        losses.append(float(L[0]))
        if L[0] < best_loss:
            best_loss = float(L[0])
            best_theta = theta.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            g = np.where(spreads > 0,
                         (L[1::2] - L[2::2]) / spreads, 0.0)
        g = np.nan_to_num(g)
        t += 1
        m = (b1 * m + (1 - b1) * g).astype(np.float32)
        v = (b2 * v + (1 - b2) * g * g).astype(np.float32)
        upd = lr * (m / (1 - b1 ** t)) / (np.sqrt(v / (1 - b2 ** t)) + aeps)
        theta = theta - upd * rel
        theta = np.array([_clamp(d, th) for d, th in zip(dims, theta)],
                         np.float64)
        if checkpoint_path and ((i + 1) % max(1, checkpoint_every) == 0
                                or i + 1 == steps):
            _ckpt_save(checkpoint_path, fingerprint, i + 1, {"th": theta},
                       {"m": m, "t": np.int64(t), "v": v}, losses,
                       best_loss, {"th": best_theta})
        if on_step is not None and on_step(i, losses[-1]) is False:
            aborted = True
            break
    if not aborted:
        # score the final iterate with the SAME batch shape (a 1-frame
        # eval would compile a second executable)
        scenes, _ = probe_scenes(theta)
        L = np.asarray(losses_of(render_batch_linear(scenes, mesh=mesh)),
                       np.float64)
        losses.append(float(L[0]))
        if L[0] < best_loss:
            best_loss = float(L[0])
            best_theta = theta.copy()

    fitted_params = params_of(best_theta)
    fitted_params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), fitted_params)
    return FitResult(
        scene=apply_fit_to_scene(scene, fitted_params, fit_fields),
        params=fitted_params, losses=losses, fit_fields=tuple(fit_fields))


# (noise LOD, loss pool) rungs of the default pose ladder: coarse-noise +
# pooled loss first (wide, smooth basin for large displacements), then
# sharper rungs; LOD 0 = exact full-octave noise for the final polish.
DEFAULT_POSE_SCHEDULE = ((3, 4), (5, 2), (0, 1))


def fit_pose_multiscale(
    scene: Scene,
    target_image,
    fit_fields: Sequence[str] = ("camera",),
    *,
    steps: int = 40,
    lr: float = 1e-2,
    schedule: Sequence[Tuple[int, int]] = DEFAULT_POSE_SCHEDULE,
    max_steps: Optional[int] = None,
    optimizer=None,
    on_step: Optional[Callable[[int, float], None]] = None,
    normalize: bool = True,
    march: str = "tensor",
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """The LOD -> exact multiscale pose ladder as ONE call.

    fit_pose works only inside a basin where the rendered structure varies
    smoothly with the pose; full-octave noise decorrelates under mm-scale
    camera moves, so a single-LOD fit either needs a hand-picked LOD (too
    coarse: biased optimum; too fine: noise gradient). This runs the
    schedule of (noise LOD, loss pool) rungs, each rung starting from the
    previous rung's fitted pose: coarse+pooled rungs align gross structure
    across large displacements, the exact rung (LOD 0) removes the LOD
    bias. ``steps`` applies per rung; ``on_step`` sees a global step index.
    The returned scene keeps the CALLER's noise_octaves (the LOD caps are
    internal to the fit).

    Reproduces the PARITY.md round-1 workflow (manual LOD-3 fit then exact
    refine, position error 0.049 -> 0.011) in one invocation; the CLI
    exposes it as ``fitpose ... multiscale``.
    """
    import dataclasses

    if not schedule:
        raise ValueError("schedule must have at least one (lod, pool) rung")
    size = int(scene.config.size)
    current = scene
    all_losses: List[float] = []
    result: Optional[FitResult] = None
    base = 0
    aborted = False
    for lod, pool in schedule:
        pool = int(pool)
        while pool > 1 and size % pool:
            pool -= 1  # pooling must divide the frame; degrade gracefully
        # LOD 0 in a schedule means the exact rung — the schema spells
        # "exact octaves" as noise_octaves=None (0 is rejected)
        rung_scene = dataclasses.replace(
            current,
            config=dataclasses.replace(
                current.config,
                noise_octaves=int(lod) if int(lod) >= 1 else None))
        rung_cb = None
        if on_step is not None:
            # forward the cooperative-abort return value AND remember it,
            # so an abort inside a rung also stops the ladder
            def rung_cb(i, loss, b=base):
                nonlocal aborted
                r = on_step(b + i, loss)
                if r is False:
                    aborted = True
                return r
        result = fit_pose(
            rung_scene, target_image, fit_fields, steps=steps, lr=lr,
            max_steps=max_steps, optimizer=optimizer, on_step=rung_cb,
            normalize=normalize, pool=pool, march=march, mesh=mesh,
            # per-rung files: a completed rung short-circuits on restart
            # (its checkpoint already holds step == steps)
            checkpoint_path=(f"{checkpoint_path}.rung{base // steps}"
                             if checkpoint_path else None),
            checkpoint_every=checkpoint_every,
        )
        current = result.scene
        all_losses.extend(result.losses)
        base += steps
        if aborted:
            break
    final_scene = dataclasses.replace(
        result.scene,
        config=dataclasses.replace(result.scene.config,
                                   noise_octaves=scene.config.noise_octaves))
    return FitResult(scene=final_scene, params=result.params,
                     losses=all_losses, fit_fields=tuple(fit_fields))


# Resolution divisors of the default parameter-fit pyramid: descend mostly
# on the 16x-cheaper quarter-res forward model, refine at half, finish at
# full. Resolution rungs (unlike noise-LOD rungs) are UNBIASED for
# brightness-family fields: a box-downsampled target matches a
# coarse-pitch ray grid of the same full-octave volume, whereas capping
# octaves shifts the mean noise density and moves the optimum itself
# (measured at 128²: an LOD-4 rung drove disk strength 64% past truth and
# the exact rung could not recover it — that design was rejected).
DEFAULT_SCENE_SCHEDULE: Tuple[int, ...] = (4, 2, 1)


def fit_scene_multiscale(
    scene: Scene,
    target_image,
    fit_fields: Sequence[str] = DEFAULT_FIT_FIELDS,
    *,
    steps: int = 40,
    lr: float = 2e-2,
    schedule: Sequence[int] = DEFAULT_SCENE_SCHEDULE,
    max_steps: Optional[int] = None,
    optimizer=None,
    on_step: Optional[Callable[[int, float], None]] = None,
    march: str = "tensor",
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """Coarse-to-fine resolution pyramid for PARAMETER fitting, one call.

    Each ``schedule`` entry is a resolution divisor: the rung renders the
    scene at size/s against the box-downsampled target, so an s=4 rung
    costs 1/16 of a full-resolution step while descending the same (up to
    sampling pitch) objective; the final s=1 rung polishes at full
    resolution. ``steps`` applies per rung; each rung starts from the
    previous rung's fitted values. Each rung compiles its own forward
    model, so very short fits amortize better as one direct fit_scene —
    the pyramid pays off when step cost x step count dominates the rung
    compiles. CLI: ``fit ... multiscale``.
    """
    import dataclasses

    if not schedule:
        raise ValueError("schedule must have at least one resolution rung")
    size = int(scene.config.size)
    target = np.asarray(target_image, np.float32)
    current = scene
    all_losses: List[float] = []
    result: Optional[FitResult] = None
    base = 0
    aborted = False
    for s in schedule:
        s = int(s)
        while s > 1 and size % s:
            s -= 1  # divisor must tile the frame; degrade gracefully
        rsize = size // s
        rung_target = (
            target.reshape(rsize, s, rsize, s, 3).mean(axis=(1, 3))
            if s > 1 else target)
        rung_scene = dataclasses.replace(
            current,
            config=dataclasses.replace(current.config, size=rsize))
        rung_cb = None
        if on_step is not None:
            # forward the cooperative-abort return value AND remember it,
            # so an abort inside a rung also stops the ladder
            def rung_cb(i, loss, b=base):
                nonlocal aborted
                r = on_step(b + i, loss)
                if r is False:
                    aborted = True
                return r
        result = fit_scene(
            rung_scene, rung_target, fit_fields, steps=steps, lr=lr,
            max_steps=max_steps, optimizer=optimizer, on_step=rung_cb,
            march=march, mesh=mesh,
            checkpoint_path=(f"{checkpoint_path}.rung{base // steps}"
                             if checkpoint_path else None),
            checkpoint_every=checkpoint_every,
        )
        current = result.scene
        all_losses.extend(result.losses)
        base += steps
        if aborted:
            break
    final_scene = dataclasses.replace(
        result.scene,
        config=dataclasses.replace(result.scene.config, size=size))
    return FitResult(scene=final_scene, params=result.params,
                     losses=all_losses, fit_fields=tuple(fit_fields))


def fit_joint(
    scene: Scene,
    target_image,
    scene_fields: Sequence[str] = DEFAULT_FIT_FIELDS,
    *,
    rounds: int = 2,
    pose_steps: int = 30,
    scene_steps: int = 60,
    pose_lr: float = 1e-2,
    scene_lr: float = 2e-2,
    pose_schedule: Sequence[Tuple[int, int]] = DEFAULT_POSE_SCHEDULE,
    pose_method: str = "multiscale",
    march: str = "frozen",
    optimizer=None,
    on_step: Optional[Callable[[int, float], None]] = None,
    normalize: bool = True,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> FitResult:
    """UNKNOWN camera AND unknown galaxy parameters, one call: block-
    coordinate descent alternating pose ladders and parameter fits.

    The realistic inverse workflow — an image whose camera and physical
    parameters are both unknown (no reference analog; the reference
    hand-tunes in the GUI, mainwindow.cpp tabs). A truly joint gradient
    step is ill-conditioned here: pose gradients need a noise LOD (full-
    octave noise decorrelates under mm camera moves — fit_pose's
    docstring), while brightness-family parameter gradients are BIASED at
    a noise LOD (the rejected LOD param ladder, docs/PERF.md). Alternating
    blocks gives each subproblem its own valid regime:

      round r:  (a) fit_pose_multiscale over ``pose_schedule`` — holding
                    the galaxy fixed; ``normalize=True`` makes the pose
                    blocks insensitive to the not-yet-fitted brightness;
                (b) fit_scene at the fitted pose — holding the pose fixed;
                    ``march='frozen'`` is valid INSIDE a block (the camera
                    is constant there), so parameter steps run at frozen
                    speed; the fields are re-frozen each round at the new
                    pose.

    ``on_step(i, loss)`` sees a global step index over
    rounds * (pose_steps * len(pose_schedule) + scene_steps) steps and may
    return False to stop (cooperative abort, as everywhere).
    ``checkpoint_path`` writes per-block files (``.r<k>.pose`` /
    ``.r<k>.scene``); a completed block short-circuits on restart, so an
    interrupted joint fit resumes mid-ladder exactly like the multiscale
    ladders. Returns a FitResult whose scene carries BOTH the fitted
    camera and the fitted parameters; ``params`` is
    {"pose": pose dict, "scene": parameter pytree}.

    Fields that feed the noise inputs need ``march='tensor'`` (the frozen
    guard raises at block (b), same as fit_scene).

    ``pose_method='fd'`` replaces each pose ladder with ONE fit_pose_fd
    block (``pose_steps`` finite-difference steps at full quality through
    the production kernel — no LOD rungs, no differentiable march), the
    cheaper pose block whenever the camera is within the secant basin
    (~tens of pixels of image motion). Measured on the BASELINE joint-fit
    case (128² full quality, camera +0.055, strengths ×1.8):
    pose_method='fd' rounds=3 lands pos err 0.00081 / strength err 0.097
    in 10.3 min wall vs 50.5 min for the multiscale-pose baseline at
    worse errors (BASELINE.md; scripts/fit_joint_bench.py reproduces).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if pose_method not in ("multiscale", "fd"):
        raise ValueError(
            f"unknown pose_method {pose_method!r}; use 'multiscale' or 'fd'")
    _check_march_fields(march if march != "frozen" else "tensor",
                        scene_fields)  # frozen re-checked per block
    pose_block = (pose_steps * len(pose_schedule)
                  if pose_method == "multiscale" else pose_steps)
    current = scene
    all_losses: List[float] = []
    pose_params = None
    scene_params = None
    base = 0
    aborted = False

    def _block_cb(b):
        if on_step is None:
            return None

        def cb(i, loss):
            nonlocal aborted
            r = on_step(b + i, loss)
            if r is False:
                aborted = True
            return r
        return cb

    for r in range(rounds):
        pose_ckpt = (f"{checkpoint_path}.r{r}.pose"
                     if checkpoint_path else None)
        if pose_method == "fd":
            pres = fit_pose_fd(
                current, target_image, ("camera",), steps=pose_steps,
                lr=pose_lr, on_step=_block_cb(base), normalize=normalize,
                mesh=mesh, checkpoint_path=pose_ckpt,
                checkpoint_every=checkpoint_every,
            )
        else:
            pres = fit_pose_multiscale(
                current, target_image, ("camera",), steps=pose_steps,
                lr=pose_lr, schedule=pose_schedule, optimizer=optimizer,
                on_step=_block_cb(base), normalize=normalize, march="tensor",
                mesh=mesh,
                checkpoint_path=pose_ckpt,
                checkpoint_every=checkpoint_every,
            )
        current = pres.scene
        pose_params = pres.params
        all_losses.extend(pres.losses)
        base += pose_block
        if aborted:
            break
        sres = fit_scene(
            current, target_image, scene_fields, steps=scene_steps,
            lr=scene_lr, optimizer=optimizer, on_step=_block_cb(base),
            march=march, mesh=mesh,
            checkpoint_path=(f"{checkpoint_path}.r{r}.scene"
                             if checkpoint_path else None),
            checkpoint_every=checkpoint_every,
        )
        current = sres.scene
        scene_params = sres.params
        all_losses.extend(sres.losses)
        base += scene_steps
        if aborted:
            break
    return FitResult(
        scene=current,
        params={"pose": pose_params, "scene": scene_params},
        losses=all_losses,
        fit_fields=("camera",) + tuple(scene_fields),
    )


@dataclass
class JointMultiviewResult:
    """fit_joint_multiview outcome: fitted scene + per-view cameras."""

    scene: Scene                      # fitted galaxy (scene's own camera
    cameras: List[CameraParams]       # fitted per-view poses
    params: object                    # {"poses": [...], "scene": pytree}
    losses: List[float] = field(default_factory=list)
    fit_fields: Tuple[str, ...] = ()


def fit_joint_multiview(
    scene: Scene,
    targets,
    cameras: Sequence,
    scene_fields: Sequence[str] = DEFAULT_FIT_FIELDS,
    *,
    rounds: int = 2,
    pose_steps: int = 30,
    scene_steps: int = 60,
    pose_lr: float = 1e-2,
    scene_lr: float = 2e-2,
    march: str = "frozen",
    on_step: Optional[Callable[[int, float], None]] = None,
    normalize: bool = True,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> JointMultiviewResult:
    """K views with UNKNOWN per-view cameras AND shared unknown galaxy
    parameters — the full inverse-rendering problem, one call.

    Completes the suite: single-view pose (fit_pose/_fd) → single-view
    joint (fit_joint) → multi-view known-pose (fit_scene_multiview) →
    multi-view joint (this). Block-coordinate rounds:

      round r: (a) per-view pose blocks — each view's camera refined by
                   ONE fit_pose_fd run (production-kernel FD probes, no
                   LOD ladder) against ITS target, galaxy held fixed;
               (b) shared scene block — fit_scene_multiview at the K
                   refined poses (mean per-view MSE triangulates the 3-D
                   structure), cameras held fixed, so ``march='frozen'``
                   is valid inside the block and fields re-freeze per
                   round at the new poses (``mesh`` shards the view axis
                   here, exactly as in fit_scene_multiview).

    ``cameras`` are the K INITIAL pose guesses (each must be within
    fit_pose_fd's secant basin — tens of pixels of image motion).
    ``targets`` is (K, size, size, 3). ``on_step`` sees a global index
    over rounds * (K * pose_steps + scene_steps); ``checkpoint_path``
    writes per-block files (.r<k>.pose<v> / .r<k>.scene) with the same
    completed-block short-circuit as fit_joint. No reference analog.
    """
    import dataclasses as _dc

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    targets = np.asarray(targets)
    K = len(list(cameras))
    if targets.shape[0] != K:
        raise ValueError(
            f"{targets.shape[0]} targets for {K} cameras")
    cams: List[CameraParams] = list(cameras)
    current = scene
    all_losses: List[float] = []
    scene_params = None
    base = 0
    aborted = False

    def _block_cb(b):
        if on_step is None:
            return None

        def cb(i, loss):
            nonlocal aborted
            r = on_step(b + i, loss)
            if r is False:
                aborted = True
            return r
        return cb

    for r in range(rounds):
        for v in range(K):
            view_scene = _dc.replace(current, camera=cams[v])
            pres = fit_pose_fd(
                view_scene, targets[v], ("camera",), steps=pose_steps,
                lr=pose_lr, on_step=_block_cb(base), normalize=normalize,
                checkpoint_path=(f"{checkpoint_path}.r{r}.pose{v}"
                                 if checkpoint_path else None),
                checkpoint_every=checkpoint_every,
            )
            cams[v] = pres.scene.camera
            all_losses.extend(pres.losses)
            base += pose_steps
            if aborted:
                break
        if aborted:
            break
        sres = fit_scene_multiview(
            current, targets, cams, scene_fields, steps=scene_steps,
            lr=scene_lr, on_step=_block_cb(base), march=march, mesh=mesh,
            checkpoint_path=(f"{checkpoint_path}.r{r}.scene"
                             if checkpoint_path else None),
            checkpoint_every=checkpoint_every,
        )
        current = sres.scene
        scene_params = sres.params
        all_losses.extend(sres.losses)
        base += scene_steps
        if aborted:
            break
    return JointMultiviewResult(
        scene=current, cameras=cams,
        params={"poses": [{"camera": c.camera, "target": c.target,
                           "fov": c.fov} for c in cams],
                "scene": scene_params},
        losses=all_losses,
        fit_fields=("camera",) + tuple(scene_fields),
    )


def apply_fit_to_scene(scene: Scene, params, fit_fields: Sequence[str]) -> Scene:
    """Write fitted params back into a deep copy of ``scene``.

    Inverts scene_prep.flatten_scene's traversal: instances are matched in
    the same far->near sorted order, components through the same
    active/known/deterministic filter. A fitted ``spec`` leaf becomes a new
    named spectrum (``fit:<instance>:<component>``) registered in the
    scene's spectra table, since spectra are by-name in the schema.
    """
    from ..scene.spectra import BUILTIN_SPECTRA

    new_scene = copy.deepcopy(scene)
    # Undo potential aliasing: instances sharing one GalaxyData must not
    # receive each other's fitted values.
    for gi in new_scene.instances:
        gi.galaxy = copy.deepcopy(gi.galaxy)

    wanted = set(fit_fields)
    cam32 = np.asarray(scene.camera.camera, np.float32)
    order = sorted(
        range(len(new_scene.instances)),
        key=lambda i: -float(qm.length32(
            (np.asarray(new_scene.instances[i].position, np.float32) - cam32
             ).astype(np.float32)
        )),
    )
    if "spec" in wanted and new_scene.spectra is None:
        new_scene.spectra = dict(BUILTIN_SPECTRA)

    for k, inst_idx in enumerate(order):
        pr = params[k]
        gi = new_scene.instances[inst_idx]
        gp = gi.galaxy.params
        if "intensity_scale" in wanted:
            gi.intensity_scale = float(pr["intensity_scale"])
        if "position" in wanted:
            gi.position = tuple(float(v) for v in pr["position"])
        if "axis" in wanted:
            gp.axis = tuple(float(v) for v in pr["axis"])
        if "winding_b" in wanted:
            gp.winding_b = float(pr["winding_b"])
        if "winding_n" in wanted:
            gp.winding_n = float(pr["winding_n"])
        if "arms" in wanted:
            gp.arm1, gp.arm2, gp.arm3, gp.arm4 = (
                float(v) for v in pr["arms"]
            )

        fitted_comps = [
            cp for cp in gi.galaxy.components
            if cp.active == 1 and cp.cid >= 0
            and not (cp.cid == 6 and scene.config.deterministic)
        ]
        assert len(fitted_comps) == len(pr["comps"]), (
            "scene structure changed between flatten and write-back"
        )
        for j, (cp, cpp) in enumerate(zip(fitted_comps, pr["comps"])):
            for fname in COMP_FIELDS:
                if fname in wanted:
                    setattr(cp, fname, float(cpp[fname]))
            if "spec" in wanted:
                name = f"fit:{inst_idx}:{j}"
                new_scene.spectra[name] = tuple(float(v) for v in cpp["spec"])
                cp.spectrum = name
    return new_scene
