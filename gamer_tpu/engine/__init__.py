"""TPU render engine: XLA path, Pallas kernels, scene flattening."""

from .render import post_process, render_rays, render_scene  # noqa: F401
from .scene_prep import SceneStatic, flatten_scene  # noqa: F401


def __getattr__(name):
    # Lazy: the differentiable path + fitting pull in extra deps (optax)
    # that plain rendering never needs.
    if name in ("fit_scene", "fit_pose", "fit_pose_fd", "fit_scene_fd",
                "fit_scene_multiscale",
                "fit_pose_multiscale", "fit_scene_batch",
                "fit_scene_multiview", "fit_joint", "fit_joint_multiview",
                "apply_fit_to_scene", "FitResult", "BatchFitResult",
                "JointMultiviewResult"):
        from . import fit

        return getattr(fit, name)
    if name in ("render_rays_diff", "render_frame_diff", "post_process_float",
                "safe_pow", "conservative_step_bound", "step_bound_for_scene"):
        from . import diff

        return getattr(diff, name)
    raise AttributeError(name)
