"""TPU render engine: XLA path, Pallas kernels, scene flattening."""

from .render import post_process, render_rays, render_scene  # noqa: F401
from .scene_prep import SceneStatic, flatten_scene  # noqa: F401
