"""Render queue + progressive rendering — RenderQueue parity
(source/galaxy/renderqueue.{h,cpp}) and the progressive preview/progress
contract (rasterizer.cpp:283-313 DrawBox fill + percentDone polling).

TPU shape: a job list rendered in row chunks. Each chunk is one device
launch of a fixed shape (one compile, reused), which supplies the percent-
done/ETA progress the reference gets from its per-pixel counter, and the
progressive image the GUI preview shows. Jobs run sequentially like the
reference FIFO; the pixels inside a job are where the parallelism is.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

import jax.numpy as jnp

from ..post.stars import render_star_field
from ..scene.schema import CameraParams, Scene
from .render import post_process, render_rays
from .scene_prep import flatten_scene
from ..ops import camera as cam_ops

# (fraction done, partial image) -> False aborts the render (Rasterizer::Abort
# analog, rasterizer.h:91-98: cooperative cancellation between chunks)
ProgressFn = Callable[[float, np.ndarray], object]

# Skybox face definitions (renderqueue.cpp:129-173): target = camera + plane.
SKYBOX_FACES = (
    ("Z-", (0, 0, -1), (0, 1, 0)),
    ("Z+", (0, 0, 1), (0, 1, 0)),
    ("Y-", (0, 1, 0), (0, 0, -1)),
    ("Y+", (0, -1, 0), (0, 0, 1)),
    ("X-", (1, 0, 0), (0, 1, 0)),
    ("X+", (-1, 0, 0), (0, 1, 0)),
)


@dataclass
class RenderJob:
    scene: Scene
    filename: str  # without extension, like the reference queue items


def skybox_jobs(scene: Scene, prefix: str = "Skybox") -> List[RenderJob]:
    """Six cube-face jobs: fov 90, camera fixed, target = camera + axis."""
    jobs = []
    cam = np.asarray(scene.camera.camera, np.float64)
    for name, plane, up in SKYBOX_FACES:
        face_cam = CameraParams(
            camera=tuple(cam),
            target=tuple(cam + np.asarray(plane, np.float64)),
            up=up,
            fov=90.0,
        )
        face_scene = dataclasses.replace(scene, camera=face_cam)
        jobs.append(RenderJob(scene=face_scene, filename=f"{prefix}{name}"))
    return jobs


def render_progressive(scene: Scene, chunks: int = 16,
                       on_progress: Optional[ProgressFn] = None,
                       dtype=jnp.float32) -> np.ndarray:
    """Render a scene in row chunks, reporting progress after each chunk.

    Returns the final uint8 image. The partial image passed to on_progress
    has un-rendered rows black — the analog of the reference's progressive
    box-filled back buffer.
    """
    cfg = scene.config
    size = cfg.size
    ss = cfg.supersample
    static, params = flatten_scene(scene, dtype)
    camera = np.asarray(scene.camera.camera, dtype)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov,
        dtype=dtype)
    chunks = max(1, min(chunks, size))
    rows_per = -(-size // chunks)  # fixed chunk height -> one compiled shape
    f = lambda v: jnp.asarray(v, dtype)
    ray_step, min_step = f(cfg.ray_step), f(cfg.min_ray_step)

    import jax

    @jax.jit
    def chunk_linear(row0):
        # supersampled grid rows pool back down per chunk (row0 is an
        # OUTPUT row index; the ray grid runs at size*ss)
        n = size * ss
        ii = jnp.arange(n, dtype=dtype)
        jj = row0 * ss + jnp.arange(rows_per * ss, dtype=dtype)
        i_g, j_g = jnp.meshgrid(ii, jj, indexing="xy")
        dirs = cam_ops.coord2ray(i_g, j_g, n, inv_vp)
        lin = render_rays(static, params, dirs, camera, ray_step, min_step)
        if ss > 1:
            lin = lin.reshape(rows_per, ss, size, ss, 3).mean(axis=(1, 3))
        return lin

    linear = np.zeros((chunks * rows_per, size, 3), np.float32)
    for c in range(chunks):
        row0 = c * rows_per
        linear[row0 : row0 + rows_per] = np.asarray(chunk_linear(f(row0)))
        if on_progress is not None:
            partial = _assemble(linear[:size], cfg, dtype)
            if on_progress((c + 1) / chunks, partial) is False:
                # cooperative abort: return the progressively-filled frame,
                # like the reference's aborted back buffer
                return partial
    return _assemble(linear[:size], cfg, dtype)


@functools.lru_cache(maxsize=1)
def _post_jitted():
    import jax

    return jax.jit(post_process)


def _assemble(linear: np.ndarray, cfg, dtype) -> np.ndarray:
    """Radiance -> (+ star field) -> post chain (rasterizer.cpp:315-327).

    The post chain runs as ONE jitted dispatch — eagerly it is ~10 device
    dispatches, each a full round trip on tunneled backends, paid per
    progress tick."""
    lin = linear
    if cfg.no_stars > 0:
        lin = lin + render_star_field(
            cfg.size, cfg.no_stars, cfg.star_size, cfg.star_size_spread,
            cfg.star_strength, cfg.star_seed,
        )
    img = _post_jitted()(
        jnp.asarray(lin, dtype), jnp.asarray(cfg.exposure, dtype),
        jnp.asarray(cfg.gamma, dtype), jnp.asarray(cfg.saturation, dtype),
    )
    return np.asarray(img)


class RenderQueue:
    """Sequential job runner with per-job progress — RenderQueue::Update's
    poll loop collapsed into a synchronous iterator (no Qt thread to poll)."""

    def __init__(self, chunks: int = 16):
        self.jobs: List[RenderJob] = []
        self.chunks = chunks

    def add(self, job: RenderJob) -> None:
        self.jobs.append(job)

    def add_skybox(self, scene: Scene, prefix: str = "Skybox") -> None:
        for job in skybox_jobs(scene, prefix):
            self.add(job)

    def render_all(self, save_dir: str = ".",
                   on_progress: Optional[Callable[[str, float], None]] = None):
        """Render every queued job, saving <save_dir>/<filename>.png.
        Yields (job, image, seconds) as each finishes."""
        from pathlib import Path

        from PIL import Image

        for job in list(self.jobs):
            t0 = time.perf_counter()
            cb = (lambda frac, _img, name=job.filename:
                  on_progress(name, frac)) if on_progress else None
            img = render_progressive(job.scene, self.chunks, cb)
            out = Path(save_dir) / f"{job.filename}.png"
            Image.fromarray(img).save(out)
            yield job, img, time.perf_counter() - t0
        self.jobs.clear()
