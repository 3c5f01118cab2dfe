"""Device-mesh sharding of the render pipeline.

The reference's parallelism axes (SURVEY.md §2.5) map to JAX sharding:

  OMP pixel loop (rasterizer.cpp:294)      -> shard the ray grid's row axis
  RasterThread chunking (rasterthread.cpp) -> same (exact tiling, no dropped
                                              remainder — the reference bug
                                              is deliberately not reproduced)
  frame queue / skybox (renderqueue.cpp)   -> vmap over camera matrices,
                                              sharded over a 'frames' axis
  scene batches (mainwindow.cpp:1137-1170) -> vmap over galaxy params,
                                              sharded over a 'batch' axis
  image assembly (rasterizer.cpp:315-327)  -> the output all-gather XLA
                                              inserts when the host reads

No communication happens inside the march (rays are independent), so the
only collective in the compiled module is the final gather of output tiles —
the analog of Rasterizer::AssembleImage. Shardings are annotated with
NamedSharding/pjit and XLA inserts the collectives; nothing is hand-rolled.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.scene_prep import SceneStatic, flatten_scene
from ..ops import camera as cam_ops
from ..scene.schema import Scene

PIXEL_AXIS = "px"


def make_pixel_mesh(devices=None, axis_name: str = PIXEL_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices, for pixel-row sharding."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


@functools.lru_cache(maxsize=64)
def sharded_render_fn(static: SceneStatic, size: int, mesh: Mesh,
                      supersample: int = 1):
    """Jitted render under `mesh` with the image's row axis sharded across
    devices. Scene params are replicated (tiny); the ray grid/image rows are
    partitioned, which is where all the work is. With supersampling the
    ss*size ray rows stay aligned to the pooled output rows, so XLA
    propagates the same row sharding through the box filter. Cached per
    (structure, size, mesh, ss) so repeated calls reuse the executable."""
    from ..engine.render import render_frame, render_frame_ss

    row_sharding = NamedSharding(mesh, P(PIXEL_AXIS, None, None))

    def frame(params, camera, inv_vp, ray_step, min_step, exposure, gamma, saturation):
        if supersample > 1:
            img, _ = render_frame_ss(static, size, supersample, params,
                                     camera, inv_vp, ray_step, min_step,
                                     exposure, gamma, saturation)
        else:
            img, _ = render_frame(static, size, params, camera, inv_vp,
                                  ray_step, min_step, exposure, gamma,
                                  saturation)
        return img

    return jax.jit(frame, out_shardings=row_sharding)


def render_scene_sharded(scene: Scene, mesh: Optional[Mesh] = None,
                         dtype=jnp.float32,
                         method: str = "pallas") -> np.ndarray:
    """Render a Scene with the image's rows sharded over a device mesh.

    ``method="pallas"`` (default, the production path) shards the tile
    kernel's row slabs — any size works on any mesh (slabs pad to whole
    tiles; padded rows are masked); the sharded frame is bit-identical to a
    single-device render over the same row bands (exact on TPU vs the
    fused launch too — see pallas_render._compiled_rowshard).
    ``method="xla"`` shards the lockstep XLA conformance path (size must
    divide the mesh; known to stress the TPU runtime at >=256^2 — use for
    small-frame conformance only).
    """
    mesh = mesh if mesh is not None else make_pixel_mesh()
    cfg = scene.config
    if method == "pallas":
        if dtype != jnp.float32:
            # the tile kernel is f32-only; silently dropping a requested
            # x64 would return numerically different output
            raise ValueError(
                f"method='pallas' renders in float32 only (got {dtype}); "
                "use method='xla' for the dtype-parametric conformance path")
        from ..engine.pallas_render import render_scene_pallas

        return render_scene_pallas(scene, mesh=mesh)
    if method != "xla":
        raise ValueError(f"unknown sharded method {method!r}")
    n_dev = mesh.devices.size
    if cfg.size % n_dev != 0:
        raise ValueError(
            f"size {cfg.size} not divisible by mesh size {n_dev}; "
            "choose a size that tiles over the mesh"
        )
    static, params = flatten_scene(scene, dtype)
    camera = np.asarray(scene.camera.camera, dtype)
    inv_vp = cam_ops.inv_view_projection_host(
        camera, scene.camera.target, scene.camera.up, scene.camera.fov,
        dtype=dtype)
    f = lambda v: jnp.asarray(v, dtype)
    call = sharded_render_fn(static, cfg.size, mesh, cfg.supersample)
    img = call(params, camera, inv_vp, f(cfg.ray_step), f(cfg.min_ray_step),
               f(cfg.exposure), f(cfg.gamma), f(cfg.saturation))
    return np.asarray(img)
