"""Batched rendering: camera fly-throughs and galaxy dataset generation.

The reference's frame queue renders camera paths one frame at a time
(renderqueue.cpp:63-87) and its scene mode samples random galaxies
(mainwindow.cpp:1137-1170); the TPU-native shape is a BATCH axis:

  fly-through  — one scene pytree, B cameras      (BASELINE config 4)
  dataset gen  — B galaxy-parameter variations    (BASELINE config 5)

Both compile to ONE Pallas launch with grid (B, rows/8, cols/128), each
batch element selecting its own packed scalar row (camera AND galaxy params
live in the row, so the two modes are the same kernel). Across a device
mesh the batch axis is sharded with shard_map — frames/seeds are
independent, so the only collective is the output gather.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import camera as cam_ops
from ..scene.schema import CameraParams, Scene
from .pallas_render import _build_layout, _compiled_batch, _pack_scalars
from .render import post_process
from .scene_prep import flatten_scene

BATCH_AXIS = "batch"


@functools.lru_cache(maxsize=1)
def _post_batch_jit():
    return jax.jit(jax.vmap(post_process))


@functools.lru_cache(maxsize=1)
def _star_field_jit():
    from ..post.stars import star_field_device

    # one dispatch per unique star config (eager scans would pay a tunnel
    # round trip per op); compile cache keyed by (star count, frame size)
    return jax.jit(star_field_device, static_argnums=1)


def _scene_rows(scenes: Sequence[Scene], dtype=jnp.float32):
    """Flatten scenes sharing one structure into packed scalar rows."""
    statics_params = [flatten_scene(s, dtype) for s in scenes]
    static0 = statics_params[0][0]
    for st, _ in statics_params[1:]:
        if st != static0:
            raise ValueError(
                "all scenes in a batch must share the same component "
                "structure (same classes/arm ladder/star-extra flags)"
            )
    lay = _build_layout(static0)
    # all camera matrices in ONE device dispatch (a per-scene dispatch costs
    # a full round trip each on tunneled backends — ~0.45 s of a 16-frame
    # fly-through before this)
    inv_vps = cam_ops.inv_view_projection_host_batch(
        [s.camera.camera for s in scenes],
        [s.camera.target for s in scenes],
        [s.camera.up for s in scenes],
        [s.camera.fov for s in scenes], dtype=dtype)
    rows = []
    for scene, (st, params), inv_vp in zip(scenes, statics_params, inv_vps):
        camera = np.asarray(scene.camera.camera, dtype)
        cfg = scene.config
        rows.append(_pack_scalars(
            static0, lay, params, camera, inv_vp,
            np.asarray(cfg.ray_step, dtype),
            np.asarray(cfg.min_ray_step, dtype),
        ))
    return static0, np.concatenate(rows, axis=0)


def render_batch(scenes: Sequence[Scene], mesh: Optional[Mesh] = None) -> np.ndarray:
    """Render B scenes (same structure + size) -> (B, S, S, 3) uint8.

    With a mesh, the batch axis is sharded across its devices (B must
    divide the mesh size).
    """
    size = scenes[0].config.size
    ss = scenes[0].config.supersample
    for s in scenes:
        if s.config.size != size:
            raise ValueError("all scenes in a batch must share the size")
        if s.config.supersample != ss:
            raise ValueError("all scenes in a batch must share the supersample")
    static, sp_rows = _scene_rows(scenes)
    B = sp_rows.shape[0]

    if mesh is None:
        _, run = _compiled_batch(static, size * ss, B, ss)
        linear = run(sp_rows)
    elif len(mesh.axis_names) == 2:
        # 2-D decomposition: frames over 'batch' (DCN), each frame's row
        # slabs over 'rows' (ICI) — parallel.pixel_tile_mesh_2d
        from .pallas_render import _compiled_batch_rowshard

        if set(mesh.axis_names) != {"batch", "rows"}:
            raise ValueError(
                f"2-D batch mesh must have axes ('batch', 'rows'), got "
                f"{mesh.axis_names} — use parallel.pixel_tile_mesh_2d")
        n_b = mesh.shape["batch"]
        if B % n_b != 0:
            raise ValueError(
                f"batch {B} not divisible by mesh batch axis {n_b}")
        _, run2d = _compiled_batch_rowshard(static, size * ss, B // n_b,
                                            mesh, ss)
        linear = run2d(sp_rows)
    else:
        n_dev = mesh.devices.size
        if B % n_dev != 0:
            raise ValueError(f"batch {B} not divisible by mesh size {n_dev}")
        _, run_local = _compiled_batch(static, size * ss, B // n_dev, ss)

        @jax.jit
        def run_sharded(rows):
            return shard_map(
                run_local, mesh=mesh,
                in_specs=P(BATCH_AXIS, None, None),
                out_specs=P(BATCH_AXIS, None, None, None),
                check_vma=False,  # pallas_call out_shapes carry no vma info
            )(rows)

        linear = run_sharded(sp_rows)

    # post chain per frame (exposure/gamma/saturation may differ per scene),
    # vmapped ON DEVICE: only the final uint8 frames are transferred. Star
    # overlays are computed ON DEVICE from the seeded (K, 6) star-parameter
    # rows, once per UNIQUE star config — a starred fly-through (shared
    # config across frames) uploads one ~24-bytes-per-star array, not B
    # frame-sized overlays.
    if any(s.config.no_stars > 0 for s in scenes):
        from ..post.stars import pad_star_rows, star_params

        field_jit = _star_field_jit()
        fields = {}
        for s in scenes:
            key = (s.config.no_stars, s.config.star_size,
                   s.config.star_size_spread, s.config.star_strength,
                   s.config.star_seed)
            if key not in fields:
                fields[key] = (
                    # bucket-padded: one compile per shape bucket, not per
                    # exact star count (w=0 pad rows splat nothing)
                    field_jit(jnp.asarray(pad_star_rows(
                        star_params(size, *key))), size)
                    if key[0] > 0 else jnp.zeros((size, size, 3), jnp.float32)
                )
        overlays = jnp.stack([
            fields[(s.config.no_stars, s.config.star_size,
                    s.config.star_size_spread, s.config.star_strength,
                    s.config.star_seed)]
            for s in scenes
        ])
        linear = linear + overlays
    exposures = np.asarray([s.config.exposure for s in scenes], np.float32)
    gammas = np.asarray([s.config.gamma for s in scenes], np.float32)
    saturations = np.asarray([s.config.saturation for s in scenes], np.float32)
    img = _post_batch_jit()(linear, exposures, gammas, saturations)
    return np.asarray(img)


def render_flythrough(scene: Scene, cameras: Sequence[CameraParams],
                      mesh: Optional[Mesh] = None) -> np.ndarray:
    """BASELINE config 4: one scene, B cameras -> (B, S, S, 3) uint8."""
    import dataclasses

    scenes = [dataclasses.replace(scene, camera=cam) for cam in cameras]
    return render_batch(scenes, mesh=mesh)


def make_batch_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))
