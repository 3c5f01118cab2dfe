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


def _scene_groups(scenes: Sequence[Scene], dtype=jnp.float32):
    """Flatten scenes into packed scalar rows, GROUPED by static structure.

    flatten_scene sorts each frame's instances far->near against that
    frame's own camera (rasterizer.cpp:190-201 does this per render), so a
    multi-instance orbit that crosses the instances' depth order yields a
    different sorted structure on some frames. Frames are grouped by their
    (sorted) static and each group renders as its own launch — within a
    group the compile is shared, and absorption composites in the correct
    per-frame order. Heterogeneous batches (different galaxies entirely)
    fall out of the same mechanism.

    Returns [(static, rows, original frame indices)].
    """
    statics_params = [flatten_scene(s, dtype) for s in scenes]
    # all camera matrices in ONE device dispatch (a per-scene dispatch costs
    # a full round trip each on tunneled backends — ~0.45 s of a 16-frame
    # fly-through before this)
    inv_vps = cam_ops.inv_view_projection_host_batch(
        [s.camera.camera for s in scenes],
        [s.camera.target for s in scenes],
        [s.camera.up for s in scenes],
        [s.camera.fov for s in scenes], dtype=dtype)
    layouts = {}
    groups: dict = {}  # static -> ([row], [frame idx]); insertion-ordered
    for i, (scene, (st, params), inv_vp) in enumerate(
            zip(scenes, statics_params, inv_vps)):
        lay = layouts.get(st)
        if lay is None:
            lay = layouts[st] = _build_layout(st)
        camera = np.asarray(scene.camera.camera, dtype)
        cfg = scene.config
        row = _pack_scalars(
            st, lay, params, camera, inv_vp,
            np.asarray(cfg.ray_step, dtype),
            np.asarray(cfg.min_ray_step, dtype),
        )
        rows_l, idx_l = groups.setdefault(st, ([], []))
        rows_l.append(row)
        idx_l.append(i)
    return [(st, np.concatenate(rows_l, axis=0), np.asarray(idx_l))
            for st, (rows_l, idx_l) in groups.items()]


def _render_group(static, sp_rows: np.ndarray, size: int, ss: int,
                  mesh: Optional[Mesh]):
    """One batched launch for one structure group -> (n, S, S, 3) linear.

    On a mesh, the group is padded (repeating the last row — a no-op
    render) up to the mesh's batch divisor and the pad frames sliced off;
    padding only costs anything when a batch splits into uneven groups."""
    B = sp_rows.shape[0]
    if mesh is None:
        _, run = _compiled_batch(static, size * ss, B, ss)
        return run(sp_rows)
    if len(mesh.axis_names) == 2:
        # 2-D decomposition: frames over 'batch' (DCN), each frame's row
        # slabs over 'rows' (ICI) — parallel.pixel_tile_mesh_2d
        from .pallas_render import _compiled_batch_rowshard

        if set(mesh.axis_names) != {"batch", "rows"}:
            raise ValueError(
                f"2-D batch mesh must have axes ('batch', 'rows'), got "
                f"{mesh.axis_names} — use parallel.pixel_tile_mesh_2d")
        n_b = mesh.shape["batch"]
        pad = (-B) % n_b
        if pad:
            sp_rows = np.concatenate(
                [sp_rows, np.repeat(sp_rows[-1:], pad, axis=0)], axis=0)
        _, run2d = _compiled_batch_rowshard(static, size * ss,
                                            (B + pad) // n_b, mesh, ss)
        return run2d(sp_rows)[:B]
    n_dev = mesh.devices.size
    pad = (-B) % n_dev
    if pad:
        sp_rows = np.concatenate(
            [sp_rows, np.repeat(sp_rows[-1:], pad, axis=0)], axis=0)
    _, run_local = _compiled_batch(static, size * ss, (B + pad) // n_dev, ss)

    @jax.jit
    def run_sharded(rows):
        return shard_map(
            run_local, mesh=mesh,
            in_specs=P(BATCH_AXIS, None, None),
            out_specs=P(BATCH_AXIS, None, None, None),
            check_vma=False,  # pallas_call out_shapes carry no vma info
        )(rows)

    return run_sharded(sp_rows)[:B]


def render_batch_linear(scenes: Sequence[Scene],
                        mesh: Optional[Mesh] = None):
    """Linear radiance of B scenes -> (B, S, S, 3) float32 ON DEVICE.

    The shared front half of render_batch: one production-kernel launch
    per structure group, supersample pooled in linear space, NO star
    overlay and NO post chain. This is also the batched forward model of
    fit_pose_fd — 2K+1 probe poses around the current camera render at
    full production quality in one dispatch.
    """
    size = scenes[0].config.size
    ss = scenes[0].config.supersample
    for s in scenes:
        if s.config.size != size:
            raise ValueError("all scenes in a batch must share the size")
        if s.config.supersample != ss:
            raise ValueError("all scenes in a batch must share the supersample")
    groups = _scene_groups(scenes)

    if len(groups) == 1:
        return _render_group(groups[0][0], groups[0][1], size, ss, mesh)
    linear = None
    for static, sp_rows, idx in groups:
        lin_g = _render_group(static, sp_rows, size, ss, mesh)
        if linear is None:
            linear = jnp.zeros((len(scenes),) + tuple(lin_g.shape[1:]),
                               lin_g.dtype)
        linear = linear.at[jnp.asarray(idx)].set(lin_g)
    return linear


def render_batch(scenes: Sequence[Scene], mesh: Optional[Mesh] = None,
                 device_out: bool = False) -> np.ndarray:
    """Render B scenes (same size/supersample) -> (B, S, S, 3) uint8.

    Scenes are grouped by component structure — one launch per group — so
    mixed-structure batches and depth-order flips across a fly-through both
    work (each frame composites its instances in ITS camera's far->near
    order). With a mesh, each group's batch axis is sharded across the
    mesh's devices (uneven groups are padded to the mesh divisor).

    ``device_out=True`` returns the uint8 stack as a DEVICE array without
    blocking on the host download — JAX's async dispatch means the call
    returns as soon as the launch is enqueued, so a caller can overlap the
    readback of this batch with packing/dispatching the next one (the
    serve worker's pipelined completer; same contract as
    render_scene_pallas(device_out=True)).
    """
    size = scenes[0].config.size
    linear = render_batch_linear(scenes, mesh)

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
    return img if device_out else np.asarray(img)


def render_flythrough(scene: Scene, cameras: Sequence[CameraParams],
                      mesh: Optional[Mesh] = None) -> np.ndarray:
    """BASELINE config 4: one scene, B cameras -> (B, S, S, 3) uint8."""
    import dataclasses

    scenes = [dataclasses.replace(scene, camera=cam) for cam in cameras]
    return render_batch(scenes, mesh=mesh)


def make_batch_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))
