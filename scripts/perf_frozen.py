"""A/B: fit-step time, tensor vs frozen march, on whatever backend is up.

Measures, in ONE process (timing noise between processes is +-2x over the
tunnel): precompute time, then per-step grad+update time for both
backends at the same workload. Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_frozen.py [size] [lod]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import gamer_tpu
from gamer_tpu.engine.diff import step_bound_for_scene
from gamer_tpu.engine.scene_prep import flatten_scene
from gamer_tpu.engine.tensor_march import (
    precompute_frozen,
    render_rays_tensor,
    render_rays_tensor_frozen,
)
from gamer_tpu.ops import camera as cam_ops
from gamer_tpu.scene import gax

size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
lod = int(sys.argv[2]) if len(sys.argv) > 2 else 0

scene = gamer_tpu.Scene(
    camera=gamer_tpu.CameraParams(camera=(0.5, 0, 0), target=(0, 0, 0),
                                  up=(0, 1, 0), fov=90.0),
    instances=[gamer_tpu.GalaxyInstance(
        galaxy=gax.load("/root/reference/publish/data/galaxies/Spiral.gax"))],
    config=gamer_tpu.RenderConfig(size=size, ray_step=0.025,
                                  noise_octaves=lod or None),
)
print("backend:", jax.default_backend(), "size:", size, "lod:", lod or "exact")
static, params = flatten_scene(scene)
params = jax.tree_util.tree_map(jnp.asarray, params)
inv_vp = jnp.asarray(cam_ops.inv_view_projection_host(
    np.asarray(scene.camera.camera, np.float32), scene.camera.target,
    scene.camera.up, scene.camera.fov))
dirs = cam_ops.ray_grid(size, inv_vp)
camera = jnp.asarray(scene.camera.camera, jnp.float32)
tb = step_bound_for_scene(scene)
f = jnp.float32
rs, ms = f(0.025), f(scene.config.min_ray_step)


def sync(x):
    return float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(x)[0])))


t0 = time.perf_counter()
lin = jax.jit(render_rays_tensor, static_argnums=(0, 6))(
    static, params, dirs, camera, rs, ms, tb)
sync(lin)
print(f"forward compile+run {time.perf_counter() - t0:.2f}s")
target = lin * 1.1

t0 = time.perf_counter()
frozen = jax.jit(precompute_frozen, static_argnums=(0, 6))(
    static, params, dirs, camera, rs, ms, tb)
sync(frozen)
t_pre = time.perf_counter() - t0
nbytes = sum(x.size * x.dtype.itemsize
             for x in jax.tree_util.tree_leaves(frozen))
print(f"precompute (compile+run) {t_pre:.2f}s, frozen fields "
      f"{nbytes / 1e6:.0f} MB")


def mkstep(fn, extra=()):
    def loss(p):
        lin = fn(static, p, dirs, camera, rs, ms, tb, *extra)
        return jnp.mean((lin - target) ** 2)

    @jax.jit
    def step(p):
        v, g = jax.value_and_grad(loss)(p)
        return v, jax.tree_util.tree_map(lambda x, gg: x - 1e-3 * gg, p, g)

    return step


import os

which = os.environ.get("BACKENDS", "tensor,frozen").split(",")
pairs = [("tensor", lambda: mkstep(render_rays_tensor)),
         ("frozen", lambda: mkstep(render_rays_tensor_frozen, (frozen,)))]
for name, mk in pairs:
    if name not in which:
        continue
    step = mk()
    t0 = time.perf_counter()
    v, p2 = step(params)
    sync(p2)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        v, p2 = step(params)
        sync(p2)
        times.append(time.perf_counter() - t0)
    print(f"{name}: compile {compile_s:.2f}s, step best-of-5 "
          f"{min(times):.3f}s (all: {[round(t, 3) for t in times]})")
