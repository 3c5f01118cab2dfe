"""Camera — Qt-convention view/projection chain as traceable JAX ops.

Replicates GamerCamera (gamercamera.cpp:185-217):

  proj = perspective(fov, aspect=1, near=1, far=100)
  view = lookAt(target, camera, up)        # NOTE reversed eye/center!
  inv_vp = (proj @ view)^-1
  ray(i, j) = normalize((inv_vp @ (i/(w/2)-1, -(j/(w/2)-1), 1, 1)).xyz)

Because of the reversed lookAt, rays point AWAY from the scene; visible
geometry sits at negative ray parameters (rasterizer.cpp:396-403 relies on
this). We keep the convention exactly.

The inverse is computed in closed form (inv(V) @ inv(P)) rather than a
generic 4x4 inverse — better f32 accuracy and cheaper, and fully traceable
for vmap'd camera paths (fly-throughs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .math3d import dot3


def _deg2rad(d):
    return d * (jnp.pi / 180.0)


def inv_view_projection(camera, target, up, fov_deg, near=1.0, far=100.0):
    """Closed-form (perspective(fov,1,near,far) @ lookAt(target, camera, up))^-1.

    camera/target/up: (..., 3); fov_deg: scalar or (...,). Returns (..., 4, 4).
    """
    camera = jnp.asarray(camera)
    target = jnp.asarray(target)
    up = jnp.asarray(up)
    dtype = jnp.result_type(camera, target, up)

    # lookAt(eye=target, center=camera, up) basis (Qt convention, reversed)
    eye, center = target, camera
    fwd = center - eye
    fwd = fwd / jnp.sqrt(dot3(fwd, fwd))[..., None]
    side = jnp.cross(fwd, up)
    side = side / jnp.sqrt(dot3(side, side))[..., None]
    upv = jnp.cross(side, fwd)

    # V^-1 = [[side upv -fwd] (columns), eye; 0 0 0 1]
    r = jnp.stack([side, upv, -fwd], axis=-1)  # (..., 3, 3): columns are basis
    vinv = jnp.concatenate([r, eye[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros(vinv.shape[:-2] + (1, 4), dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    vinv = jnp.concatenate([vinv, bottom], axis=-2)  # (..., 4, 4)

    # P^-1 for perspective(fov, aspect=1, near, far):
    #   P = [[c,0,0,0],[0,c,0,0],[0,0,m22,m23],[0,0,-1,0]]
    #   P^-1 = [[1/c,0,0,0],[0,1/c,0,0],[0,0,0,-1],[0,0,1/m23,m22/m23]]
    radians = _deg2rad(jnp.asarray(fov_deg, dtype) / 2.0)
    cotan = jnp.cos(radians) / jnp.sin(radians)
    clip = far - near
    m22 = -(near + far) / clip
    m23 = -(2.0 * near * far) / clip
    shape = jnp.shape(cotan)
    pinv = jnp.zeros(shape + (4, 4), dtype)
    pinv = pinv.at[..., 0, 0].set(1.0 / cotan)
    pinv = pinv.at[..., 1, 1].set(1.0 / cotan)
    pinv = pinv.at[..., 2, 3].set(-1.0)
    pinv = pinv.at[..., 3, 2].set(1.0 / m23)
    pinv = pinv.at[..., 3, 3].set(m22 / m23)

    return vinv @ pinv


@functools.lru_cache(maxsize=1)
def _inv_vp_jitted():
    return jax.jit(inv_view_projection)


def inv_view_projection_host(camera, target, up, fov_deg,
                             dtype=np.float32) -> np.ndarray:
    """inv_view_projection for HOST callers: one jitted dispatch + one
    device read instead of ~30 eager ops (each eager op pays a full
    client->device round trip on tunneled backends). dtype float64 serves
    the x64 conformance path."""
    return np.asarray(_inv_vp_jitted()(
        np.asarray(camera, dtype), np.asarray(target, dtype),
        np.asarray(up, dtype), np.asarray(fov_deg, dtype)))


def coord2ray(i, j, width, inv_vp):
    """Pixel (i, j) -> normalized world ray (gamercamera.cpp:210-217).

    i, j: arrays of pixel coordinates; width: image size in px (scalar);
    inv_vp: (4, 4). Returns (..., 3). The w component of the transformed
    NDC point is discarded before normalization (toVector3D), exactly as
    the reference does.
    """
    dtype = inv_vp.dtype
    half = jnp.asarray(width, dtype) * 0.5
    xx = jnp.asarray(i, dtype) / half - 1.0
    yy = jnp.asarray(j, dtype) / half - 1.0
    one = jnp.ones_like(xx)
    screen = jnp.stack([xx, -yy, one, one], axis=-1)  # (..., 4)
    world = screen @ inv_vp.T  # rows of inv_vp dot screen
    v = world[..., :3]
    n = jnp.sqrt(dot3(v, v))
    return v / n[..., None]


def ray_grid(size: int, inv_vp):
    """All rays of a size x size frame, in the reference's idx = j*size + i
    layout, returned as (size, size, 3) with [j, i] indexing (row j, col i).
    """
    dtype = inv_vp.dtype
    ii = jnp.arange(size, dtype=dtype)
    jj = jnp.arange(size, dtype=dtype)
    i_g, j_g = jnp.meshgrid(ii, jj, indexing="xy")  # [j, i]
    return coord2ray(i_g, j_g, size, inv_vp)
