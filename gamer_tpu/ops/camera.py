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


@functools.lru_cache(maxsize=1)
def _inv_vp_batch_jitted():
    return jax.jit(jax.vmap(inv_view_projection))


# Per-pose host cache shared by the scalar and batched helpers. Sharing it
# guarantees that, within a process, a given camera pose always maps to ONE
# matrix no matter which path computed it first — so a batched fly-through
# frame and the same frame rendered singly stay bit-identical even on
# backends where vmapped and scalar computations differ in the last ulp
# (CPU does; TPU does not).
_POSE_CACHE: dict = {}
_POSE_CACHE_MAX = 4096


def _pose_key(camera, target, up, fov_deg, dtype):
    return (
        tuple(np.asarray(camera, dtype).reshape(-1).tolist()),
        tuple(np.asarray(target, dtype).reshape(-1).tolist()),
        tuple(np.asarray(up, dtype).reshape(-1).tolist()),
        float(np.asarray(fov_deg, dtype)),
        np.dtype(dtype).name,
    )


def _pose_cache_put(key, value: np.ndarray) -> None:
    while len(_POSE_CACHE) >= _POSE_CACHE_MAX:
        _POSE_CACHE.pop(next(iter(_POSE_CACHE)))
    _POSE_CACHE[key] = value


def inv_view_projection_host(camera, target, up, fov_deg,
                             dtype=np.float32) -> np.ndarray:
    """inv_view_projection for HOST callers: one jitted dispatch + one
    device read instead of ~30 eager ops (each eager op pays a full
    client->device round trip on tunneled backends), memoized per camera
    pose — re-rendering the same view (progressive refine, viewer orbit
    revisits, bench repeats) never re-pays the round trip. dtype float64
    serves the x64 conformance path. The matrix is computed ON DEVICE so it
    stays bit-identical to the XLA conformance path's in-graph computation."""
    key = _pose_key(camera, target, up, fov_deg, dtype)
    hit = _POSE_CACHE.get(key)
    if hit is None:
        hit = np.asarray(_inv_vp_jitted()(
            np.asarray(camera, dtype), np.asarray(target, dtype),
            np.asarray(up, dtype), np.asarray(fov_deg, dtype)))
        _pose_cache_put(key, hit)
    return hit.copy()


def inv_view_projection_host_batch(cameras, targets, ups, fov_degs,
                                   dtype=np.float32) -> np.ndarray:
    """(B, 4, 4) inverse view-projections with ONE device dispatch covering
    every uncached pose — a B-frame fly-through pays one round trip, not B
    (each round trip costs tens of ms on tunneled backends). Results are
    stored in the shared per-pose cache, so later single-frame renders of
    the same poses reuse these exact matrices."""
    cameras = np.asarray(cameras, dtype)
    targets = np.asarray(targets, dtype)
    ups = np.asarray(ups, dtype)
    fov_degs = np.asarray(fov_degs, dtype)
    B = cameras.shape[0]
    keys = [_pose_key(cameras[i], targets[i], ups[i], fov_degs[i], dtype)
            for i in range(B)]
    # snapshot this batch's values locally: a fill larger than the cache
    # budget may evict keys of THIS batch (including pre-existing hits)
    # while inserting later ones, so the final stack must not re-read the
    # shared cache
    local = {k: _POSE_CACHE[k] for k in keys if k in _POSE_CACHE}
    missing = sorted(set(keys) - local.keys())
    if missing and (len(missing) == 1 or jax.default_backend() != "tpu"):
        # Scalar path per pose when it is cheap (single miss, or an
        # untunneled CPU/GPU backend where a dispatch costs microseconds):
        # on CPU the vmapped matrices can differ from scalar ones in the
        # last ulp, and caching them would make a pose's render depend on
        # whether a batch warmed the cache first (order-dependent goldens).
        # On TPU vmapped == scalar and each dispatch pays a tunnel round
        # trip, so the one-dispatch batched fill below is the right call.
        for k in missing:
            local[k] = inv_view_projection_host(k[0], k[1], k[2], k[3],
                                                dtype)
    elif missing:
        mc = np.asarray([k[0] for k in missing], dtype)
        mt = np.asarray([k[1] for k in missing], dtype)
        mu = np.asarray([k[2] for k in missing], dtype)
        mf = np.asarray([k[3] for k in missing], dtype)
        out = np.asarray(_inv_vp_batch_jitted()(mc, mt, mu, mf))
        for k, m in zip(missing, out):
            _pose_cache_put(k, m)
            local[k] = m
    return np.stack([local[k] for k in keys])


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
