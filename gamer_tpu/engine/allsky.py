"""All-sky (HEALPix) rendering — HPXRasterizer parity
(source/galaxy/hpxrasterizer.cpp:61-140).

Work list = the 12*nside^2 RING pixels; each pixel's ray direction is its
HEALPix center vector rotated 90 degrees about +X (fromEulerAngles((90,0,0)),
hpxrasterizer.cpp:82); the stored value is the luminance mean(I) of the
marched radiance (including the 0.01/rayStep final scale, since the
reference calls the same renderPixel). Assembly = Mollweide projection of
the map + the standard post chain.

TPU shape: all sky pixels march in one vectorized batch — no shuffle needed
(work-list shuffling only balanced the reference's thread chunks).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import camera as cam_ops  # noqa: F401  (kept for API symmetry)
from ..post.healpix import npix, pix2vec_ring
from ..post.mollweide import mollweide_image
from ..scene.schema import Scene
from .render import render_rays
from .scene_prep import flatten_scene


def render_allsky_map(scene: Scene, nside: int, dtype=jnp.float32,
                      kernel: str = "pallas", mesh=None) -> np.ndarray:
    """Render the scene into a RING HEALPix luminance map of 12*nside^2.

    With ``mesh`` (a 1-D device mesh, pallas kernel only) the HEALPix
    work list's ray rows are sharded across its devices
    (pallas_render._compiled_dirs_rowshard) — the all-sky analog of the
    frame renderers' row-slab sharding; nside 512 is ~5.6 s on one v5e
    chip and scales ~linearly (rays are independent; the only collective
    is the output gather)."""
    n = npix(nside)
    dirs_np = pix2vec_ring(nside, np.arange(n))
    # rotate 90 deg about +X: (x, y, z) -> (x, -z, y)
    dirs_np = np.stack(
        [dirs_np[:, 0], -dirs_np[:, 2], dirs_np[:, 1]], axis=-1
    )
    if kernel == "pallas":
        from .pallas_render import render_dirs_pallas

        linear = render_dirs_pallas(scene, dirs_np, mesh=mesh)
    else:
        if mesh is not None:
            raise ValueError("mesh sharding needs the pallas kernel")
        static, params = flatten_scene(scene, dtype)
        dirs = jnp.asarray(dirs_np, dtype)
        camera = jnp.asarray(scene.camera.camera, dtype)
        cfg = scene.config
        linear = render_rays(
            static, params, dirs, camera,
            jnp.asarray(cfg.ray_step, dtype),
            jnp.asarray(cfg.min_ray_step, dtype),
        )
    lum = (np.asarray(linear).sum(axis=-1)) / 3.0
    return lum.astype(np.float64)


def render_allsky_image(scene: Scene, nside: int, size: int,
                        dtype=jnp.float32, mesh=None) -> np.ndarray:
    """All-sky map -> Mollweide -> post chain -> uint8 (size, size, 3)."""
    hpx = render_allsky_map(scene, nside, dtype, mesh=mesh)
    buf = mollweide_image(hpx, nside, size)
    cfg = scene.config
    from .queue import _post_jitted  # one dispatch, not ~10 eager ones

    img = _post_jitted()(
        jnp.asarray(buf), jnp.asarray(cfg.exposure, dtype),
        jnp.asarray(cfg.gamma, dtype), jnp.asarray(cfg.saturation, dtype),
    )
    return np.asarray(img)
