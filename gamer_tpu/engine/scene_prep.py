"""Scene flattening: dataclass scene -> (static structure, traced params).

The reference dispatches components through a class hierarchy
(galaxy.cpp:15-42); the TPU-native shape is data dispatch: the *structure*
of a scene (component class ids, arm ladder count, which optional noise
terms are enabled) is compile-time static, while every numeric parameter is
a traced array — so one compiled render serves any parameter values of the
same structure (and vmaps over them for dataset generation).

Static structure is hashable (frozen dataclasses of tuples) and is passed
through jit as a static argument; params are a pytree of jnp arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..oracle import qtmath as qm
from ..scene.schema import CID_STARS, CID_STARS_SMALL, Scene
from ..scene.spectra import find_spectrum


@dataclass(frozen=True)
class CompStatic:
    """Per-component compile-time structure."""

    cid: int
    arm_enabled: bool        # comp.arm != 0 (galaxycomponent.cpp:66-72)
    winding_enabled: bool    # comp.winding != 0
    star_extra: bool         # stars: noise_offset != 0 adds 2 cloud octodes
    octave_cap: int = 0      # noise LOD (RenderConfig.noise_octaves); 0 = exact
    noise_kind: str = "simplex"  # raw-noise backend (RenderConfig.noise_kind)

    def oct(self, n: int) -> int:
        """Reference octave count ``n`` under the LOD cap."""
        return min(n, self.octave_cap) if self.octave_cap else n


@dataclass(frozen=True)
class InstanceStatic:
    comps: Tuple[CompStatic, ...]
    max_arms: int  # equality-ladder count (galaxycomponent.h:120-137)


@dataclass(frozen=True)
class SceneStatic:
    instances: Tuple[InstanceStatic, ...]
    dither: bool = False  # per-ray march-start dithering (RenderConfig.dither)


COMP_FIELDS = (
    "strength", "arm", "z0", "r0", "inner", "delta", "winding",
    "scale", "noise_offset", "noise_tilt", "ks",
)


def _arm_ladder_count(no_arms: float) -> int:
    if no_arms == 1:
        return 1
    if no_arms == 2:
        return 2
    if no_arms == 3:
        return 3
    return 4


def flatten_scene(scene: Scene, dtype=jnp.float32):
    """Build (SceneStatic, params-pytree) for the jittable renderer.

    Instances are sorted far->near relative to the scene camera
    (rasterizer.cpp:190-201) at prep time. 'stars small' components are
    dropped in deterministic mode, matching the oracle
    (galaxy_repro.py:734-737); inactive and unknown-class components are
    dropped as the reference does.
    """
    cam32 = np.asarray(scene.camera.camera, dtype=np.float32)
    instances = sorted(
        scene.instances,
        key=lambda g: -float(
            qm.length32((np.asarray(g.position, np.float32) - cam32).astype(np.float32))
        ),
    )

    inst_statics = []
    inst_params = []
    for gi in instances:
        gp = gi.galaxy.params
        comp_statics = []
        comp_params = []
        for cp in gi.galaxy.components:
            if cp.active != 1 or cp.cid < 0:
                continue
            if cp.cid == CID_STARS_SMALL and scene.config.deterministic:
                continue
            comp_statics.append(
                CompStatic(
                    cid=cp.cid,
                    arm_enabled=cp.arm != 0,
                    winding_enabled=cp.winding != 0,
                    star_extra=(cp.cid == CID_STARS and cp.noise_offset != 0),
                    octave_cap=int(scene.config.noise_octaves or 0),
                    noise_kind=scene.config.noise_kind,
                )
            )
            # numpy, not jnp: params transfer to the device ONCE at the
            # jitted call boundary; eager per-field device puts cost ~100
            # dispatches per scene and dominated small-frame renders
            fields: Dict[str, np.ndarray] = {
                f: np.asarray(getattr(cp, f), dtype) for f in COMP_FIELDS
            }
            fields["spec"] = np.asarray(
                find_spectrum(cp.spectrum, scene.spectra), dtype
            )
            comp_params.append(fields)

        orientation32 = np.asarray(gi.orientation, np.float32)
        rotmat32 = qm.quat_rotation_to(qm.v3(0, 1, 0), orientation32)
        # QQuaternion::fromAxisAndAngle normalizes a non-unit axis; every
        # other use of the orientation is raw (galaxycomponent.h:72-76,86-90).
        twirl_axis32 = qm.normalized32(orientation32)

        inst_statics.append(
            InstanceStatic(
                comps=tuple(comp_statics),
                max_arms=_arm_ladder_count(gp.no_arms),
            )
        )
        inst_params.append(
            {
                "comps": tuple(comp_params),
                "axis": np.asarray(gp.axis, dtype),
                "winding_b": np.asarray(gp.winding_b, dtype),
                "winding_n": np.asarray(gp.winding_n, dtype),
                "no_arms": np.asarray(gp.no_arms, dtype),
                "arms": np.asarray([gp.arm1, gp.arm2, gp.arm3, gp.arm4], dtype),
                "position": np.asarray(gi.position, dtype),
                "orientation": np.asarray(orientation32, dtype),
                "twirl_axis": np.asarray(twirl_axis32, dtype),
                "rotmat": np.asarray(rotmat32, dtype),
                "intensity_scale": np.asarray(gi.intensity_scale, dtype),
            }
        )

    return (
        SceneStatic(instances=tuple(inst_statics),
                    dither=bool(scene.config.dither)),
        tuple(inst_params),
    )
