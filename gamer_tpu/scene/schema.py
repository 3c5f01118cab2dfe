"""Scene / parameter model for the TPU-native GAMER engine.

These dataclasses replace the reference's Qt parameter classes 1:1:

  - :class:`GalaxyParams`    ~ source/galaxy/galaxyparams.h:10-43
  - :class:`ComponentParams` ~ source/galaxy/componentparams.h:7-44
  - :class:`GalaxyData`      ~ source/galaxy/galaxy.h (params + component list)
  - :class:`GalaxyInstance`  ~ source/galaxy/galaxyinstance.h (placement in scene)
  - :class:`CameraParams`    ~ source/galaxy/gamercamera.h (camera/target/up/fov)
  - :class:`RenderConfig`    ~ source/galaxy/renderingparams.h:8-153 (render knobs)
  - :class:`Scene`           = list of instances + render config (replaces the GUI)

Everything converts to/from plain dicts (JSON-friendly) so a scene is just a
pytree-of-scalars on the host; :mod:`gamer_tpu.scene.flatten` turns it into
fixed-shape device arrays.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

Vec3 = Tuple[float, float, float]

# Component class ids, in reference registry order (source/galaxy/galaxy.cpp:15-42).
CID_BULGE = 0
CID_DISK = 1
CID_DUST = 2
CID_DUST2 = 3
CID_DUST_POSITIVE = 4
CID_STARS = 5
CID_STARS_SMALL = 6
CID_NONE = -1

CLASS_NAME_TO_CID: Dict[str, int] = {
    "bulge": CID_BULGE,
    "disk": CID_DISK,
    "dust": CID_DUST,
    "dust2": CID_DUST2,
    "dust positive": CID_DUST_POSITIVE,
    "stars": CID_STARS,
    "stars small": CID_STARS_SMALL,
}
CID_TO_CLASS_NAME: Dict[int, str] = {v: k for k, v in CLASS_NAME_TO_CID.items()}


def class_name_to_cid(name: str) -> int:
    """Map a component class name to its integer id (-1 if unknown).

    The reference instantiates by exact lowercase name (galaxy.cpp:15-42) and
    skips unknown classes; unknown -> CID_NONE mirrors that.
    """
    return CLASS_NAME_TO_CID.get(name.lower(), CID_NONE)


@dataclass
class GalaxyParams:
    """Galaxy-wide shape parameters (galaxyparams.h:10-43 defaults).

    Semantics (paraphrasing the reference's galaxy-tab help):
      winding_b/winding_n — the log-spiral winding law: arm angle
        theta(r) = atan(exp(-0.25/(0.5 (r+0.05))) / B) * 2N (the renderer
        offsets the radius by 0.05, galaxycomponent.h:156-165), so B sets
        how fast arms wrap and N the total wind count.
      no_arms — number of spiral arms; compared EXACTLY against 1/2/3,
        any other value (including 0 or non-integers) enables all 4.
      arm1..arm4 — per-arm starting phase in radians.
      axis — ellipsoid semi-axes bounding the galaxy volume.
      bulge_dust/bulge_axis/inner_twirl/warp_* — serialized for .gax
        compatibility; unused by the shading (also unused in the reference).
    """

    name: str = "NewGalaxy"
    axis: Vec3 = (1.0, 1.0, 1.0)
    bulge_dust: float = 0.025
    bulge_axis: Vec3 = (1.0, 1.0, 1.0)
    winding_b: float = 0.5
    winding_n: float = 4.0
    no_arms: float = 2.0
    arm1: float = 0.0
    arm2: float = math.pi
    arm3: float = 2.0 * math.pi
    arm4: float = 3.0 * math.pi
    inner_twirl: float = 0.0
    warp_amplitude: float = 0.0
    warp_scale: float = 0.0


@dataclass
class ComponentParams:
    """Per-component parameters (componentparams.h:7-59 defaults).

    Semantics (paraphrasing the reference's components-tab help):
      strength — overall intensity: emitted light for bulge/disk/stars,
        absorption for the dust classes.
      arm — arm concentration exponent (profile is (1-v)^(arm*15)): low
        values spread light across the disk, high values pinch it into
        thin arms; 0 disables arm modulation entirely.
      z0 — scale height above the galactic plane (sech^2 falloff with a
        hard cutoff at |z/z0| > 2); typical 0.001-0.05.
      r0 — radial falloff scale of exp(-r/(r0/2)); for bulge it instead
        scales the de-Vaucouleurs radius (larger r0 = tighter bulge).
      inner — inner cutoff radius; intensity ramps in as
        smoothstep(0, inner, r)^4.
      delta — tangential phase lag of this component's arms (radians).
      winding — per-component twirl factor applied to the noise field;
        higher values swirl the noise along the arms (typical 0-0.5).
      scale — base frequency of the procedural noise (evaluated at
        scale*0.1 for cloud noise; stars use scale*1.0).
      noise_offset — additive threshold on the noise field (dust clips at
        noise-offset; stars blend extra cloud noise when nonzero).
      noise_tilt — power-function shaping: noise = pow(noise, tilt).
      ks — noise persistence (octave amplitude decay): low = large-scale
        structure dominates, high = fine grain.
      active — 1.0 renders the component, anything else skips it.
    """

    class_name: str = "bulge"
    spectrum: str = "White"
    name: str = "New component"
    strength: float = 1.0
    arm: float = 1.0
    z0: float = 0.02
    r0: float = 0.5
    inner: float = 0.0
    active: float = 1.0
    delta: float = 0.0
    winding: float = 0.1
    scale: float = 1.0
    noise_offset: float = 0.0
    noise_tilt: float = 1.0
    ks: float = 1.0

    @property
    def cid(self) -> int:
        return class_name_to_cid(self.class_name)


@dataclass
class GalaxyData:
    """A galaxy definition: params + ordered component list."""

    display_name: str = ""
    params: GalaxyParams = field(default_factory=GalaxyParams)
    components: List[ComponentParams] = field(default_factory=list)

    def active_components(self) -> List[ComponentParams]:
        return [c for c in self.components if c.active == 1 and c.cid != CID_NONE]


@dataclass
class GalaxyInstance:
    """Placement of a galaxy in a scene (galaxyinstance.h).

    ``redshift`` is stored-but-unused in the reference shading; kept for parity.
    """

    galaxy: GalaxyData
    position: Vec3 = (0.0, 0.0, 0.0)
    orientation: Vec3 = (0.0, 1.0, 0.0)
    intensity_scale: float = 1.0
    redshift: float = 0.0
    name: str = ""


@dataclass
class CameraParams:
    """Camera (gamercamera.h:25-28 defaults; fov is vertical, degrees)."""

    camera: Vec3 = (0.0, 0.0, -5.0)
    target: Vec3 = (0.0, 0.0, 0.0)
    up: Vec3 = (0.0, 1.0, 0.0)
    fov: float = 70.0


@dataclass
class RenderConfig:
    """Rendering knobs (renderingparams.h:19-39 defaults).

    ``min_ray_step`` is 0.001 for full renders, 0.01 for previews
    (rasterizer.cpp:437-442).
    """

    size: int = 128
    ray_step: float = 0.001
    exposure: float = 1.0
    gamma: float = 1.0
    saturation: float = 1.0
    is_preview: bool = False
    # star-field overlay (buffer2d.cpp:140-173); 0 stars disables
    no_stars: int = 0
    star_size: float = 1.0
    star_size_spread: float = 1.0
    star_strength: float = 1.0
    star_seed: int = 0
    # deterministic mode excludes 'stars small' like the oracle (galaxy_repro.py:734-737)
    deterministic: bool = True
    # Noise level-of-detail: None renders the reference-exact octave counts
    # (disk/stars 10, dust/ridged 9, star clouds 4); an int N caps every
    # fractal at N octaves — a preview/fitting speed dial (noise is ~half of
    # kernel time, linear in octaves) with no reference analog. Emissive
    # octave noise is amplitude-normalized so its brightness holds; the
    # absorbing dust fields lose fine occlusion detail and the image
    # brightens somewhat at low caps (same spirit as the reference preview's
    # coarser rayStep, mainwindow.cpp:483-495). Caps >= 10 are bit-identical
    # to None.
    noise_octaves: Optional[int] = None
    # Supersampled anti-aliasing: render at size*supersample and box-average
    # the LINEAR radiance back down before the post chain (averaging before
    # the nonlinear post is the physically correct AA). 1 = off (reference
    # behavior: one ray per pixel, rasterizer.cpp:373-377).
    supersample: int = 1
    # Per-ray sample dithering: offset each ray's march start by a
    # deterministic hash in [0, 1) of its first step, decorrelating the
    # banding that coarse ray steps produce (the technique of the
    # reference's shadertoy fork, galaxy_shadertoy.glsl:564-589 — absent
    # from its main renderer). Off by default (reference-exact sampling).
    dither: bool = False
    # Raw-noise backend for every fractal field. The reference ships three
    # Noise implementations but hardcodes Simplex in every rasterizer ctor
    # (rasterizer.h:57,62,67; Perlin source/noise/perlin.*, IQ value noise
    # source/noise/iqnoise.* are commented-out alternatives). Here they are
    # actually selectable: "simplex" (default, conformance-gated) |
    # "perlin" | "iq". Non-simplex kinds render through the XLA engine only
    # (the production Pallas kernel implements the engine default, like the
    # reference's hardcoding) and are excluded from conformance gates.
    noise_kind: str = "simplex"

    def __post_init__(self):
        if self.noise_kind not in ("simplex", "perlin", "iq"):
            raise ValueError(
                f"noise_kind must be 'simplex', 'perlin' or 'iq', "
                f"got {self.noise_kind!r}"
            )
        if self.noise_octaves is not None:
            if self.noise_octaves != int(self.noise_octaves) \
                    or int(self.noise_octaves) < 1:
                raise ValueError(
                    f"noise_octaves must be an int >= 1 or None, "
                    f"got {self.noise_octaves!r}"
                )
            self.noise_octaves = int(self.noise_octaves)
        if self.supersample != int(self.supersample) or int(self.supersample) < 1:
            raise ValueError(
                f"supersample must be an int >= 1, got {self.supersample!r}"
            )
        self.supersample = int(self.supersample)

    @property
    def min_ray_step(self) -> float:
        return 0.01 if self.is_preview else 0.001


@dataclass
class Scene:
    """A renderable scene: camera + instances + config (replaces the Qt GUI state)."""

    camera: CameraParams = field(default_factory=CameraParams)
    instances: List[GalaxyInstance] = field(default_factory=list)
    config: RenderConfig = field(default_factory=RenderConfig)
    spectra: Optional[Dict[str, Vec3]] = None  # None -> built-ins


# ---------------------------------------------------------------------------
# dict <-> dataclass conversion (JSON-friendly scene-dict API)
# ---------------------------------------------------------------------------


def _to_dict(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _to_dict(v) for k, v in obj.items()}
    return obj


def scene_to_dict(scene: Scene) -> dict:
    return _to_dict(scene)


def galaxy_to_dict(galaxy: GalaxyData) -> dict:
    return _to_dict(galaxy)


def _vec3(v: Sequence[float]) -> Vec3:
    return (float(v[0]), float(v[1]), float(v[2]))


def galaxy_from_dict(d: dict) -> GalaxyData:
    p = d.get("params", {})
    return GalaxyData(
        display_name=d.get("display_name", ""),
        params=GalaxyParams(
            name=p.get("name", "NewGalaxy"),
            axis=_vec3(p.get("axis", (1, 1, 1))),
            bulge_dust=float(p.get("bulge_dust", 0.025)),
            bulge_axis=_vec3(p.get("bulge_axis", (1, 1, 1))),
            winding_b=float(p.get("winding_b", 0.5)),
            winding_n=float(p.get("winding_n", 4.0)),
            no_arms=float(p.get("no_arms", 2.0)),
            arm1=float(p.get("arm1", 0.0)),
            arm2=float(p.get("arm2", math.pi)),
            arm3=float(p.get("arm3", 2 * math.pi)),
            arm4=float(p.get("arm4", 3 * math.pi)),
            inner_twirl=float(p.get("inner_twirl", 0.0)),
            warp_amplitude=float(p.get("warp_amplitude", 0.0)),
            warp_scale=float(p.get("warp_scale", 0.0)),
        ),
        components=[
            ComponentParams(
                class_name=c.get("class_name", "bulge"),
                spectrum=c.get("spectrum", "White"),
                name=c.get("name", "New component"),
                strength=float(c.get("strength", 1.0)),
                arm=float(c.get("arm", 1.0)),
                z0=float(c.get("z0", 0.02)),
                r0=float(c.get("r0", 0.5)),
                inner=float(c.get("inner", 0.0)),
                active=float(c.get("active", 1.0)),
                delta=float(c.get("delta", 0.0)),
                winding=float(c.get("winding", 0.1)),
                scale=float(c.get("scale", 1.0)),
                noise_offset=float(c.get("noise_offset", 0.0)),
                noise_tilt=float(c.get("noise_tilt", 1.0)),
                ks=float(c.get("ks", 1.0)),
            )
            for c in d.get("components", [])
        ],
    )


def scene_from_dict(d: dict) -> Scene:
    cam = d.get("camera", {})
    cfg = d.get("config", {})
    spectra = d.get("spectra")
    return Scene(
        camera=CameraParams(
            camera=_vec3(cam.get("camera", (0, 0, -5))),
            target=_vec3(cam.get("target", (0, 0, 0))),
            up=_vec3(cam.get("up", (0, 1, 0))),
            fov=float(cam.get("fov", 70.0)),
        ),
        instances=[
            GalaxyInstance(
                galaxy=galaxy_from_dict(i["galaxy"]),
                position=_vec3(i.get("position", (0, 0, 0))),
                orientation=_vec3(i.get("orientation", (0, 1, 0))),
                intensity_scale=float(i.get("intensity_scale", 1.0)),
                redshift=float(i.get("redshift", 0.0)),
                name=i.get("name", ""),
            )
            for i in d.get("instances", [])
        ],
        config=RenderConfig(
            size=int(cfg.get("size", 128)),
            ray_step=float(cfg.get("ray_step", 0.001)),
            exposure=float(cfg.get("exposure", 1.0)),
            gamma=float(cfg.get("gamma", 1.0)),
            saturation=float(cfg.get("saturation", 1.0)),
            is_preview=bool(cfg.get("is_preview", False)),
            no_stars=int(cfg.get("no_stars", 0)),
            star_size=float(cfg.get("star_size", 1.0)),
            star_size_spread=float(cfg.get("star_size_spread", 1.0)),
            star_strength=float(cfg.get("star_strength", 1.0)),
            star_seed=int(cfg.get("star_seed", 0)),
            deterministic=bool(cfg.get("deterministic", True)),
            noise_octaves=(int(cfg["noise_octaves"])
                           if cfg.get("noise_octaves") is not None else None),
            supersample=int(cfg.get("supersample", 1)),
            dither=bool(cfg.get("dither", False)),
            noise_kind=str(cfg.get("noise_kind", "simplex")),
        ),
        spectra={k: _vec3(v) for k, v in spectra.items()} if spectra else None,
    )


def default_galaxy(component_count: int = 3) -> GalaxyData:
    """The reference's default galaxy template (galaxy.cpp:111-154 AddComponent)."""
    comps: List[ComponentParams] = [
        ComponentParams(
            class_name="bulge", strength=30.0, r0=5.0, spectrum="Yellow", name="Yellow bulge"
        )
    ]
    if component_count > 1:
        comps.append(
            ComponentParams(
                class_name="disk",
                strength=900.0,
                r0=0.4,
                arm=0.3,
                noise_tilt=0.3,
                spectrum="Blue",
                scale=1.0,
                name="Blue disk",
            )
        )
    if component_count > 2:
        comps.append(
            ComponentParams(
                class_name="dust2",
                strength=250.0,
                r0=0.45,
                arm=0.25,
                z0=0.02,
                noise_tilt=1.0,
                noise_offset=1.0,
                spectrum="Blue",
                scale=3.0,
                name="Red dust",
            )
        )
    return GalaxyData(display_name="NewGalaxy", params=GalaxyParams(), components=comps)
