"""gamer_tpu — a TPU-native procedural galaxy renderer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MichaelMoroz/gamer
(GAMER: Galaxy Ray Tracer): per-pixel emission-absorption ray marching through
an analytic galaxy model (bulge + spiral-arm disk + dust + stars, modulated by
multi-octave simplex noise), with a scene-dict API, a 19-token-compatible CLI,
golden-image conformance against a spec-exact CPU oracle, and mesh sharding
for multi-chip rendering.
"""

__version__ = "0.1.0"

from .scene import (  # noqa: F401
    CameraParams,
    ComponentParams,
    GalaxyData,
    GalaxyInstance,
    GalaxyParams,
    RenderConfig,
    Scene,
    default_galaxy,
    scene_from_dict,
    scene_to_dict,
)
