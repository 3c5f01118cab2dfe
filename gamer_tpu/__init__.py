"""gamer_tpu — a TPU-native procedural galaxy renderer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MichaelMoroz/gamer
(GAMER: Galaxy Ray Tracer): per-pixel emission-absorption ray marching through
an analytic galaxy model (bulge + spiral-arm disk + dust + stars, modulated by
multi-octave simplex noise), with a scene-dict API, a 19-token-compatible CLI,
golden-image conformance against a spec-exact CPU oracle, and mesh sharding
for multi-chip rendering.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: a fresh process re-rendering a known
# (structure, size) pays ~0 compile time instead of 20 s-7 min (tunneled TPU
# compiles are slow and high-variance). Opt out / redirect with the standard
# JAX_COMPILATION_CACHE_DIR env var; failures (read-only fs, old jax) are
# non-fatal because the cache is a pure optimization.
#
# The directory is partitioned by a host-CPU fingerprint: XLA:CPU AOT
# artifacts bake in the compile machine's target features, and loading them
# on a host with different features risks SIGILL (XLA only warns). A cache
# dir that outlives one machine (home dir persisted across runners) must
# therefore never be shared between CPUs.


def _host_fingerprint() -> str:
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:  # pragma: no cover - non-Linux
        parts.append(platform.processor())
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        and not _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # CPU-forced processes (tests, the driver's multichip dry run) skip the
    # cache entirely: XLA:CPU AOT reloads always warn about its synthetic
    # prefer-no-scatter/gather "machine features", and CPU compiles are
    # cheap. The cache's value is the 20 s-7 min tunneled TPU compiles.
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser(f"~/.cache/gamer_tpu/jax_cache-{_host_fingerprint()}"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover
        pass

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
