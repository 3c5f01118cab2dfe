"""Profiling hooks — the tracing/observability subsystem (SURVEY §5).

The reference has only wall-clock scope timers (util.h:24-31) and a percent
counter; here:

  - `profile_trace(dir)`: context manager around jax.profiler.trace — dumps
    a TensorBoard/XProf trace of device execution (the sampling profiler
    the reference lacks)
  - `RenderStats`: rays/sec + Msamples/sec counters from frame timings,
    the BASELINE.json metric surface
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace into log_dir (viewable in xprof/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RenderStats:
    """Running throughput counters (rays/s, Msamples/s, frame times)."""

    samples_per_pixel: float = 0.0  # measured by the oracle for the preset
    frames: List[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def frame(self, n_pixels: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.frames.append({"pixels": n_pixels, "seconds": dt})

    @property
    def rays_per_sec(self) -> float:
        px = sum(f["pixels"] for f in self.frames)
        s = sum(f["seconds"] for f in self.frames)
        return px / s if s else 0.0

    @property
    def msamples_per_sec(self) -> float:
        return self.rays_per_sec * self.samples_per_pixel / 1e6

    def summary(self) -> dict:
        return {
            "frames": len(self.frames),
            "rays_per_sec": round(self.rays_per_sec, 1),
            "msamples_per_sec": round(self.msamples_per_sec, 3),
            "total_seconds": round(sum(f["seconds"] for f in self.frames), 4),
        }
