"""Spec-exact CPU reference renderer (conformance oracle).

This subpackage is the differential-testing datum for the TPU engine, in the
same role ``tools/galaxy_repro.py`` plays for the reference C++ binary. It is
pure numpy, mirrors the reference's mixed precision model (f32 Qt vectors,
f64 scalars), and is deliberately structured differently from the JAX engine
so agreement between the two is meaningful.
"""

from .reference import render_oracle, OracleTimings  # noqa: F401
