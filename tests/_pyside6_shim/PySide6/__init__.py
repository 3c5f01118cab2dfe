"""Minimal PySide6 shim (test-only).

Provides just enough of ``PySide6.QtCore`` / ``PySide6.QtGui`` — with Qt's
float32 vector/matrix semantics — to run the reference's in-tree conformance
oracle (``/root/reference/tools/galaxy_repro.py``) in this environment, where
real PySide6 is not installed. Used by ``tests/test_oracle_crosscheck.py`` to
differentially validate :mod:`gamer_tpu.oracle` against the reference oracle.

Precision notes: QVector3D/QMatrix4x4/QQuaternion store float32; lengths and
quaternion norms use double-precision sums (Qt convention); ``normalized()``
skips the divide when fuzzily unit (|len-1| <= 1e-5, Qt6 float semantics).
These match ``gamer_tpu.oracle.qtmath`` by construction, so the cross-check
verifies the rendering math (noise, camera chain, component kernels, march
loop, gates, post-processing), not Qt minutiae.
"""
