"""Test configuration.

Forces JAX onto the host CPU backend with 8 virtual devices BEFORE jax is
imported anywhere, so mesh/sharding tests exercise real multi-device code
paths without TPU hardware (the driver validates the same thing via
``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (TPU tunnel) registers its plugin at interpreter
# start and forces jax_platforms="axon,cpu" through jax.config, which
# overrides the env var — override it back before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
FIXTURES = REFERENCE / "publish" / "data" / "galaxies"

sys.path.insert(0, str(REPO))

# Persistent compilation cache: XLA:CPU compiles dominate the suite on a
# 1-CPU box (a 24^2 conformance render costs ~20 s of compile vs ~1 s of
# math). First run populates .jax_cache; every later run skips straight to
# the math. Safe under pytest-xdist (atomic cache writes) and keyed by
# platform, so TPU entries from bench.py coexist.
from gamer_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free jax's compiled-executable caches at each module boundary.

    The full suite (~180 tests) has twice segfaulted inside XLA:CPU around
    test ~160 / hour ~2 of a single process — different tests each time,
    both green standalone — i.e. a process-longevity failure, not a test
    bug. Dropping the accumulated executables between modules keeps the
    per-process live-compilation count bounded. (Module-level lru_cache
    wrappers in the engine keep their already-compiled callables, which
    remain valid — only jax's internal caches are cleared.)
    """
    yield
    import jax

    jax.clear_caches()


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    if not FIXTURES.is_dir():
        pytest.skip("reference fixtures not mounted")
    return FIXTURES


@pytest.fixture(scope="session")
def reference_tools_dir() -> Path:
    d = REFERENCE / "tools"
    if not d.is_dir():
        pytest.skip("reference tools not mounted")
    return d
