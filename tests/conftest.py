"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4). Must run before jax
imports anywhere in the test session."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

# Make the reference's pure-numpy helper modules importable as golden
# oracles for parity tests (they depend only on numpy/cv2).
_REF = Path("/root/reference")
if _REF.exists() and str(_REF) not in sys.path:
    sys.path.insert(0, str(_REF))

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS during import; the config
# update is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: with a single host core, compile time
# dominates the suite, and the same programs (UNet forward, 384-step decode
# scan, mesh-sharded variants) are rebuilt by many tests because each
# pipeline instance jits its own closures. The disk cache dedupes them by
# computation hash both within one run and across runs/processes
# (verified: CPU-backend hits). Override the location with
# SD_TEST_COMPILE_CACHE; set it empty to disable.
_cache_dir = os.environ.get(
    "SD_TEST_COMPILE_CACHE",
    str(Path(__file__).resolve().parent.parent / ".jax_test_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (multi-minute "
                          "compiles); default suite skips them to keep "
                          "iteration under ~3 min (VERDICT r1 item 10)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy test; run with "
                   "--runslow or RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def has_reference() -> bool:
    try:
        import derenderer.helper.split  # noqa: F401
        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not importable")
