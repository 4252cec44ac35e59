"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised on CPU devices
(``--xla_force_host_platform_device_count``); the real-TPU path is covered
by bench.py and the driver's dryrun.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pin JAX_PLATFORMS to a hardware plugin before pytest
# starts; the config update takes precedence over the inherited env var.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy jitted graphs (fused predictors,
# sharded train steps) compile once per source change instead of once per
# test run — the dominant cost of this suite's wall time.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".xla_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.is_dir():
        pytest.skip("reference repo not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def example_dataset(reference_dir):
    d = reference_dir / "datasets" / "Example_Dataset"
    if not d.is_dir():
        pytest.skip("Example_Dataset not available")
    return d
