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


@pytest.fixture(scope="session")
def golden_cache():
    """Disk memo for reference (torch) oracle outputs.

    The reference tree is read-only and its pretrained weights fixed, so
    reference activations for a fixed input are immutable — the expensive
    torch forward passes of the golden tests can be computed once and
    replayed from disk on every subsequent suite run (the single-CPU
    environment makes these the dominant share of golden-test wall time).
    Delete ``tests/.golden_cache`` to force recomputation from the live
    reference; keys are versioned, so changing a test's inputs must bump
    its key.
    """
    import pickle

    d = pathlib.Path(__file__).parent / ".golden_cache"
    d.mkdir(exist_ok=True)

    def memo(key: str, compute):
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in key)
        f = d / f"{safe}.pkl"
        if f.is_file():
            with open(f, "rb") as fh:
                return pickle.load(fh)
        val = compute()
        tmp = f.with_suffix(".tmp")
        with open(tmp, "wb") as fh:
            pickle.dump(val, fh)
        tmp.replace(f)
        return val

    return memo
