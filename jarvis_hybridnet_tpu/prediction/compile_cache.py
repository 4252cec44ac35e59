"""Compiled-model caching — the TPU analog of the reference's TensorRT flow.

The reference compiles each submodel to a TensorRT fp16 engine and saves /
reloads TorchScript files under ``projects/<p>/trt-models``
(jarvis/prediction/jarvis2D.py:45-98, jarvis3D.py:50-125; the C++
conv_transpose converter plugins in libs/ exist only to make that possible).
On TPU, XLA lowers everything natively and the same UX maps onto the
persistent compilation cache:

  * 'off'      -> jit only (in-memory cache for the process)
  * 'new'      -> enable the persistent cache; compilations are written to
                  projects/<p>/compiled-models/
  * 'previous' -> enable the persistent cache; previously written
                  executables are loaded instead of recompiled
"""

from __future__ import annotations

import os

# The cache dir this module last configured. Distinguishes "set by us for
# a (possibly different) project" — safe to re-point on a project switch —
# from "set externally" (embedding app, bench harness, test suite), which
# must be respected.
_configured_dir: str | None = None


def configure(cfg, trt_mode: str) -> None:
    global _configured_dir
    if trt_mode not in ("new", "previous"):
        return
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current and current != _configured_dir:
        # A cache dir was configured by someone else — respect it.
        # Stomping the global setting would silently split compilations
        # across directories and defeat the existing cache.
        return
    cache_dir = os.path.join(
        cfg.PARENT_DIR, "projects", str(cfg.PROJECT_NAME), "compiled-models"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _configured_dir = cache_dir
