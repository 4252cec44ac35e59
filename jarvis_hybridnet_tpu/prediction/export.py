"""AOT-exported predictor artifacts — the TRT-engine-file analog.

The reference saves TensorRT-compiled TorchScript engines per submodel to
``projects/<p>/trt-models/`` and reloads them with trt_mode='previous'
(jarvis/prediction/jarvis3D.py:50-125). Here the *whole fused cascade*
(weights embedded as constants) is exported with ``jax.export`` to a single
serialized artifact that reloads without retracing Python.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import export as jax_export


def wrap_predictor(fn, params_tree, in_shardings=None, out_shardings=None,
                   params_sharding=None):
    """Jit a pure ``(params, imgs)`` predictor, pin its weights on device,
    and attach the AOT rebind contract (``raw_fn`` + ``host_params``) that
    ``export_predictor`` consumes.

    Weights stay jit *arguments* on the live path (constant-embedding
    would re-hash them into every cache key); shardings, when given, make
    the same wrapper serve the multi-chip builders in parallel/.
    """
    kwargs = {}
    if in_shardings is not None:
        kwargs = dict(in_shardings=in_shardings, out_shardings=out_shardings)
    jitted = jax.jit(fn, **kwargs)
    params_dev = (jax.device_put(params_tree, params_sharding)
                  if params_sharding is not None
                  else jax.device_put(params_tree))

    def predictor(imgs):
        return jitted(params_dev, imgs)

    predictor.raw_fn = fn
    predictor.host_params = params_tree
    return predictor


def export_predictor(predict_fn, example_input, path: str) -> None:
    """Serialize a jitted predictor with its weights embedded.

    Live predictors keep weights as jit arguments (cache-key stability,
    predictor3d.py); for the serialized artifact the weights ARE part of
    the deliverable, so they are re-bound here as *host numpy* constants
    (np constants lower without any D2H fetch) via the predictor's
    ``raw_fn``/``host_params`` attributes.
    """
    import numpy as np

    spec = jax.ShapeDtypeStruct(example_input.shape,
                                jnp.dtype(example_input.dtype))
    raw = getattr(predict_fn, "raw_fn", None)
    if raw is not None:
        host_params = jax.tree.map(np.asarray, predict_fn.host_params)
        fn = jax.jit(lambda x: raw(host_params, x))
    else:
        fn = predict_fn
    exported = jax_export.export(fn)(spec)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_predictor(path: str):
    """Load an exported predictor; returns a callable like the original."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)


def list_artifacts(cfg, kind: str) -> list[str]:
    """Saved artifact filenames for ``kind`` under the CURRENT numerics
    config (any input shape). Artifacts exported under a different repro
    mode / dtype are excluded: the driver would refuse to load them, so
    offering them for reuse (e.g. in the interactive wizard) would
    silently fall back to a fresh JIT."""
    probe = artifact_path(cfg, kind, ())
    search, stem = os.path.dirname(probe), os.path.basename(probe)
    tag = stem[len(kind) + 1:]  # "_<tag>.jaxexp" with the empty shape
    if not os.path.isdir(search):
        return []
    return sorted(f for f in os.listdir(search)
                  if f.startswith(kind + "_") and f.endswith(tag))


def artifact_path(cfg, kind: str, shape) -> str:
    """Canonical artifact location: one file per (pipeline, input shape,
    numerics config) — repro mode and compute dtype are part of the key so
    changing them can never silently reload an artifact with different
    numerics (the TRT analog of rebuilding engines on precision change)."""
    tpu = cfg.get("TPU", {})
    tag = (f'{tpu.get("REPRO_MODE", "exact")}-'
           f'{tpu.get("INFERENCE_DTYPE", "bfloat16")}')
    stem = f'{kind}_{"x".join(str(s) for s in shape)}_{tag}.jaxexp'
    return os.path.join(
        cfg.PARENT_DIR, "projects", str(cfg.PROJECT_NAME),
        "compiled-models", stem,
    )
