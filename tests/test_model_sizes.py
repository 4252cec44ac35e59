"""Model-size table tests: the scaled EfficientNet must tap features with
exactly the channel counts the reference's BiFPN expects
(jarvis/efficienttrack/model.py:34-51 conv_channel_coef)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jarvis_hybridnet_tpu.models.efficientnet import (
    EfficientNetFeatures,
    build_block_plan,
    truncate_and_tap,
)
from jarvis_hybridnet_tpu.models.efficienttrack import (
    MODEL_SIZES,
    EfficientTrackBackbone,
)

EXPECTED_CHANNELS = {
    "small": [16, 24, 56],
    "medium": [24, 40, 112],
    "large": [24, 48, 120],
}


@pytest.mark.parametrize("size", ["small", "medium", "large"])
def test_feature_tap_channels(size):
    spec = MODEL_SIZES[size]
    _, blocks = build_block_plan(spec.compound_coef)
    truncated, taps = truncate_and_tap(blocks)
    channels = [truncated[i].out_filters for i in taps]
    assert channels == EXPECTED_CHANNELS[size], (size, channels)
    assert len(taps) == 3


@pytest.mark.parametrize("size", ["medium", "large"])
def test_backbone_builds_and_runs(size):
    model = EfficientTrackBackbone(model_size=size, output_channels=2)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    res1, res2 = jax.jit(model.apply)({"params": params}, x)
    assert res1.shape == (1, 32, 32, 2)
    assert res2.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(res2)).all()


def test_medium_matches_reference_architecture(reference_dir):
    """Param shapes of the 'medium' model must match the reference torch
    model exactly (the converter asserts this transitively)."""
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_dir))
    from jarvis.efficienttrack.model import EfficientTrackBackbone as TorchET

    from jarvis_hybridnet_tpu.models.weights_io import (
        efficienttrack_params_from_torch,
    )

    tmodel = TorchET(None, model_size="medium", output_channels=3)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = efficienttrack_params_from_torch(sd, "medium")

    model = EfficientTrackBackbone(model_size="medium", output_channels=3)
    init = jax.jit(model.init)(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128, 3), jnp.float32))["params"]
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init)[0])
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    assert set(flat_init) == set(flat_conv)
    for k, v in flat_conv.items():
        assert flat_init[k].shape == v.shape, (k, flat_init[k].shape, v.shape)
