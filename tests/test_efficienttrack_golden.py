"""Golden-value tests: flax EfficientTrack vs the reference torch model.

Loads the bundled pretrained weights into both the reference PyTorch
implementation (imported from /root/reference, CPU) and the flax
re-implementation (via the .pth converter), then compares activations on the
same input. This pins every architectural quirk: InstanceNorm, full-conv
blocks for stages < 4, missing norm after expansion, BiFPN fusion weights,
Softplus head merge, transposed-conv head.
"""

import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

PRETRAIN = "/root/reference/pretrained/MonkeyHand/EfficientTrack_Center-small.pth"


@pytest.fixture(scope="module")
def torch_model(reference_dir):
    sys.path.insert(0, str(reference_dir))
    from jarvis.efficienttrack.model import EfficientTrackBackbone as TorchET

    model = TorchET(None, model_size="small", output_channels=1)
    sd = torch.load(PRETRAIN, map_location="cpu", weights_only=True)
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_setup():
    from jarvis_hybridnet_tpu.models.efficienttrack import EfficientTrackBackbone
    from jarvis_hybridnet_tpu.models.weights_io import (
        efficienttrack_params_from_torch,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(PRETRAIN)
    params = efficienttrack_params_from_torch(sd, "small")
    model = EfficientTrackBackbone(model_size="small", output_channels=1)
    return model, params


def test_param_tree_complete(flax_setup):
    """Every param the flax model initializes must be filled by the converter."""
    import jax

    model, params = flax_setup
    rng = jax.random.PRNGKey(0)
    init = jax.jit(model.init)(rng, np.zeros((1, 64, 64, 3), np.float32))["params"]
    init_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(init)[0]}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    assert init_paths == conv_paths, (
        sorted(init_paths - conv_paths), sorted(conv_paths - init_paths))
    # shapes agree
    flat_i = dict(jax.tree_util.tree_flatten_with_path(init)[0])
    for p, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        assert flat_i[p].shape == v.shape, (p, flat_i[p].shape, v.shape)


def test_full_forward_matches_reference(torch_model, flax_setup):
    rng = np.random.default_rng(42)
    img = rng.random((1, 256, 256, 3), dtype=np.float32)

    with torch.no_grad():
        t_res1, t_res2 = torch_model(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )
    t_res1 = t_res1.numpy()
    t_res2 = t_res2.numpy()

    model, params = flax_setup
    j_res1, j_res2 = jax.jit(model.apply)({"params": params}, img)
    j_res1 = np.asarray(j_res1).transpose(0, 3, 1, 2)
    j_res2 = np.asarray(j_res2).transpose(0, 3, 1, 2)

    assert j_res1.shape == t_res1.shape == (1, 1, 64, 64)
    assert j_res2.shape == t_res2.shape == (1, 1, 128, 128)

    scale = np.abs(t_res2).max()
    err1 = np.abs(j_res1 - t_res1).max()
    err2 = np.abs(j_res2 - t_res2).max()
    # float32 tolerance relative to heatmap dynamic range (~255)
    assert err1 < 1e-3 * max(scale, 1.0), err1
    assert err2 < 1e-3 * max(scale, 1.0), err2

    # The argmax (the actual detection) must agree exactly.
    assert np.argmax(j_res2) == np.argmax(t_res2)


def test_keypoint_head_weights_load(flax_setup):
    """Keypoints checkpoint (23 joints) converts with matching head shape."""
    from jarvis_hybridnet_tpu.models.weights_io import (
        efficienttrack_params_from_torch,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(
        "/root/reference/pretrained/MonkeyHand/EfficientTrack_Keypoints-small.pth"
    )
    params = efficienttrack_params_from_torch(sd, "small", num_joints=23)
    assert params["final_conv1"]["kernel"].shape == (3, 3, 64, 23)
    assert params["deconv1"]["kernel"].shape == (4, 4, 23, 64)
    # drop_head path: head params omitted when joint counts differ
    partial = efficienttrack_params_from_torch(
        sd, "small", num_joints=10, drop_head=True
    )
    assert "final_conv1" not in partial and "deconv1" not in partial


def test_roundtrip_torch_export(flax_setup, torch_model):
    """flax -> .pth export loads strict into the reference architecture."""
    from jarvis_hybridnet_tpu.models.weights_io import (
        efficienttrack_params_to_torch,
    )

    _, params = flax_setup
    sd = efficienttrack_params_to_torch(params, "small")
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    missing, unexpected = torch_model.load_state_dict(tensors, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected
