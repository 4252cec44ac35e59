"""Golden tests for the 3D stage vs the reference torch implementation.

The reference ReprojectionLayer hard-codes CUDA placement
(repro_layer.py:35,47,98); the fixtures below monkeypatch torch's tensor
factories to run it on CPU unchanged.
"""

import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jarvis_hybridnet_tpu.config import get_default_cfg


@pytest.fixture()
def cpu_torch(monkeypatch):
    """Make the reference's .cuda()/device='cuda' calls no-ops on CPU."""
    orig_ones, orig_arange = torch.ones, torch.arange

    def _strip(kwargs):
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs = {k: v for k, v in kwargs.items() if k != "device"}
        return kwargs

    monkeypatch.setattr(torch, "ones",
                        lambda *a, **k: orig_ones(*a, **_strip(k)))
    monkeypatch.setattr(torch, "arange",
                        lambda *a, **k: orig_arange(*a, **_strip(k)))
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    return torch


@pytest.fixture(scope="module")
def rig():
    from jarvis_hybridnet_tpu.utils.calibration import load_camera_rigs

    return load_camera_rigs("/root/reference/datasets/Example_Dataset")[
        "12Cam_Ralph"
    ]


def _make_cfg():
    cfg = get_default_cfg()
    cfg.HYBRIDNET.ROI_CUBE_SIZE = 64
    cfg.HYBRIDNET.GRID_SPACING = 2
    cfg.HYBRIDNET.NUM_CAMERAS = 12
    cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE = 256
    cfg.KEYPOINTDETECT.NUM_JOINTS = 5
    return cfg


def test_repro_layer_matches_reference(cpu_torch, rig, reference_dir,
                                       golden_cache):
    sys.path.insert(0, str(reference_dir))
    from jarvis_hybridnet_tpu.models.repro import reprojection_layer

    cfg = _make_cfg()
    C, J, hs = 12, 5, 130  # hs = 256/2 + 2
    G = 32

    rng = np.random.default_rng(0)
    heatmaps = rng.random((1, C, J, hs, hs), dtype=np.float32) * 255.0
    center3d = np.array([[4, 100, 500]], dtype=np.int64)

    # crop centers: project the cube center into each camera, clamp
    from jarvis_hybridnet_tpu.utils.reprojection import project_points

    centers = np.asarray(
        project_points(
            center3d[0].astype(np.float32),
            rig.camera_matrices, rig.intrinsics, rig.distortions,
        )
    ).astype(np.int64)  # (C, 2)
    centers[:, 0] = centers[:, 0].clip(128, 1280 - 128)
    centers[:, 1] = centers[:, 1].clip(128, 1024 - 128)
    center_hm = centers[None]

    def torch_oracle():
        from jarvis.hybridnet.repro_layer import ReprojectionLayer as TorchRepro

        layer = TorchRepro(cfg)
        with torch.no_grad():
            return layer(
                torch.from_numpy(heatmaps),
                torch.from_numpy(center3d.astype(np.float32)),
                torch.from_numpy(center_hm),
                torch.from_numpy(rig.camera_matrices[None]),
                torch.from_numpy(rig.intrinsics[None]),
                torch.from_numpy(rig.distortions[None]),
            ).numpy()

    t_out = golden_cache("repro_layer_12cam_seed0_v1", torch_oracle)

    j_out = np.asarray(
        reprojection_layer(
            heatmaps,
            center3d,
            center_hm,
            rig.camera_matrices[None],
            rig.intrinsics[None],
            rig.distortions[None],
            G,
            2.0,
        )
    ).transpose(0, 4, 1, 2, 3)  # NDHWC -> (B, J, G, G, G)

    assert t_out.shape == j_out.shape == (1, J, G, G, G)
    # Values are camera-means of gathered heatmap samples in [0, 255].
    # Identical indices -> identical values; tolerate a tiny fraction of
    # voxels whose f32 index rounding lands on the neighboring pixel.
    diff = np.abs(t_out - j_out)
    mismatched = np.mean(diff > 1e-3)
    assert mismatched < 2e-3, f"mismatched fraction {mismatched}"
    assert np.median(diff) < 1e-4


def test_v2v_matches_reference(reference_dir, golden_cache):
    sys.path.insert(0, str(reference_dir))
    from jarvis_hybridnet_tpu.models.v2v import V2VNet
    from jarvis_hybridnet_tpu.models.weights_io import (
        v2v_params_from_torch,
        v2v_params_to_torch,
    )

    J, G = 5, 32
    rng = np.random.default_rng(1)
    vol = rng.random((1, J, G, G, G), dtype=np.float32)

    def torch_oracle():
        from jarvis.hybridnet.v2vnet import V2VNet as TorchV2V

        torch.manual_seed(0)
        tmodel = TorchV2V(J, J)
        tmodel.eval()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        with torch.no_grad():
            out = tmodel(torch.from_numpy(vol)).numpy()  # (1, J, G/2, ...)
        return sd, out

    sd, t_out = golden_cache("v2v_seed0_v1", torch_oracle)
    params = v2v_params_from_torch(sd)

    model = V2VNet(J)
    j_out = jax.jit(model.apply, static_argnames='deterministic')(
        {"params": params}, vol.transpose(0, 2, 3, 4, 1), deterministic=True
    )
    j_out = np.asarray(j_out).transpose(0, 4, 1, 2, 3)

    assert t_out.shape == j_out.shape == (1, J, G // 2, G // 2, G // 2)
    err = np.abs(t_out - j_out).max()
    assert err < 5e-5, err

    # round-trip export loads strict (fresh torch module; construction is
    # cheap — only the cached forward pass is expensive)
    from jarvis.hybridnet.v2vnet import V2VNet as TorchV2V

    tmodel = TorchV2V(J, J)
    sd_back = v2v_params_to_torch(params)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd_back.items()}
    missing, unexpected = tmodel.load_state_dict(tensors, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    np.testing.assert_allclose(
        tmodel.state_dict()["output_layer.weight"].numpy(),
        sd["output_layer.weight"], rtol=0, atol=0)


def test_full_hybridnet_matches_reference(cpu_torch, rig, reference_dir,
                                          monkeypatch, golden_cache):
    """End-to-end: crops -> 2D net -> repro -> V2V -> soft-argmax."""
    sys.path.insert(0, str(reference_dir))
    # Stub imgaug (unavailable) which the reference model module imports
    # transitively via jarvis.dataset.dataset3D.
    from unittest.mock import MagicMock

    for mod in ("imgaug", "imgaug.augmenters", "imgaug.augmentables",
                "torchvision", "torchvision.transforms"):
        sys.modules.setdefault(mod, MagicMock())
    monkeypatch.setattr(
        torch.cuda, "IntTensor", lambda x: torch.tensor(x, dtype=torch.int32),
        raising=False,
    )

    from jarvis_hybridnet_tpu.models.hybridnet import HybridNetBackbone
    from jarvis_hybridnet_tpu.models.weights_io import (
        hybridnet_params_from_torch,
    )

    cfg = _make_cfg()
    cfg.KEYPOINTDETECT.MODEL_SIZE = "small"
    cfg.DATASET.DATASET_ROOT_DIR = "datasets"
    C, J, S, G = 12, 5, 256, 32

    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((1, C, 3, S, S), dtype=np.float32)
    center3d = np.array([[4, 100, 500]], dtype=np.int64)

    from jarvis_hybridnet_tpu.utils.reprojection import project_points

    centers = np.asarray(
        project_points(center3d[0].astype(np.float32), rig.camera_matrices,
                       rig.intrinsics, rig.distortions)
    ).astype(np.int64)
    centers[:, 0] = centers[:, 0].clip(128, 1280 - 128)
    centers[:, 1] = centers[:, 1].clip(128, 1024 - 128)
    center_hm = centers[None]

    def torch_oracle():
        from jarvis.hybridnet.model import HybridNetBackbone as TorchHybrid

        torch.manual_seed(0)
        tmodel = TorchHybrid(cfg)
        tmodel.eval()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        img_size = torch.tensor([1280, 1024])
        with torch.no_grad():
            hm, _pad, pts, conf = tmodel(
                torch.from_numpy(imgs),
                img_size,
                torch.from_numpy(center_hm),
                torch.from_numpy(center3d),
                torch.from_numpy(rig.camera_matrices[None]),
                torch.from_numpy(rig.intrinsics[None]),
                torch.from_numpy(rig.distortions[None]),
            )
        return sd, hm.numpy(), pts.numpy(), conf.numpy()

    sd, t_hm, t_pts, t_conf = golden_cache(
        "full_hybridnet_seed0_v1", torch_oracle)

    model = HybridNetBackbone(
        num_joints=J, model_size="small", roi_cube_size=64, grid_spacing=2
    )
    params = hybridnet_params_from_torch(sd, "small")
    j_hm, j_pad, j_pts, j_conf = jax.jit(model.apply)(
        {"params": params},
        imgs.transpose(0, 1, 3, 4, 2),
        center_hm,
        center3d,
        rig.camera_matrices[None],
        rig.intrinsics[None],
        rig.distortions[None],
    )

    j_pts = np.asarray(j_pts)
    assert t_pts.shape == j_pts.shape == (1, J, 3)
    # <2 mm fidelity target; random weights give diffuse volumes, which is
    # the hardest case for soft-argmax agreement.
    assert np.abs(t_pts - j_pts).max() < 0.5, (t_pts, j_pts)
    assert np.abs(t_conf - np.asarray(j_conf)).max() < 1e-3
    # volumes agree (double-Softplus output)
    j_vol = np.asarray(j_hm).transpose(0, 4, 1, 2, 3)
    assert np.abs(t_hm - j_vol).max() < 1e-2


def test_hybridnet_loss_matches_reference(reference_dir):
    sys.path.insert(0, str(reference_dir))
    from jarvis.hybridnet.loss import MSELoss as TorchLoss

    from jarvis_hybridnet_tpu.models.hybridnet import hybridnet_mse_loss

    rng = np.random.default_rng(2)
    B, J, g = 2, 4, 8
    pred = rng.random((B, J, g, g, g), dtype=np.float32)
    gt = rng.random((B, J, g, g, g), dtype=np.float32) * 2.0
    gt[0, 1] = 0.0  # unlabeled joint -> skipped
    t_loss = TorchLoss()(torch.from_numpy(pred), torch.from_numpy(gt)).item()
    j_loss = float(
        hybridnet_mse_loss(
            pred.transpose(0, 2, 3, 4, 1), gt.transpose(0, 2, 3, 4, 1)
        )
    )
    assert abs(t_loss - j_loss) < 1e-4 * max(abs(t_loss), 1.0)
