"""Pin the committed trained/MonkeyHand artifacts (VERDICT r4 weak #4).

The published accuracy claim (BASELINE.md "Trained-cascade accuracy":
3.18 mm mean / 2.55 mm median on the Example_Dataset val split) lives in
three committed checkpoints. Nothing else in CI loads them, so a revision
that corrupts the checkpoint schema, the `.pth` exporter, or the production
repro defaults would leave the claim silently unreproducible. These tests:

1. load all three checkpoints and check their schema against freshly
   initialized models,
2. run two real val framesets through the full cascade (CPU, production
   quarter_fused numerics) and assert a loose mm bound per frameset,
3. round-trip the HybridNet checkpoint through the reference `.pth`
   exporter/importer (the converter `tools/ref_accuracy_eval.py` relies on).
"""

import os

import jax
import numpy as np
import pytest

from jarvis_hybridnet_tpu.config import ProjectManager
from jarvis_hybridnet_tpu.training.checkpoints import load_checkpoint

TRAINED = "/root/repo/trained/MonkeyHand"


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add((prefix + (k,), tuple(np.shape(v))))
    return out


@pytest.fixture(scope="module")
def cfg(reference_dir):
    pm = ProjectManager(parent_dir=str(reference_dir))
    assert pm.load("Example_Project")
    return pm.get_cfg()


@pytest.fixture(scope="module")
def trained_ckpts():
    if not os.path.isdir(TRAINED):
        pytest.skip("trained/MonkeyHand not present")
    return {name: load_checkpoint(os.path.join(TRAINED, f"{name}_final.ckpt"))
            for name in ("CenterDetect", "KeypointDetect", "HybridNet")}


def test_checkpoint_schema_matches_models(cfg, trained_ckpts):
    """Every leaf path+shape in the committed checkpoints must match a
    freshly initialized model of the configured size — guards both the
    checkpoint files and the model definitions against silent drift."""
    from jarvis_hybridnet_tpu.prediction.loaders import (
        init_efficienttrack_params,
        init_hybridnet_params,
    )

    fresh_center = init_efficienttrack_params(cfg, "CenterDetect", seed=0)
    fresh_hybrid = init_hybridnet_params(cfg, seed=0)
    assert _tree_paths(trained_ckpts["CenterDetect"]) == _tree_paths(
        fresh_center)
    assert _tree_paths(trained_ckpts["KeypointDetect"]) == _tree_paths(
        fresh_hybrid["effTrack"])
    assert _tree_paths(trained_ckpts["HybridNet"]) == _tree_paths(
        fresh_hybrid)


@pytest.mark.slow
def test_trained_cascade_accuracy_bound(cfg, reference_dir):
    """Two real val framesets through the production cascade must land
    within a loose bound (median < 10 mm; committed quality is ~2.5 mm).
    Catches exporter/schema/default rot without retraining anything."""
    if not os.path.isdir(TRAINED):
        pytest.skip("trained/MonkeyHand not present")
    from jarvis_hybridnet_tpu.dataset.dataset3d import Dataset3D
    from jarvis_hybridnet_tpu.prediction.loaders import make_predictor3d

    cfg.TPU.REPRO_MODE = "quarter_fused"  # the production default
    ds = Dataset3D(cfg, set="val", analysisMode=True)
    T = 2
    imgs, gts = [], []
    for i in range(T):
        s = ds[i]
        imgs.append(s["imgs"])
        gts.append(s["keypoints3D"])
    rig = ds.rigs[ds.dataset["framesets"][ds.frameset_keys[0]]
                  ["datasetName"]]
    predictor = make_predictor3d(
        cfg, rig,
        weights_center_detect=os.path.join(TRAINED,
                                           "CenterDetect_final.ckpt"),
        weights_hybridnet=os.path.join(TRAINED, "HybridNet_final.ckpt"),
    )
    pts, conf, valid = predictor(np.stack(imgs))
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.all(), "trained cascade failed the detection gate"
    for t in range(T):
        gt = np.asarray(gts[t], dtype=np.float32)
        labeled = np.any(gt != 0.0, axis=-1)
        assert labeled.any()
        d = np.linalg.norm(pts[t] - gt, axis=-1)[labeled]
        assert np.median(d) < 10.0, f"frameset {t}: median {np.median(d)}"
        assert np.isfinite(d).all()


def test_hybridnet_pth_roundtrip(cfg, trained_ckpts):
    """trained ckpt -> reference .pth state dict -> back: bit-identical.
    This is the exact conversion the reference cross-grading used
    (tools/ref_accuracy_eval.py, BASELINE.md round-5 section)."""
    torch = pytest.importorskip("torch")
    from jarvis_hybridnet_tpu.models import weights_io

    size = str(cfg.KEYPOINTDETECT.MODEL_SIZE)
    sd = weights_io.hybridnet_params_to_torch(trained_ckpts["HybridNet"],
                                              size)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}
    back = weights_io.hybridnet_params_from_torch(
        {k: v.numpy() for k, v in sd_t.items()}, size)
    orig_leaves = jax.tree_util.tree_leaves_with_path(
        trained_ckpts["HybridNet"])
    back_flat = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(orig_leaves) == len(back_flat)
    for path, leaf in orig_leaves:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(back_flat[path]),
                                      err_msg=str(path))
