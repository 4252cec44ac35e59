"""Cross-grade the trained cascade with the REFERENCE's OWN code.

Round-4's headline accuracy (3.18 mm mean / 2.55 mm median on the
Example_Dataset val split) was produced and graded entirely by this repo's
re-implementation of the protocol. This tool closes that self-grading loop:

1. Export ``trained/MonkeyHand/{CenterDetect,HybridNet}_final.ckpt`` to
   reference-loadable ``.pth`` state dicts (models/weights_io.py, the
   strict-load-tested converter).
2. Run the reference's UNMODIFIED ``analyze_validation_data``
   (/root/reference/jarvis/analysis/analyze.py:22-96) on them — torch CPU,
   with the same CUDA-neutralizing monkeypatches the golden tests use
   (tests/test_predictor_golden.py): ``.cuda()``/``.to('cuda')`` no-ops,
   device='cuda' kwargs stripped, torchvision.resize stubbed with
   F.interpolate. The reference's ProjectManager resolves paths relative to
   its install dir and would write into /root/reference, so its
   ``parent_dir`` is pointed at a sandbox containing a copy of the project
   config and a symlink to the dataset; no reference file is modified.
3. Compute the euclidean-mm stats from the CSVs the reference wrote, with
   the same masking as our eval (GT==0 joints excluded,
   analysis/plotting.py) — and, when given ``--ours-dir`` (a
   Validation_Predictions_* dir produced by OUR analyze), the per-frameset
   prediction agreement between the two frameworks.

Usage:
    python tools/ref_accuracy_eval.py \
        [--ours-dir work/projects/MonkeyHand/analysis/Validation_Predictions_*]

Prints one JSON line with the reference-graded stats.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE = "/root/reference"
TRAINED = os.path.join(REPO, "trained", "MonkeyHand")
SANDBOX = "/tmp/ref_accuracy_eval"


def build_sandbox(work_config: str) -> str:
    """Writable project root for the reference: copied config (workers=0 so
    the DataLoader never pickles the mocked imgaug pipeline) + dataset
    symlink."""
    shutil.rmtree(SANDBOX, ignore_errors=True)
    proj = os.path.join(SANDBOX, "projects", "MonkeyHand")
    os.makedirs(proj)
    os.makedirs(os.path.join(SANDBOX, "datasets"))
    os.symlink(f"{REFERENCE}/datasets/Example_Dataset",
               os.path.join(SANDBOX, "datasets", "Example_Dataset"))
    with open(work_config) as f:
        text = f.read()
    text = re.sub(r"DATALOADER_NUM_WORKERS:\s*\d+",
                  "DATALOADER_NUM_WORKERS: 0", text)
    with open(os.path.join(proj, "config.yaml"), "w") as f:
        f.write(text)
    return SANDBOX


def export_pth() -> tuple[str, str]:
    from jarvis_hybridnet_tpu.training.checkpoints import (
        load_checkpoint,
        save_torch_checkpoint,
    )

    out = os.path.join(SANDBOX, "weights")
    center_pth = os.path.join(out, "CenterDetect_final.pth")
    hybrid_pth = os.path.join(out, "HybridNet_final.pth")
    save_torch_checkpoint(
        load_checkpoint(os.path.join(TRAINED, "CenterDetect_final.ckpt")),
        center_pth, "small", kind="efficienttrack")
    save_torch_checkpoint(
        load_checkpoint(os.path.join(TRAINED, "HybridNet_final.ckpt")),
        hybrid_pth, "small", kind="hybridnet")
    return center_pth, hybrid_pth


def patch_reference_cuda() -> None:
    """CUDA-free reference import (tests/test_predictor_golden.py recipe,
    plus a Tensor.to patch for TorchCamera's .to('cuda') calls,
    reference jarvis/utils/reprojection.py:96-106)."""
    from unittest.mock import MagicMock

    import torch

    sys.path.insert(0, REFERENCE)

    tv = MagicMock()

    def _resize(img, size, **kwargs):
        return torch.nn.functional.interpolate(
            img, size=tuple(size), mode="bilinear", align_corners=False,
            antialias=False)

    tv.functional.resize = _resize
    tv.transforms = tv
    for mod in ("imgaug", "imgaug.augmenters", "imgaug.augmentables",
                "streamlit", "ruamel", "ruamel.yaml"):
        sys.modules[mod] = MagicMock()
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv

    # yacs is not installed here; our CfgNode is its behavior-compatible
    # replacement (config/cfg_node.py) and passes the reference-parity
    # config tests, so the reference's config stack runs on it unmodified.
    # ruamel.yaml is only used by the create-project path, which this tool
    # never exercises.
    import types

    from jarvis_hybridnet_tpu.config.cfg_node import CfgNode

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config

    def _strip(kwargs):
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs = {k: v for k, v in kwargs.items() if k != "device"}
        return kwargs

    for name in ("tensor", "ones", "zeros", "arange"):
        orig = getattr(torch, name)
        setattr(torch, name, lambda *a, _o=orig, **k: _o(*a, **_strip(k)))

    _orig_to = torch.Tensor.to

    def _to(self, *a, **k):
        a = tuple(x for x in a
                  if not (isinstance(x, (str, torch.device))
                          and "cuda" in str(x)))
        if "cuda" in str(k.get("device", "")):
            k = {kk: v for kk, v in k.items() if kk != "device"}
        return _orig_to(self, *a, **k)

    torch.Tensor.to = _to
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.IntTensor = lambda x: torch.as_tensor(x, dtype=torch.int32)


def masked_stats(pred: np.ndarray, gt: np.ndarray) -> dict:
    from jarvis_hybridnet_tpu.analysis.plotting import _masked_distances_mm

    d = _masked_distances_mm(pred, gt)
    return {
        "framesets": int(pred.shape[0]),
        "labeled_joints": int(d.size),
        "mean_mm": round(float(d.mean()), 3),
        "median_mm": round(float(np.median(d)), 3),
        "p95_mm": round(float(np.percentile(d, 95)), 3),
        "max_mm": round(float(d.max()), 3),
    }


def load_run(out_dir: str):
    pred = np.loadtxt(os.path.join(out_dir, "points_HybridNet.csv"),
                      delimiter=",").reshape(-1, 23, 3)
    gt = np.loadtxt(os.path.join(out_dir, "points_GroundTruth.csv"),
                    delimiter=",").reshape(-1, 23, 3)
    names = np.loadtxt(os.path.join(out_dir, "frame_names.csv"),
                       delimiter=",", dtype=str)
    return pred, gt, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours-dir", default=None,
                    help="our Validation_Predictions_* dir for a "
                         "per-frameset prediction-agreement comparison")
    ap.add_argument("--work-config",
                    default=os.path.join(REPO, "work", "projects",
                                         "MonkeyHand", "config.yaml"))
    args = ap.parse_args()

    build_sandbox(args.work_config)
    center_pth, hybrid_pth = export_pth()
    patch_reference_cuda()

    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    # Point the reference's ProjectManager (which computes parent_dir from
    # its own install path, reference project_manager.py:31-34) at the
    # sandbox. Patching the class attribute post-init modifies no file.
    import jarvis.config.project_manager as ref_pm

    _orig_init = ref_pm.ProjectManager.__init__

    def _sandbox_init(self):
        _orig_init(self)
        self.parent_dir = SANDBOX

    ref_pm.ProjectManager.__init__ = _sandbox_init

    from jarvis.analysis.analyze import analyze_validation_data

    analyze_validation_data("MonkeyHand",
                            weights_center=center_pth,
                            weights_hybridnet=hybrid_pth)

    out_dirs = sorted(glob.glob(os.path.join(
        SANDBOX, "projects", "MonkeyHand", "analysis",
        "Validation_Predictions_*")))
    assert out_dirs, "reference analyze wrote no output dir"
    ref_pred, ref_gt, ref_names = load_run(out_dirs[-1])

    result = {"grader": "reference analyze_validation_data (torch CPU)",
              "weights": "trained/MonkeyHand (exported .pth)"}
    result.update(masked_stats(ref_pred, ref_gt))

    if args.ours_dir:
        our_pred, our_gt, our_names = load_run(args.ours_dir)
        # align framesets by name (either side may drop undetected ones)
        ref_idx = {n: i for i, n in enumerate(np.atleast_1d(ref_names))}
        pairs = [(ref_idx[n], i)
                 for i, n in enumerate(np.atleast_1d(our_names))
                 if n in ref_idx]
        ri = [p[0] for p in pairs]
        oi = [p[1] for p in pairs]
        d = np.linalg.norm(ref_pred[ri] - our_pred[oi], axis=-1)
        result["agreement_framesets"] = len(pairs)
        result["pred_agreement_median_mm"] = round(float(np.median(d)), 4)
        result["pred_agreement_p95_mm"] = round(
            float(np.percentile(d, 95)), 4)
        result["pred_agreement_max_mm"] = round(float(d.max()), 4)
        result["ours_stats"] = masked_stats(our_pred, our_gt)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
