"""One-command trained-cascade accuracy eval (reference protocol).

Reproduces BASELINE.md "Trained-cascade accuracy": runs
``analyze_validation_data`` (= reference jarvis/analysis/analyze.py:22-96)
over the project's val split with the given checkpoints and prints the
euclidean mm error stats over all labeled joints as one JSON line.

    JARVIS_PARENT_DIR=/root/repo/work python tools/accuracy_eval.py \
        [--project MonkeyHand] \
        [--weights_center /root/repo/trained/MonkeyHand/CenterDetect_final.ckpt] \
        [--weights_hybridnet /root/repo/trained/MonkeyHand/HybridNet_final.ckpt] \
        [--dir <existing Validation_Predictions_* dir>]   # skip the predict pass
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TRAINED = "/root/repo/trained/MonkeyHand"


def stats_from_dir(out_dir):
    pred = np.loadtxt(os.path.join(out_dir, "points_HybridNet.csv"),
                      delimiter=",")
    gt = np.loadtxt(os.path.join(out_dir, "points_GroundTruth.csv"),
                    delimiter=",")
    pred = pred.reshape(pred.shape[0], -1, 3)
    gt = gt.reshape(gt.shape[0], -1, 3)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", default="MonkeyHand")
    ap.add_argument("--weights_center",
                    default=os.path.join(_TRAINED, "CenterDetect_final.ckpt"))
    ap.add_argument("--weights_hybridnet",
                    default=os.path.join(_TRAINED, "HybridNet_final.ckpt"))
    ap.add_argument("--dir", default=None,
                    help="existing Validation_Predictions_* dir (skip predict)")
    ap.add_argument("--repro-mode", default=None,
                    help="override TPU.REPRO_MODE (exact/half_fused/"
                         "quarter_fused) for protocol-level fidelity rows")
    args = ap.parse_args()

    out_dir = args.dir
    if out_dir is None:
        from jarvis_hybridnet_tpu.analysis.analyze import (
            analyze_validation_data,
        )

        out_dir = analyze_validation_data(
            args.project,
            weights_center=args.weights_center,
            weights_hybridnet=args.weights_hybridnet,
            repro_mode=args.repro_mode,
        )
        if out_dir is None:
            sys.exit(1)

    s = stats_from_dir(out_dir)
    s["dir"] = out_dir
    print(json.dumps(s))


if __name__ == "__main__":
    main()
