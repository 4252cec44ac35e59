"""Per-component cost profile of the Dataset3D train sample build.

Profiles the PRODUCTION thin host<->device contract
(``device_targets=True``, training/trainer3d.py:_build_steps — raw uint8
crops ship, Gaussian GT volumes render on device), so the components are:

  a) full train item            (decode+crop, aug, uint8 pack)
  b) item with aug disabled     (augpipe swapped for identity)
  c) native decode+crop alone

aug = a - b; other-GIL (index, uint8 convert, collate prep) = b - c.
Medians over reps, differenced on the SAME dataset so numbers are
comparable despite this VM's noisy allocator. The GIL-holding fraction
(everything but c) is the Amdahl ceiling for the thread-mode loader;
process mode has none, so cores-to-match-device = device_rate * a.
For reference it also times the HOST-side 3D target synthesis the thin
contract removed from the sample path (pre-round-4 it was the largest
GIL component at 26.4 ms).

Usage: PYTHONPATH=. python tools/train_host_profile.py \
           [n_samples] [device_samples_per_s]
"""

import statistics
import sys
import time

import numpy as np

from jarvis_hybridnet_tpu.config import ProjectManager
from jarvis_hybridnet_tpu.dataset.dataset3d import Dataset3D
from jarvis_hybridnet_tpu.ops.heatmap import gaussian_heatmaps_3d


def med_ms(fn, reps):
    ts = []
    for r in reps:
        t0 = time.perf_counter()
        fn(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    pm = ProjectManager(parent_dir="/root/reference")
    assert pm.load("Example_Project")
    cfg = pm.get_cfg()

    ds = Dataset3D(cfg, set="train", device_targets=True)
    idxs = [i % len(ds) for i in range(n)]
    for i in idxs[:4]:  # warm page cache
        ds[i]

    full = med_ms(lambda i: ds[i], idxs)

    real_augpipe = ds.augpipe
    ds.augpipe = lambda img: (img, None)  # identity aug, same code path
    try:
        no_aug = med_ms(lambda i: ds[i], idxs)
    finally:
        ds.augpipe = real_augpipe

    bbox = int(cfg.KEYPOINTDETECT.BOUNDING_BOX_SIZE)

    def decode_only(i):
        key = ds.frameset_keys[i]
        fs = ds.dataset["framesets"][key]
        frame_ids = fs["frames"]
        if ds.use_idxs is not None:
            frame_ids = [frame_ids[j] for j in ds.use_idxs]
        center = np.full((len(frame_ids), 2), 128, np.int32)
        h = bbox // 2
        for ci, img_id in enumerate(frame_ids):
            bboxs, _ = ds._load_annotations(img_id, is_id=True)
            cx = int((bboxs[0, 0] + int(bboxs[0, 2])) / 2)
            cy = int((bboxs[0, 1] + int(bboxs[0, 3])) / 2)
            w = int(ds.imgs[img_id].get("width", 1280))
            hh = int(ds.imgs[img_id].get("height", 1024))
            center[ci] = (min(max(h, cx), w - h), min(max(h, cy), hh - h))
        out = ds._native_crops(
            frame_ids, center, bbox,
            int(ds.imgs[frame_ids[0]].get("width", 1280)),
            int(ds.imgs[frame_ids[0]].get("height", 1024)))
        assert out is not None, "native pipeline unavailable"

    dec = med_ms(decode_only, idxs)

    cube = float(cfg.HYBRIDNET.ROI_CUBE_SIZE)
    spacing = float(cfg.HYBRIDNET.GRID_SPACING)
    g2 = int(cube / spacing / 2.0)
    kp3d = ds.keypoints3D[idxs[0]]
    kp_vox = (kp3d + cube / 2.0) / spacing / 2.0
    # NOT in the thin-contract sample path — measured only to quantify
    # what moving targets on-device removed from the host budget
    tgt = med_ms(lambda _: gaussian_heatmaps_3d(kp_vox, kp3d, g2),
                 range(len(idxs)))

    # PRODUCTION default since round 5 (TPU.DEVICE_AUG): the host skips
    # the color pass entirely and ships raw uint8 + a parameter record
    # sampled in microseconds (ops/augment.py)
    ds.device_aug = True
    try:
        dev_aug_item = med_ms(lambda i: ds[i], idxs)
    finally:
        ds.device_aug = False

    aug = full - no_aug
    other = no_aug - dec
    gil = aug + max(0.0, other)
    gil_frac = gil / full

    print(f"samples: {n} (medians, thin contract: device_targets=True)")
    print(f"PRODUCTION item (TPU.DEVICE_AUG on): {dev_aug_item:8.2f} "
          f"ms/sample ({1e3 / dev_aug_item:.2f} samples/s single-core)")
    print(f"host-aug item (TPU.DEVICE_AUG off — the split below):")
    print(f"full train item:             {full:8.2f} ms/sample "
          f"({1e3 / full:.2f} samples/s single-core)")
    print(f"  native decode+crop (C++, GIL-free): {dec:8.2f} ms "
          f"({dec / full * 100:4.1f}%)")
    print(f"  augmentation (GIL):                 {aug:8.2f} ms "
          f"({aug / full * 100:4.1f}%)")
    print(f"  uint8/index/other (GIL):            {other:8.2f} ms "
          f"({other / full * 100:4.1f}%)")
    print(f"[removed by thin contract: host 3D targets would be "
          f"{tgt:.2f} ms]")
    print(f"GIL-holding fraction: {gil_frac * 100:.1f}% -> thread-mode "
          f"Amdahl ceiling {1.0 / gil_frac:.2f}x; process mode has none")
    dev = float(sys.argv[2]) if len(sys.argv) > 2 else 61.8  # B=8, r4
    print(f"process-mode cores to match device ({dev} samples/s): "
          f"{dev * full / 1e3:.1f} with host aug, "
          f"{dev * dev_aug_item / 1e3:.1f} with device aug")


if __name__ == "__main__":
    main()
