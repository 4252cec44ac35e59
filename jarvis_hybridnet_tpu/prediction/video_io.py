"""Host-side video decode pipeline.

Replaces the reference's per-frame joblib thread reads
(jarvis/prediction/predict3D.py:75-80) with a prefetching, frame-batching
reader: a background thread decodes ahead into a bounded queue while the TPU
consumes the previous batch, so device compute and host decode overlap. The
reader yields (T, C, H, W, 3) float32 RGB batches sized for the jitted
predictor's static shape (the tail batch is zero-padded + masked).
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def get_video_paths(recording_path: str, camera_names: list[str]) -> list[str]:
    """Match video files to calibration camera names
    (reference: predict3D.py:124-133)."""
    videos = os.listdir(recording_path)
    video_paths = []
    for i, camera in enumerate(camera_names):
        for video in videos:
            if camera == video.split(".")[0]:
                video_paths.append(os.path.join(recording_path, video))
        assert len(video_paths) == i + 1, (
            "Missing Recording for camera " + camera
        )
    return video_paths


class MultiCameraReader:
    """Synchronized multi-camera video reader with background prefetch."""

    def __init__(
        self,
        video_paths: list[str],
        frame_start: int = 0,
        number_frames: int = -1,
        batch_size: int = 4,
        prefetch: int = 2,
    ):
        assert cv2 is not None, "OpenCV is required for video decoding"
        self.caps = []
        img_size = None
        for path in video_paths:
            cap = cv2.VideoCapture(path)
            if frame_start:
                cap.set(cv2.CAP_PROP_POS_FRAMES, frame_start)
            size = (
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            )
            assert img_size is None or img_size == size, (
                "All videos need to have the same resolution"
            )
            img_size = size
            self.caps.append(cap)
        self.img_size = img_size
        total = int(self.caps[0].get(cv2.CAP_PROP_FRAME_COUNT))
        if number_frames == -1:
            number_frames = total - frame_start
        else:
            assert frame_start + number_frames <= total, (
                "make sure your selected segment is not longer than the "
                "total video!"
            )
        self.number_frames = number_frames
        self.batch_size = batch_size
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        C = len(self.caps)
        W, H = self.img_size
        remaining = self.number_frames
        while remaining > 0:
            n = min(self.batch_size, remaining)
            # uint8 RGB batches: the device-side predictor performs the /255
            # scaling, so host->device transfer is 4x smaller than float32
            batch = np.zeros((self.batch_size, C, H, W, 3), np.uint8)
            ok = n
            for t in range(n):
                for c, cap in enumerate(self.caps):
                    ret, img = cap.read()
                    if not ret:
                        ok = t
                        break
                    batch[t, c] = img[:, :, ::-1]  # BGR -> RGB
                if ok == t:
                    break
            if ok == 0:
                break
            self._queue.put((batch, ok))
            remaining -= ok
            if ok < n:
                break
        self._queue.put(None)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            yield item

    def release(self):
        for cap in self.caps:
            cap.release()


class SingleVideoReader(MultiCameraReader):
    """Single-camera variant yielding (T, H, W, 3) batches."""

    def __init__(self, video_path: str, **kwargs):
        super().__init__([video_path], **kwargs)

    def __iter__(self):
        for batch, n in super().__iter__():
            yield batch[:, 0], n
