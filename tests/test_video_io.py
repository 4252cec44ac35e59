"""MultiCameraReader: synchronized multi-camera decode with a
host-adaptive worker pool (prediction/video_io.py).

Frames are encoded with a per-(camera, frame) marker block so the tests
can verify that every yielded frameset carries the right frame of the
right camera in the right slot — for every worker-pool size, including
fewer workers than cameras (cameras partitioned across workers) and the
single-worker degenerate case.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from jarvis_hybridnet_tpu.prediction.video_io import MultiCameraReader

C, N, H, W = 3, 10, 64, 96


def _marker(cam: int, frame: int) -> int:
    # grayscale level unique per (cam, frame); MJPG-safe margins
    return 30 + cam * 60 + frame * 4


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    paths = []
    for c in range(C):
        p = str(d / f"Camera_{c}.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 30, (W, H))
        for f in range(N):
            img = np.full((H, W, 3), _marker(c, f), np.uint8)
            w.write(img)
        w.release()
        paths.append(p)
    return paths


@pytest.mark.parametrize("num_threads", [1, 2, C])
def test_framesets_synchronized(videos, num_threads):
    reader = MultiCameraReader(videos, batch_size=4,
                               num_threads=num_threads)
    seen = 0
    for batch, n in reader:
        assert batch.shape == (4, C, H, W, 3)
        for t in range(n):
            f = seen + t
            for c in range(C):
                val = int(batch[t, c, H // 2, W // 2, 0])
                assert abs(val - _marker(c, f)) <= 6, (f, c, val)
        seen += n
        reader.recycle(batch)
    assert seen == N
    reader.release()


def test_frame_range_and_tail(videos):
    reader = MultiCameraReader(videos, frame_start=3, number_frames=5,
                               batch_size=4, num_threads=2)
    counts = []
    first_vals = []
    for batch, n in reader:
        counts.append(n)
        first_vals.append(int(batch[0, 0, H // 2, W // 2, 0]))
        reader.recycle(batch)
    assert counts == [4, 1]  # 5 frames in batches of 4
    # first yielded frame is frame_start
    assert abs(first_vals[0] - _marker(0, 3)) <= 6
    reader.release()


def test_bounded_ring_blocks_then_progresses(videos):
    """With a tiny ring and a slow consumer, the reader must neither
    deadlock nor allocate beyond its bound."""
    reader = MultiCameraReader(videos, batch_size=2, prefetch=1,
                               num_threads=2)
    held = []
    out = []
    for batch, n in reader:
        held.append(batch)  # consumer hoards buffers...
        out.append(n)
        if len(held) >= 2:
            reader.recycle(held.pop(0))  # ...then recycles late
    for b in held:
        reader.recycle(b)
    assert sum(out) == N
    assert reader._n_alloc <= reader._max_buffers
    reader.release()


# ---------------------------------------------------------------- native ---

native = pytest.importorskip("jarvis_hybridnet_tpu.native")
needs_native_video = pytest.mark.skipif(
    not native.video_available(), reason="native video decode unavailable")


@needs_native_video
@pytest.mark.parametrize("num_threads", [1, 2, C])
def test_native_framesets_synchronized(videos, num_threads):
    from jarvis_hybridnet_tpu.prediction.video_io import (
        NativeMultiCameraReader,
    )

    reader = NativeMultiCameraReader(videos, batch_size=4,
                                     num_threads=num_threads)
    assert reader.img_size == (W, H) and reader.number_frames == N
    seen = 0
    for batch, n in reader:
        assert batch.shape == (4, C, H, W, 3)
        for t in range(n):
            f = seen + t
            for c in range(C):
                val = int(batch[t, c, H // 2, W // 2, 0])
                assert abs(val - _marker(c, f)) <= 6, (f, c, val)
        seen += n
        reader.recycle(batch)
    assert seen == N
    reader.release()


@needs_native_video
def test_native_matches_cv2_bitwise(videos):
    """The libav decode path must reproduce cv2's RGB frames exactly
    (same libjpeg-family JPEG decode + BT.601 full-range conversion)."""
    from jarvis_hybridnet_tpu.prediction.video_io import (
        MultiCameraReader,
        NativeMultiCameraReader,
    )

    a = MultiCameraReader(videos, batch_size=4, num_threads=2)
    b = NativeMultiCameraReader(videos, batch_size=4, num_threads=2)
    for (ba, na), (bb, nb) in zip(iter(a), iter(b)):
        assert na == nb
        np.testing.assert_array_equal(ba[:na], bb[:nb])
        a.recycle(ba)
        b.recycle(bb)
    a.release()
    b.release()


@needs_native_video
def test_native_frame_range_and_tail(videos):
    from jarvis_hybridnet_tpu.prediction.video_io import (
        NativeMultiCameraReader,
    )

    reader = NativeMultiCameraReader(videos, frame_start=3, number_frames=5,
                                     batch_size=4, num_threads=2)
    counts = []
    first_vals = []
    for batch, n in reader:
        counts.append(n)
        first_vals.append(int(batch[0, 0, H // 2, W // 2, 0]))
        reader.recycle(batch)
    assert counts == [4, 1]
    assert abs(first_vals[0] - _marker(0, 3)) <= 6
    reader.release()


@needs_native_video
def test_reader_factory_prefers_native(videos):
    from jarvis_hybridnet_tpu.prediction.video_io import (
        MultiCameraReader,
        NativeMultiCameraReader,
        open_multi_camera_reader,
    )

    r = open_multi_camera_reader(videos, batch_size=2)
    assert isinstance(r, NativeMultiCameraReader)
    r.release()
    r = open_multi_camera_reader(videos, backend="cv2", batch_size=2)
    assert isinstance(r, MultiCameraReader)
    r.release()


def test_cv2_unknown_frame_count_decodes_to_eof(videos, monkeypatch):
    """Containers reporting no frame count (CAP_PROP_FRAME_COUNT == 0,
    e.g. some MKV/raw streams) must decode until the streams exhaust —
    not silently yield nothing (review r3 finding)."""
    real = cv2.VideoCapture

    class NoCount:  # wraps (not subclasses) the pybind capture object
        def __init__(self, path):
            self._cap = real(path)

        def get(self, prop):
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return 0.0
            return self._cap.get(prop)

        def __getattr__(self, name):
            return getattr(self._cap, name)

    monkeypatch.setattr(cv2, "VideoCapture", NoCount)
    reader = MultiCameraReader(videos, batch_size=4, num_threads=2)
    assert reader.number_frames is None  # honestly unknown
    seen = 0
    for batch, n in reader:
        seen += n
        reader.recycle(batch)
    assert seen == N
    reader.release()


@needs_native_video
def test_native_unknown_frame_count_decodes_to_eof(tmp_path):
    """Raw MJPEG streams have no container frame count: the native pool
    must decode to EOF and report number_frames as unknown."""
    from jarvis_hybridnet_tpu.prediction.video_io import (
        NativeMultiCameraReader,
    )

    paths = []
    for c in range(2):
        p = str(tmp_path / f"Camera_{c}.mjpeg")
        with open(p, "wb") as f:
            for fr in range(N):
                img = np.full((H, W, 3), _marker(c, fr), np.uint8)
                ok, buf = cv2.imencode(".jpg", img)
                assert ok
                f.write(buf.tobytes())
        paths.append(p)
    probe = native.probe_video(paths[0])
    if probe is None:
        pytest.skip("libav cannot open raw mjpeg here")
    reader = NativeMultiCameraReader(paths, batch_size=4, num_threads=2)
    assert reader.number_frames is None
    seen = 0
    for batch, n in reader:
        for t in range(n):
            for c in range(2):
                val = int(batch[t, c, H // 2, W // 2, 0])
                assert abs(val - _marker(c, seen + t)) <= 6
        seen += n
        reader.recycle(batch)
    assert seen == N
    reader.release()


@needs_native_video
def test_native_honors_max_buffers(videos):
    """max_buffers sizes the pre-allocated native ring (the cv2 reader's
    never-recycles contract), instead of being silently swallowed."""
    from jarvis_hybridnet_tpu.prediction.video_io import (
        NativeMultiCameraReader,
    )

    reader = NativeMultiCameraReader(videos, batch_size=4, prefetch=2,
                                     max_buffers=5)
    assert len(reader._pool.buffers) == 5
    held = []
    for batch, n in reader:  # never recycle mid-stream
        held.append(batch)
    assert len(held) == 3  # 10 frames / T=4 -> 4,4,2; ring of 5 never blocks
    reader.release()


def _consume_all(reader, out):
    for batch, n in reader:  # never recycles
        out.append(n)
    out.append("end")


def test_cv2_unknown_count_exact_batch_multiple_terminates(videos,
                                                           monkeypatch):
    """Unknown-length stream whose frame total is an exact multiple of
    batch_size, consumed without recycling while holding the whole ring:
    EOF must still be delivered (review r3 CONFIRMED deadlock — the
    decoder acquired a buffer for a phantom batch just to discover EOF)."""
    import threading

    real = cv2.VideoCapture

    class NoCount:
        def __init__(self, path):
            self._cap = real(path)

        def get(self, prop):
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return 0.0
            return self._cap.get(prop)

        def __getattr__(self, name):
            return getattr(self._cap, name)

    monkeypatch.setattr(cv2, "VideoCapture", NoCount)
    # N=10 frames, T=5 -> 2 full batches; ring of max_buffers=2 fully held
    reader = MultiCameraReader(videos, batch_size=5, prefetch=1,
                               max_buffers=2, num_threads=2)
    assert reader.number_frames is None
    out = []
    t = threading.Thread(target=_consume_all, args=(reader, out),
                         daemon=True)
    t.start()
    t.join(timeout=30)
    assert out == [5, 5, "end"], out
    reader.release()


@needs_native_video
def test_native_unknown_count_exact_batch_multiple_terminates(tmp_path):
    """Native-pool twin of the phantom-batch EOF deadlock test, on a raw
    MJPEG stream (no container frame count)."""
    import threading

    from jarvis_hybridnet_tpu.prediction.video_io import (
        NativeMultiCameraReader,
    )

    paths = []
    for c in range(2):
        p = str(tmp_path / f"Camera_{c}.mjpeg")
        with open(p, "wb") as f:
            for fr in range(N):
                img = np.full((H, W, 3), _marker(c, fr), np.uint8)
                ok, buf = cv2.imencode(".jpg", img)
                assert ok
                f.write(buf.tobytes())
        paths.append(p)
    if native.probe_video(paths[0]) is None:
        pytest.skip("libav cannot open raw mjpeg here")
    reader = NativeMultiCameraReader(paths, batch_size=5, prefetch=1,
                                     max_buffers=2, num_threads=2)
    assert reader.number_frames is None
    out = []
    t = threading.Thread(target=_consume_all, args=(reader, out),
                         daemon=True)
    t.start()
    t.join(timeout=30)
    assert out == [5, 5, "end"], out
    reader.release()


def _uneven_videos(tmp_path, lengths):
    paths = []
    for c, n in enumerate(lengths):
        p = str(tmp_path / f"Camera_{c}.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 30, (W, H))
        for f in range(n):
            w.write(np.full((H, W, 3), _marker(c, f), np.uint8))
        w.release()
        paths.append(p)
    return paths


def test_cv2_uneven_camera_lengths_terminate(tmp_path):
    """One camera ending more than a ring-capacity earlier than the others
    must end the stream at the shortest camera — not deadlock the pool
    (review r3 CONFIRMED: the survivors block on ring buffers the emitter
    never publishes while the emitter waits for the survivors)."""
    import threading

    paths = _uneven_videos(tmp_path, [10, 2])
    # explicit number_frames: cv2 reports per-file counts, so ask for the
    # longer stream's worth — the short camera cuts it off
    reader = MultiCameraReader(paths, number_frames=10, batch_size=2,
                               prefetch=1, max_buffers=2, num_threads=2)
    out = []
    t = threading.Thread(target=_consume_all, args=(reader, out),
                         daemon=True)
    t.start()
    t.join(timeout=30)
    assert out == [2, "end"], out
    reader.release()


@needs_native_video
def test_native_uneven_camera_lengths_terminate(tmp_path):
    """Native-pool twin of the uneven-camera-EOF deadlock test."""
    import threading

    from jarvis_hybridnet_tpu.prediction.video_io import (
        NativeMultiCameraReader,
    )

    paths = _uneven_videos(tmp_path, [10, 2])
    reader = NativeMultiCameraReader(paths, number_frames=10, batch_size=2,
                                     prefetch=1, max_buffers=2,
                                     num_threads=2)
    out = []
    t = threading.Thread(target=_consume_all, args=(reader, out),
                         daemon=True)
    t.start()
    t.join(timeout=30)
    assert out == [2, "end"], out
    reader.release()


def test_cv2_unknown_count_frame_start_skips_sequentially(videos,
                                                          monkeypatch):
    """frame_start on an un-indexed container must not silently decode
    from frame 0 (review r3 finding: POS_FRAMES seeks fail silently
    exactly where CAP_PROP_FRAME_COUNT is 0) — frames are skipped
    sequentially instead."""
    real = cv2.VideoCapture

    class NoCount:
        def __init__(self, path):
            self._cap = real(path)

        def get(self, prop):
            if prop == cv2.CAP_PROP_FRAME_COUNT:
                return 0.0
            return self._cap.get(prop)

        def set(self, prop, value):  # un-indexed: position seek refused
            if prop == cv2.CAP_PROP_POS_FRAMES:
                return False
            return self._cap.set(prop, value)

        def __getattr__(self, name):
            return getattr(self._cap, name)

    monkeypatch.setattr(cv2, "VideoCapture", NoCount)
    reader = MultiCameraReader(videos, frame_start=3, batch_size=4,
                               num_threads=2)
    batch, n = next(iter(reader))
    assert abs(int(batch[0, 0, H // 2, W // 2, 0]) - _marker(0, 3)) <= 6
    reader.recycle(batch)
    reader.release()
