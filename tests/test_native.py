"""Native host pipeline tests: C++ JPEG decode/crop vs the cv2 path."""

import json

import numpy as np
import pytest

from jarvis_hybridnet_tpu import native

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def jpeg_paths(example_dataset):
    with open(example_dataset / "annotations" / "instances_val.json") as f:
        data = json.load(f)
    fs = next(iter(data["framesets"].values()))
    imgs = {im["id"]: im for im in data["images"]}
    return [
        str(example_dataset / "val" / imgs[i]["file_name"])
        for i in fs["frames"]
    ]


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library could not be built")


def test_decode_matches_cv2(lib_ok, jpeg_paths):
    ours = native.decode_jpeg(jpeg_paths[0])
    assert ours is not None and ours.shape == (1024, 1280, 3)
    theirs = cv2.cvtColor(cv2.imread(jpeg_paths[0]), cv2.COLOR_BGR2RGB)
    # different IDCT implementations may differ by a couple of LSBs
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert np.percentile(diff, 99.9) <= 2, diff.max()


def test_decode_batch(lib_ok, jpeg_paths):
    out = native.decode_batch(jpeg_paths, 1280, 1024)
    assert out is not None and out.shape == (len(jpeg_paths), 1024, 1280, 3)
    single = native.decode_jpeg(jpeg_paths[3])
    assert np.array_equal(out[3], single)


def test_decode_crop_batch(lib_ok, jpeg_paths):
    centers = np.array([[640, 512]] * len(jpeg_paths), np.int32)
    out = native.decode_crop_batch(jpeg_paths, centers, 256, 1280, 1024)
    assert out is not None and out.shape == (len(jpeg_paths), 256, 256, 3)
    full = native.decode_jpeg(jpeg_paths[0])
    expected = full[512 - 128:512 + 128, 640 - 128:640 + 128]
    assert np.array_equal(out[0], expected)
    # clamping: a center at the corner stays inside the frame
    corner = np.array([[0, 0]] * len(jpeg_paths), np.int32)
    out2 = native.decode_crop_batch(jpeg_paths, corner, 256, 1280, 1024)
    assert np.array_equal(out2[0], full[:256, :256])


def test_decode_crop_batch_roi_bit_identical(lib_ok, jpeg_paths):
    """The ROI decode fast path (libjpeg-turbo jpeg_crop_scanline +
    jpeg_skip_scanlines, jarvis_host.cpp) must be BIT-identical to a full
    decode + crop everywhere — including corners/edges, where the clamped
    window touches the frame boundary, and interior positions where the
    16 px discard margin must fully restore fancy-upsampling context."""
    full = native.decode_jpeg(jpeg_paths[0])
    H, W = full.shape[:2]
    bbox, hw = 256, 128
    rng = np.random.default_rng(7)
    cases = [(0, 0), (W, H), (0, H), (W, 0), (W // 2, H // 2), (5, 700),
             (W - 5, 3)] + [tuple(c) for c in rng.integers(0, [W, H], (8, 2))]
    for cx, cy in cases:
        centers = np.array([[cx, cy]], np.int32)
        out = native.decode_crop_batch(jpeg_paths[:1], centers, bbox, W, H)
        ccx = min(max(hw, cx), W - hw)
        ccy = min(max(hw, cy), H - hw)
        exp = full[ccy - hw:ccy + hw, ccx - hw:ccx + hw]
        assert np.array_equal(out[0], exp), (cx, cy)


def test_corrupt_jpeg_returns_none(lib_ok, jpeg_paths, tmp_path):
    """A truncated/corrupt file must fail the call, not exit() the
    process (libjpeg's default error_exit would)."""
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(open(jpeg_paths[0], "rb").read()[:200])
    assert native.decode_jpeg(str(bad)) is None
    garbage = tmp_path / "garbage.jpg"
    garbage.write_bytes(b"not a jpeg at all")
    assert native.decode_jpeg(str(garbage)) is None


def test_wrong_size_jpeg_rejected_before_decode(lib_ok, jpeg_paths):
    """A file larger than the caller's buffer dims must be rejected (the
    check runs before any pixel is written, so it cannot overflow)."""
    assert native.decode_batch(jpeg_paths[:2], 640, 512) is None
    centers = np.array([[100, 100], [100, 100]], np.int32)
    assert (
        native.decode_crop_batch(jpeg_paths[:2], centers, 64, 640, 512)
        is None
    )


def test_invalid_bbox_rejected(lib_ok, jpeg_paths):
    centers = np.array([[640, 512]], np.int32)
    # odd bbox would read one row past the frame; oversized bbox would
    # cross the clamp bounds
    assert (
        native.decode_crop_batch(jpeg_paths[:1], centers, 255, 1280, 1024)
        is None
    )
    assert (
        native.decode_crop_batch(jpeg_paths[:1], centers, 2048, 1280, 1024)
        is None
    )


def test_frameset_pipeline_raises_on_missing_file(lib_ok, jpeg_paths):
    framesets = [jpeg_paths, [jpeg_paths[0], "/nonexistent/missing.jpg"]
                 + jpeg_paths[2:]]
    pipe = native.FramesetPipeline(framesets, 1280, 1024)
    it = iter(pipe)
    idx, out = next(it)  # frameset 0 is intact
    assert idx == 0 and out.shape == (len(jpeg_paths), 1024, 1280, 3)
    with pytest.raises(RuntimeError, match="cameras decoded"):
        next(it)
    pipe.close()


def test_frameset_pipeline(lib_ok, jpeg_paths):
    framesets = [jpeg_paths, jpeg_paths[::-1]]
    pipe = native.FramesetPipeline(framesets, 1280, 1024)
    got = dict(pipe)
    pipe.close()
    assert set(got) == {0, 1}
    assert got[0].shape == (len(jpeg_paths), 1024, 1280, 3)
    single = native.decode_jpeg(jpeg_paths[0])
    assert np.array_equal(got[0][0], single)
    assert np.array_equal(got[1][-1], single)
