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
