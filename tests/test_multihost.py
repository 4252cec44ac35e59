"""Multi-host input pipeline (parallel/multihost.py).

The pod case cannot run in CI (single process), but everything that makes
it correct can: the deterministic global order, the per-process batch
slicing that tiles each global batch exactly once, the frame-range split
for streaming prediction, and the single-process degenerate case forming
correctly-sharded global ``jax.Array``s on the virtual 8-CPU mesh.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from jarvis_hybridnet_tpu.parallel.mesh import make_mesh
from jarvis_hybridnet_tpu.parallel.multihost import (
    MultiHostLoader,
    process_batch_slice,
    process_frame_range,
)


class ToyDataset:
    """Samples carry their index so shard contents are checkable."""

    def __init__(self, n=32, cams=2):
        self.n = n
        self.cams = cams

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "imgs": np.full((self.cams, 4, 4, 3), i, np.float32),
            "idx": np.asarray(i, np.int64),
        }


def test_process_batch_slice_tiles_the_batch():
    slices = [process_batch_slice(16, pi, 4) for pi in range(4)]
    assert slices == [(0, 4), (4, 8), (8, 12), (12, 16)]
    with pytest.raises(ValueError):
        process_batch_slice(10, 0, 4)


def test_process_frame_range_partitions_all_frames():
    n = 1001
    ranges = [process_frame_range(n, pi, 3) for pi in range(3)]
    assert ranges[0][0] == 0 and ranges[-1][1] == n
    covered = sum(hi - lo for lo, hi in ranges)
    assert covered == n
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi == lo  # contiguous, no overlap


def test_simulated_processes_agree_on_order_and_tile_batches():
    ds = ToyDataset(n=24)
    loaders = [
        MultiHostLoader(
            ds, global_batch_size=8, mesh=make_mesh(),
            shuffle=True, seed=3, process_index=pi, process_count=2,
        )
        for pi in range(2)
    ]
    orders = [ld._epoch_order(0) for ld in loaders]
    np.testing.assert_array_equal(orders[0], orders[1])
    locals_ = [ld._local_indices(orders[0]) for ld in loaders]
    # per global batch, the two local shards concatenate to the batch
    for b in range(3):
        got = np.concatenate([lo[b * 4:(b + 1) * 4] for lo in locals_])
        np.testing.assert_array_equal(got, orders[0][b * 8:(b + 1) * 8])


def test_single_process_yields_global_sharded_arrays():
    ds = ToyDataset(n=16, cams=2)
    mesh = make_mesh(n_data=4, n_cameras=2)
    spec = {"imgs": P("data", "cameras"), "idx": P("data")}
    loader = MultiHostLoader(
        ds, global_batch_size=8, mesh=mesh, spec_tree=spec,
        shuffle=False, num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 2
    b0 = batches[0]
    assert isinstance(b0["imgs"], jax.Array)
    assert b0["imgs"].shape == (8, 2, 4, 4, 3)
    assert b0["imgs"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", "cameras")), ndim=5
    )
    np.testing.assert_array_equal(np.asarray(b0["idx"]), np.arange(8))
    # sample payloads land on the right rows
    np.testing.assert_allclose(
        np.asarray(b0["imgs"])[:, 0, 0, 0, 0], np.arange(8, dtype=np.float32)
    )


def test_epochs_reshuffle_but_are_reproducible():
    ds = ToyDataset(n=16)
    mk = lambda: MultiHostLoader(  # noqa: E731
        ds, global_batch_size=8, mesh=make_mesh(), shuffle=True, seed=7,
        num_workers=0,
    )
    a, b = mk(), mk()
    ea0 = [np.asarray(x["idx"]) for x in a]
    ea1 = [np.asarray(x["idx"]) for x in a]
    eb0 = [np.asarray(x["idx"]) for x in b]
    np.testing.assert_array_equal(np.concatenate(ea0), np.concatenate(eb0))
    assert not np.array_equal(np.concatenate(ea0), np.concatenate(ea1))


@pytest.fixture(scope="module")
def pod_project(tmp_path_factory):
    """Tiny project + 12-cam recording where each frame's pixel value
    encodes its index, so CSV rows identify which frames a process saw."""
    cv2 = pytest.importorskip("cv2")
    import shutil

    root = tmp_path_factory.mktemp("pod_project")
    (root / "datasets").mkdir()
    os.symlink("/root/reference/datasets/Example_Dataset",
               str(root / "datasets" / "Example_Dataset"))
    proj = root / "projects" / "PodProj"
    proj.mkdir(parents=True)
    shutil.copyfile(
        "/root/reference/projects/Example_Project/config.yaml",
        str(proj / "config.yaml"),
    )
    with open(proj / "config.yaml", "a") as f:
        f.write("\nTPU:\n  FRAME_BATCH: 2\n")

    rig_dir = ("/root/reference/datasets/Example_Dataset/calib_params/"
               "12Cam_Ralph")
    cameras = [os.path.splitext(f)[0] for f in os.listdir(rig_dir)]
    rec = root / "recording"
    rec.mkdir()
    n_frames = 11
    for cam in cameras:
        w = cv2.VideoWriter(str(rec / f"{cam}.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
        for fidx in range(n_frames):
            w.write(np.full((48, 64, 3), 20 + fidx * 20, np.uint8))
        w.release()
    return root, rec, n_frames


def _fake_predictor_factory(num_joints):
    """Stands in for the fused cascade: encodes each frame's mean pixel
    value into the output points so the CSV reveals frame identity."""

    def make(cfg, rig, wc, wh, mesh=None, shard_cameras=False, dtype=None):
        def predict(frames):
            arr = np.asarray(frames)
            T = arr.shape[0]
            enc = arr.reshape(T, -1).mean(axis=1)
            pts = np.tile(enc[:, None, None], (1, num_joints, 3))
            conf = np.ones((T, num_joints), np.float32)
            valid = np.ones((T,), bool)
            return pts, conf, valid

        return predict

    return make


def test_pod_streaming_prediction(pod_project, monkeypatch):
    """predict3D's production pod path: each simulated process decodes
    only its process_frame_range slice, shard CSVs merge on rank 0, and
    the merged CSV is row-identical to a single-process run (exact,
    disjoint, ordered frame coverage)."""
    from jarvis_hybridnet_tpu.prediction import predict3d as p3d
    from jarvis_hybridnet_tpu.utils.param_classes import Predict3DParams

    root, rec, n_frames = pod_project
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(root))
    monkeypatch.setattr(p3d, "make_predictor3d",
                        _fake_predictor_factory(23))

    def run(out_dir, pi=None, pc=None):
        params = Predict3DParams(
            project_name="PodProj", recording_path=str(rec),
            weights_center_detect=None, weights_hybridnet=None,
            output_dir=out_dir, process_index=pi, process_count=pc,
        )
        assert p3d.predict3D(params) is not None

    single = str(root / "out_single")
    run(single)
    with open(os.path.join(single, "data3D.csv")) as f:
        ref_rows = f.read().splitlines()
    assert len(ref_rows) == 2 + n_frames

    pod = str(root / "out_pod")
    # rank 0 last: its merge step needs every shard present (on a real
    # pod the sync_global_devices barrier provides this ordering)
    for pi in (1, 2, 0):
        run(pod, pi=pi, pc=3)
    with open(os.path.join(pod, "data3D.csv")) as f:
        pod_rows = f.read().splitlines()
    assert pod_rows == ref_rows
    # shards were cleaned up after the merge
    assert not [p for p in os.listdir(pod) if ".part" in p]
    # distinct frames produced distinct rows (content encoding worked),
    # so row-identity above really proves per-frame coverage and order
    assert len(set(pod_rows[2:])) == n_frames


def test_pod_shard_rejects_unknown_frame_count(pod_project, monkeypatch):
    """Pod sharding with number_frames=-1 needs a real total to split;
    an un-indexed container (probe returns 0) must raise a clear error
    instead of slicing a bogus negative count (review r3 follow-up)."""
    import pytest

    from jarvis_hybridnet_tpu.prediction import predict3d as p3d
    from jarvis_hybridnet_tpu.utils.param_classes import Predict3DParams

    root, rec, _ = pod_project
    monkeypatch.setattr(p3d, "probe_frame_count", lambda path: 0)
    params = Predict3DParams(
        project_name="PodProj", recording_path=str(rec),
        weights_center_detect=None, weights_hybridnet=None,
        output_dir=str(root / "out_err"), process_index=1,
        process_count=3,
    )
    with pytest.raises(ValueError, match="number_frames"):
        p3d._pod_frame_shard(params, str(rec))


def test_pod_streaming_prediction2d(pod_project, monkeypatch):
    """predict2D's pod path (mirrors predict3D's): each simulated process
    decodes only its frame slice of the video, shard CSVs merge on rank 0,
    and the merged CSV is row-identical to a single-process run."""
    from jarvis_hybridnet_tpu.prediction import predict2d as p2d
    from jarvis_hybridnet_tpu.utils.param_classes import Predict2DParams

    root, rec, n_frames = pod_project
    monkeypatch.setenv("JARVIS_PARENT_DIR", str(root))
    video = str(next(rec.glob("*.avi")))

    J = 23

    def fake_make(cfg, wc, wk, mesh=None, **kw):
        def predict(frames):
            arr = np.asarray(frames)
            T = arr.shape[0]
            enc = arr.reshape(T, -1).mean(axis=1)
            pts = np.tile(enc[:, None, None], (1, J, 2))
            conf = np.ones((T, J), np.float32)
            valid = np.ones((T,), bool)
            return pts, conf, valid

        return predict

    monkeypatch.setattr(p2d, "make_predictor2d", fake_make)

    def run(out_dir, pi=None, pc=None):
        params = Predict2DParams(
            project_name="PodProj", recording_path=video,
            weights_center_detect=None, weights_keypoint_detect=None,
            output_dir=out_dir, process_index=pi, process_count=pc,
        )
        assert p2d.predict2D(params) is not None

    single = str(root / "out2d_single")
    run(single)
    with open(os.path.join(single, "data2D.csv")) as f:
        ref_rows = f.read().splitlines()
    assert len(ref_rows) == 2 + n_frames

    pod = str(root / "out2d_pod")
    # rank 0 last: its merge needs every shard present (on a real pod the
    # sync_global_devices barrier provides this ordering)
    for pi in (2, 1, 0):
        run(pod, pi=pi, pc=3)
    with open(os.path.join(pod, "data2D.csv")) as f:
        pod_rows = f.read().splitlines()
    assert pod_rows == ref_rows
    # shards were consumed by the merge
    assert not [p for p in os.listdir(pod) if ".part" in p]
