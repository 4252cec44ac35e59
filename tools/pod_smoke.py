"""Real-process pod execution smoke test (VERDICT r4 missing #2).

Every pod test in tests/test_multihost.py simulates processes by passing
``process_index``/``process_count`` as arguments inside ONE process. This
tool executes the pod path for REAL: it launches N OS processes, each with
its own virtual CPU devices, joined through ``jax.distributed.initialize``
(gloo collectives), and runs

1. ``parallel.multihost.initialize_distributed`` — the actual
   ``is_initialized`` guard + coordinator join (multihost.py:45-60),
2. a ``MultiHostLoader`` whose ``jax.make_array_from_process_local_data``
   calls now see ``process_count > 1`` (non-fully-addressable globals),
3. ONE real sharded HybridNet train step over the GLOBAL (data, cameras)
   mesh — gradients all-reduced across the two processes over gloo,
4. ``local_np`` on a non-fully-addressable global array (the pod metrics
   path, multihost.py:280-299),
5. the PRODUCTION ``predict3D`` pod streaming path end to end with the
   real ``jax.process_index()``/``jax.process_count()``, the
   ``broadcast_one_to_all`` output-dir agreement, the
   ``sync_global_devices`` shard barrier, and the rank-0 CSV merge —
   all executing across real processes for the first time,

then compares the train loss and the merged CSV against a single-process
run of the exact same program (same 8-device mesh in one process) and
prints one JSON line. The reference has no pod analog (it is a
single-process framework, SURVEY.md §2 parallelism checklist) — this is
the repo's own claimed capability, so it owns the proof.

Usage:
    python tools/pod_smoke.py            # launcher: ~2-4 min on CPU
    python tools/pod_smoke.py --nprocs 2 --devices-per-proc 4
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------- worker ---

def _toy_batch_fields(i: int, C: int, S: int, J: int, g2: int) -> dict:
    """Deterministic tiny-HybridNet training sample for index ``i`` —
    identical on every process, so shard contents depend only on the
    loader's slicing, never on which process built them."""
    import numpy as np

    rng = np.random.default_rng(1000 + i)
    P = np.zeros((C, 4, 3), np.float32)
    P[:, 0, 0] = 500.0
    P[:, 1, 1] = 500.0
    P[:, 2, 2] = 1.0
    P[:, 3, 2] = 600.0
    K = np.tile(np.eye(3, dtype=np.float32) * 500.0, (C, 1, 1))
    K[:, 2, 2] = 1.0
    K[:, 2, 0] = S
    K[:, 2, 1] = S
    return {
        "imgs": (rng.random((C, S, S, 3)) * 255).astype(np.float32),
        "center_hm": np.full((C, 2), S, np.int32),
        "center3d": np.zeros((3,), np.int32),
        "kp_vox": (rng.random((J, 3)) * g2).astype(np.float32),
        "keypoints3D": rng.normal(size=(J, 3)).astype(np.float32),
        "camera_matrices": P,
        "intrinsics": K,
        "distortions": np.zeros((C, 1, 5), np.float32),
    }


class _ToyTrainSet:
    def __init__(self, n, C, S, J, g2):
        self.n, self.C, self.S, self.J, self.g2 = n, C, S, J, g2

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return _toy_batch_fields(i, self.C, self.S, self.J, self.g2)


def worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent CPU compile cache (shared with the test suite): repeat
    # runs of this smoke pay seconds, not minutes
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, "tests", ".xla_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from jarvis_hybridnet_tpu.parallel.multihost import (
        initialize_distributed,
        local_np,
    )

    if args.nprocs > 1:
        # the production entry point under test (multihost.py:45-60)
        initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.nprocs, jax.process_count()
        assert jax.process_index() == args.process_id
    else:
        # single-process reference run: the no-coordinator no-op branch
        initialize_distributed()
        assert jax.process_count() == 1

    n_global = args.nprocs * args.devices_per_proc
    assert len(jax.devices()) == n_global, jax.devices()

    import numpy as np
    import optax
    from jax.sharding import PartitionSpec as P

    from jarvis_hybridnet_tpu.models.hybridnet import HybridNetBackbone
    from jarvis_hybridnet_tpu.parallel.mesh import make_mesh
    from jarvis_hybridnet_tpu.parallel.multihost import MultiHostLoader
    from jarvis_hybridnet_tpu.parallel.train_step import (
        make_hybridnet_train_step,
    )

    n_cam_shards = 2
    mesh = make_mesh(n_data=n_global // n_cam_shards,
                     n_cameras=n_cam_shards)
    B = mesh.shape["data"]
    C, J, S, cube, spacing = 4, 2, 64, 16, 2
    g2 = cube // spacing // 2

    # ---- global batches from per-process shard building ----------------
    spec = {
        "imgs": P("data", "cameras"),
        "center_hm": P("data", "cameras"),
        "camera_matrices": P("data", "cameras"),
        "intrinsics": P("data", "cameras"),
        "distortions": P("data", "cameras"),
        "center3d": P("data"),
        "kp_vox": P("data"),
        "keypoints3D": P("data"),
    }
    loader = MultiHostLoader(
        _ToyTrainSet(B * 2, C, S, J, g2), global_batch_size=B, mesh=mesh,
        spec_tree=spec, shuffle=True, seed=11, num_workers=0,
    )
    batches = list(loader)
    assert len(batches) == 2
    batch = batches[0]
    if args.nprocs > 1:
        # a true pod global array: no process addresses every shard
        assert not batch["imgs"].is_fully_addressable

    # local_np must recover exactly this process's rows (pod metrics path)
    rows = local_np(batch["keypoints3D"])
    assert rows.shape[0] == B // args.nprocs

    # ---- one REAL sharded train step over the global mesh --------------
    model = HybridNetBackbone(
        num_joints=J, model_size="small", roi_cube_size=cube,
        grid_spacing=spacing,
    )
    # init on a replicated host copy so params are identical everywhere
    sample0 = _toy_batch_fields(0, C, S, J, g2)
    full = {k: sample0[k] for k in batch}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.stack([full["imgs"]]), np.stack([full["center_hm"]]),
        np.stack([full["center3d"]]), np.stack([full["camera_matrices"]]),
        np.stack([full["intrinsics"]]), np.stack([full["distortions"]]),
    )["params"]
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    step = make_hybridnet_train_step(model, tx, mesh, shard_cameras=True)
    params, opt_state, loss = step(params, opt_state,
                                   jax.random.PRNGKey(1), batch)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # ---- PRODUCTION predict3D pod streaming (fake cascade, real pod
    # machinery: frame shard from jax.process_index, broadcast stamp,
    # sync_global_devices barrier, rank-0 merge) --------------------------
    os.environ["JARVIS_PARENT_DIR"] = args.dir
    from jarvis_hybridnet_tpu.prediction import predict3d as p3d
    from jarvis_hybridnet_tpu.utils.param_classes import Predict3DParams

    num_joints = 23

    def fake_make(cfg, rig, wc, wh, mesh=None, shard_cameras=False,
                  dtype=None):
        def predict(frames):
            arr = np.asarray(frames)
            T = arr.shape[0]
            enc = arr.reshape(T, -1).mean(axis=1)
            pts = np.tile(enc[:, None, None], (1, num_joints, 3))
            conf = np.ones((T, num_joints), np.float32)
            valid = np.ones((T,), bool)
            return pts, conf, valid

        return predict

    p3d.make_predictor3d = fake_make
    out_dir = os.path.join(args.dir, "out_pod" if args.nprocs > 1
                           else "out_single")
    pparams = Predict3DParams(
        project_name="PodProj",
        recording_path=os.path.join(args.dir, "recording"),
        weights_center_detect=None, weights_hybridnet=None,
        output_dir=out_dir,
        # process_index/count left None: the driver must read the REAL
        # jax.process_index()/process_count() (predict3d.py:47-50)
        )
    assert p3d.predict3D(pparams) is not None

    if jax.process_index() == 0:
        with open(os.path.join(out_dir, "data3D.csv")) as f:
            rows = f.read().splitlines()
        with open(os.path.join(args.dir,
                               f"result_n{args.nprocs}.json"), "w") as f:
            json.dump({"loss": loss, "csv_rows": rows,
                       "mesh": dict(mesh.shape)}, f)
    print(f"pod_smoke worker {args.process_id}/{args.nprocs}: "
          f"loss={loss:.6f} OK", flush=True)


# ------------------------------------------------------------- launcher ---

def _build_project(root: str, n_frames: int = 11) -> None:
    """Tiny PodProj + 12-cam recording where each frame's pixel value
    encodes its index (tests/test_multihost.py pod_project recipe)."""
    import shutil

    import cv2

    os.makedirs(os.path.join(root, "datasets"))
    os.symlink("/root/reference/datasets/Example_Dataset",
               os.path.join(root, "datasets", "Example_Dataset"))
    proj = os.path.join(root, "projects", "PodProj")
    os.makedirs(proj)
    shutil.copyfile(
        "/root/reference/projects/Example_Project/config.yaml",
        os.path.join(proj, "config.yaml"))
    with open(os.path.join(proj, "config.yaml"), "a") as f:
        f.write("\nTPU:\n  FRAME_BATCH: 2\n")

    rig_dir = ("/root/reference/datasets/Example_Dataset/calib_params/"
               "12Cam_Ralph")
    cameras = [os.path.splitext(f)[0] for f in os.listdir(rig_dir)]
    rec = os.path.join(root, "recording")
    os.makedirs(rec)
    for cam in cameras:
        w = cv2.VideoWriter(os.path.join(rec, f"{cam}.avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
        for fidx in range(n_frames):
            import numpy as np

            w.write(np.full((48, 64, 3), 20 + fidx * 20, np.uint8))
        w.release()


def _spawn(script_args, devices_per_proc, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{devices_per_proc}").strip()
    env.update(extra_env or {})
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"]
        + script_args, env=env, cwd=REPO,
    )


def launcher(args) -> None:
    import shutil
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = tempfile.mkdtemp(prefix="pod_smoke_")
    try:
        _build_project(root)
        n_total = args.nprocs * args.devices_per_proc

        # single-process reference: same global device count, one process
        ref = _spawn(
            ["--nprocs", "1", "--process-id", "0",
             "--devices-per-proc", str(n_total),
             "--port", str(port), "--dir", root],
            devices_per_proc=n_total,
        )
        assert ref.wait(timeout=900) == 0, "single-process reference failed"

        procs = [
            _spawn(
                ["--nprocs", str(args.nprocs), "--process-id", str(pid),
                 "--devices-per-proc", str(args.devices_per_proc),
                 "--port", str(port), "--dir", root],
                devices_per_proc=args.devices_per_proc,
            )
            for pid in range(args.nprocs)
        ]
        codes = [p.wait(timeout=900) for p in procs]
        assert codes == [0] * args.nprocs, f"pod workers failed: {codes}"

        with open(os.path.join(root, "result_n1.json")) as f:
            single = json.load(f)
        with open(os.path.join(root,
                               f"result_n{args.nprocs}.json")) as f:
            pod = json.load(f)

        import numpy as np

        loss_agree = bool(np.isclose(single["loss"], pod["loss"],
                                     rtol=1e-5, atol=1e-6))
        csv_agree = single["csv_rows"] == pod["csv_rows"]
        result = {
            "nprocs": args.nprocs,
            "devices_per_proc": args.devices_per_proc,
            "mesh": pod["mesh"],
            "loss_single": single["loss"],
            "loss_pod": pod["loss"],
            "loss_agree": loss_agree,
            "csv_rows": len(pod["csv_rows"]),
            "csv_identical": csv_agree,
            "ok": loss_agree and csv_agree,
        }
        print(json.dumps(result))
        sys.exit(0 if result["ok"] else 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--dir", default="")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        launcher(args)


if __name__ == "__main__":
    main()
