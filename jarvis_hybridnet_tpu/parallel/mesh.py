"""Device meshes and shardings for multi-chip scale-out.

The reference is single-process/single-GPU (SURVEY.md §2 parallelism
checklist); scale-out here is new TPU-native capability built on
``jax.sharding``: a ``(data, cameras)`` mesh where the frame/time axis is
data-parallel and the camera axis of the multi-view 2D pass can be sharded
across chips, with the camera-mean reduction of the reprojection layer
riding ICI collectives inserted by XLA (GSPMD).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_cameras: int = 1,
    devices=None,
) -> Mesh:
    """Create a (data, cameras) mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_cameras
    grid = np.asarray(devices[: n_data * n_cameras]).reshape(
        n_data, n_cameras
    )
    return Mesh(grid, ("data", "cameras"))


def plan_inference_devices(all_devices, n_data_cap, n_cam=1,
                           num_cameras=0):
    """Pick the device slice and camera-shard factor for inference drivers.

    ``TPU.MESH_DATA_AXIS`` (``n_data_cap``) caps the data-parallel axis
    (-1 = all devices; 1 = single-device, e.g. to use an AOT artifact on
    a multi-chip host). Camera-sharding feasibility is decided BEFORE
    slicing so an infeasible ``TPU.SHARD_CAMERAS`` cannot leak its factor
    into the data axis (MESH_DATA_AXIS=1 must stay single-device).
    Returns ``(devices, n_cam)`` with ``n_cam == 1`` when camera sharding
    is off; ``len(devices)`` is always divisible by ``n_cam``.
    """
    if n_cam > 1 and num_cameras % n_cam != 0:
        n_cam = 1
    devices = (all_devices[:n_data_cap * n_cam] if n_data_cap > 0
               else all_devices)
    if n_cam > 1 and len(devices) % n_cam != 0:
        # not enough devices for whole camera groups: drop camera sharding
        n_cam = 1
        devices = (all_devices[:n_data_cap] if n_data_cap > 0
                   else all_devices)
    return devices, n_cam


def local_inference_devices():
    """Devices an inference driver should mesh over: on a pod each process
    meshes only its LOCAL chips (the time axis is already sharded across
    hosts), single-process runs see every chip."""
    return (jax.local_devices() if jax.process_count() > 1
            else jax.devices())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data' (frames / batch)."""
    return NamedSharding(mesh, P("data"))


def frameset_sharding(mesh: Mesh) -> NamedSharding:
    """(T, C, ...) batches: frames over 'data', cameras over 'cameras'."""
    return NamedSharding(mesh, P("data", "cameras"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    return jax.device_put(params, replicated(mesh))


def shard_batch(batch, mesh: Mesh, spec: P = P("data")):
    return jax.device_put(batch, NamedSharding(mesh, spec))


def auto_train_mesh(batch_size: int, num_cameras: int) -> Mesh | None:
    """Mesh for multi-view (3D) training: factor the live devices into
    (data, cameras) such that ``batch_size % n_data == 0`` and
    ``num_cameras % n_cam == 0``, maximizing devices engaged (ties prefer
    the data axis — gradient all-reduce only, no activation collectives).

    This is what makes the reference's B=1 HybridNet regime scale: at the
    shipped ``HYBRIDNET.BATCH_SIZE: 1`` a data-only mesh would warn and
    run ONE chip (VERDICT r3), while the camera axis of the same step
    shards the per-camera 2D pass and turns the reprojection layer's
    camera-mean into an ICI reduction (parallel/train_step.py). ``None``
    -> stay single-device."""
    devices = jax.devices()
    n = len(devices)
    if n <= 1:
        return None
    best = (1, 1)
    for n_data in range(1, n + 1):
        if batch_size % n_data:
            continue
        n_cam = n // n_data
        while n_cam > 1 and num_cameras % n_cam:
            n_cam -= 1
        if n_data * n_cam > best[0] * best[1] or (
                n_data * n_cam == best[0] * best[1] and n_data > best[0]):
            best = (n_data, n_cam)
    n_data, n_cam = best
    if n_data * n_cam <= 1:
        from ..utils.clp import warning
        warning(
            f"{n} devices are visible but neither BATCH_SIZE={batch_size} "
            f"nor NUM_CAMERAS={num_cameras} factors across them — training "
            f"will run on a SINGLE device."
        )
        return None
    if n_data * n_cam < n:
        from ..utils.clp import info
        info(f"Training mesh uses {n_data * n_cam} of {n} devices "
             f"(data={n_data}, cameras={n_cam}); BATCH_SIZE multiples of "
             f"{n} would engage all of them.")
    return make_mesh(n_data=n_data, n_cameras=n_cam,
                     devices=devices[: n_data * n_cam])


def auto_data_mesh(batch_size: int) -> Mesh | None:
    """Data-parallel mesh over all live devices when the global batch
    divides across them; ``None`` -> stay single-device.

    This is the trainers' production scale-out switch (the reference has
    no multi-GPU story at all — bare ``.cuda()``,
    jarvis/efficienttrack/efficienttrack.py:70): with N chips visible and
    ``BATCH_SIZE % N == 0`` the train step is jitted with 'data'
    shardings and GSPMD inserts the gradient all-reduce over ICI.
    """
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    if batch_size % len(devices) != 0:
        from ..utils.clp import warning
        warning(
            f"{len(devices)} devices are visible but BATCH_SIZE="
            f"{batch_size} does not divide across them — training will "
            f"run on a SINGLE device. Set BATCH_SIZE to a multiple of "
            f"{len(devices)} to enable data-parallel sharding."
        )
        return None
    return make_mesh(n_data=len(devices))
