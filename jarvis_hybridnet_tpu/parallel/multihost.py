"""Multi-host (pod) input pipeline.

New TPU-native capability with no reference equivalent (the reference is
single-process/single-GPU, SURVEY.md §2 parallelism checklist): on a
multi-host pod, every process runs the same program but addresses only its
local chips, so the host side must (a) agree globally on the sample order,
(b) build only the samples that land on its local devices, and (c) stitch
the per-process shards into global ``jax.Array``s
(``jax.make_array_from_process_local_data``) that the pjit-ted train/predict
steps consume without any cross-host data motion on DCN beyond what the
samples themselves require.

Single-process meshes (including the virtual 8-CPU test mesh) are the
degenerate case — local == global — so the same loader drives both and the
logic is testable without a pod.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dataset.loader import DataLoader, _collate


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the pod's distributed runtime (idempotent).

    On Cloud TPU pods all three arguments are auto-detected from the
    metadata server; pass them explicitly for other clusters. A no-op when
    already initialized or when running single-process.

    The idempotency check must NOT touch ``jax.process_count()``: that
    initializes the XLA backend, after which ``jax.distributed.initialize``
    always raises and a pod job would silently degrade to N independent
    single-host runs. ``jax.distributed.is_initialized()`` inspects only
    the distributed client.
    """
    if jax.distributed.is_initialized():
        return  # already initialized by the launcher
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            # a coordinator WAS configured: failing to join it is a real
            # error, not a single-process run
            raise
        # no coordinator configured / not a pod environment: single-process
        pass


def process_batch_slice(
    global_batch_size: int,
    process_index: int | None = None,
    process_count: int | None = None,
) -> tuple[int, int]:
    """[lo, hi) slice of each global batch owned by this process.

    The 'data' axis of the mesh is laid out process-major (jax device order
    groups a process's local devices contiguously), so a contiguous slice
    of the batch is exactly the set of rows addressable by this process.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pc} processes"
        )
    per = global_batch_size // pc
    return pi * per, (pi + 1) * per


def process_frame_range(
    n_frames: int,
    process_index: int | None = None,
    process_count: int | None = None,
) -> tuple[int, int]:
    """Contiguous [start, stop) frame range of a recording owned by this
    process — the streaming-prediction analog of ``process_batch_slice``:
    each host decodes only its own time slice of the videos."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_frames // pc
    extra = n_frames % pc
    start = pi * per + min(pi, extra)
    return start, start + per + (1 if pi < extra else 0)


class _IndexView:
    """Zero-copy view of a dataset restricted to an index list."""

    def __init__(self, dataset, indices):
        self._dataset = dataset
        self._indices = indices

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._dataset[int(self._indices[i])]


class MultiHostLoader:
    """Pod-wide data loader: per-host shard building + global arrays.

    Every process constructs the identical seeded shuffle of the dataset,
    takes its ``process_batch_slice`` of each global batch, builds those
    samples on its local thread pool (``dataset.loader.DataLoader``
    semantics), and yields batches whose array leaves are global
    ``jax.Array``s sharded per ``spec_tree`` over ``mesh``.

    ``spec_tree``: either a single ``PartitionSpec`` applied to every array
    leaf, or a dict keyed like the sample dict. Non-array leaves (e.g.
    filename strings in analysisMode) are yielded as the process-local
    list — callers that need them globally must gather out-of-band.
    ``drop_last`` is forced: a pod step needs every process to contribute
    an identically-shaped shard.
    """

    def __init__(
        self,
        dataset,
        global_batch_size: int,
        mesh: Mesh,
        spec_tree=P("data"),
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.global_batch_size = int(global_batch_size)
        self.mesh = mesh
        self.spec_tree = spec_tree
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.worker_mode = worker_mode
        self._pi = (jax.process_index() if process_index is None
                    else process_index)
        self._pc = (jax.process_count() if process_count is None
                    else process_count)
        self._lo, self._hi = process_batch_slice(
            self.global_batch_size, self._pi, self._pc
        )
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the ABSOLUTE epoch of the next ``__iter__`` (same contract
        as ``dataset.loader.DataLoader.set_epoch``): resumed runs must see
        epoch k's globally-agreed permutation, not replay epoch 0's."""
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.dataset) // self.global_batch_size

    def _spec_for(self, key):
        if isinstance(self.spec_tree, dict):
            return self.spec_tree.get(key, P("data"))
        return self.spec_tree

    def _globalize(self, node, key=None):
        if isinstance(node, dict):
            return {k: self._globalize(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)) and not isinstance(node, str):
            # nested containers inherit the enclosing key's spec
            if node and all(isinstance(v, str) for v in node):
                return node  # collated string lists stay process-local
            return type(node)(self._globalize(v, key) for v in node)
        if not isinstance(node, np.ndarray):
            return node
        sharding = NamedSharding(self.mesh, self._spec_for(key))
        return jax.make_array_from_process_local_data(sharding, node)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        # identical order on every process: seed depends only on (seed,
        # epoch), never on process_index
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        return order

    def _local_indices(self, order: np.ndarray) -> np.ndarray:
        """This process's sample indices, in global batch order."""
        n_batches = len(order) // self.global_batch_size
        if not n_batches:
            return np.empty((0,), np.int64)
        return np.concatenate([
            order[b * self.global_batch_size + self._lo:
                  b * self.global_batch_size + self._hi]
            for b in range(n_batches)
        ])

    def __iter__(self):
        epoch = self._epoch
        order = self._epoch_order(epoch)
        self._epoch += 1
        local_idx = self._local_indices(order)

        local = DataLoader(
            _IndexView(self.dataset, local_idx),
            batch_size=self._hi - self._lo,
            shuffle=False,
            drop_last=True,
            prefetch=self.prefetch,
            # distinct per process AND per absolute epoch so fork-pool
            # augmentation streams never repeat across hosts or resumes
            seed=self.seed + 7919 * (self._pi + 1),
            num_workers=self.num_workers,
            worker_mode=self.worker_mode,
        )
        local.set_epoch(epoch)
        for batch in local:
            yield self._globalize(batch)


def make_dp_loaders(
    train_set,
    val_set,
    batch_size: int,
    num_workers: int,
    mesh: Mesh | None,
    drop_last: bool = False,
    spec_tree=P("data"),
    seed: int = 0,
    worker_mode: str = "thread",
):
    """(train_loader, val_loader) for the data-parallel plan.

    Single-process (even multi-device): plain host ``DataLoader``s — the
    jitted step's ``in_shardings`` scatter each numpy batch across the
    mesh, so no loader-side device logic is needed. Multi-process pod:
    ``MultiHostLoader``s forming global arrays. ``drop_last`` is forced
    whenever a mesh is active (every chip must receive a full shard).
    """
    if mesh is not None and jax.process_count() > 1:
        def mk(ds, shuffle):
            return MultiHostLoader(
                ds, batch_size, mesh, spec_tree=spec_tree,
                shuffle=shuffle, seed=seed, num_workers=num_workers,
                worker_mode=worker_mode,
            )
        return mk(train_set, True), mk(val_set, False)
    drop = drop_last or mesh is not None
    if drop and len(val_set) < batch_size:
        from ..utils.clp import warning
        warning(
            f"Validation set ({len(val_set)} samples) is smaller than the "
            f"batch size ({batch_size}) and tail batches are dropped under "
            f"a device mesh: the epoch will see ZERO validation batches "
            f"and val metrics will be empty. Shrink BATCH_SIZE or grow the "
            f"val split."
        )
    return (
        DataLoader(train_set, batch_size=batch_size, shuffle=True,
                   drop_last=drop, num_workers=num_workers, seed=seed,
                   worker_mode=worker_mode),
        DataLoader(val_set, batch_size=batch_size, shuffle=False,
                   drop_last=drop, num_workers=num_workers,
                   worker_mode=worker_mode),
    )


def local_np(x) -> np.ndarray:
    """Process-local numpy view of a (possibly multi-host global) array.

    Host-side metrics (px/mm accuracy) only need this process's rows; a
    plain ``np.asarray`` would fail on a pod where the global array is not
    fully addressable.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # Deduplicate by full index tuple: on a multi-axis mesh (e.g.
        # data x cameras) a P('data') array is replicated across the other
        # axis, so several local shards can cover the same rows.
        uniq = {}
        for s in x.addressable_shards:
            key = tuple(
                (sl.start, sl.stop, sl.step) for sl in s.index
            )
            uniq.setdefault(key, s)
        shards = sorted(uniq.values(), key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


__all__ = [
    "MultiHostLoader",
    "initialize_distributed",
    "local_np",
    "make_dp_loaders",
    "process_batch_slice",
    "process_frame_range",
    "_collate",
]
