"""Batching data loader with multi-worker sample building and prefetch.

Replaces the reference's torch ``DataLoader(num_workers=N, pin_memory=True)``
(jarvis/efficienttrack/efficienttrack.py:210-224) on the host side of the
TPU pipeline. Two worker modes:

* ``worker_mode='thread'``: samples of a batch are built
  concurrently on a thread pool. JPEG decode via cv2/libjpeg and the
  native C++ pipeline release the GIL, so threads parallelize the heavy
  work without process-fork + pickle overhead — but GIL-holding work
  (numpy augmentation, 3D target synthesis) serializes.
* ``worker_mode='process'`` (config default): forked worker processes each build and
  collate whole batches (the torch ``DataLoader(num_workers=N)`` analog,
  reference efficienttrack.py:210-224) and ship them back through
  pickled numpy buffers. Sidesteps the GIL entirely, so augmentation
  scales with cores; fork (not spawn) means the dataset object and its
  COCO index are inherited copy-on-write with zero per-worker setup.
* ``worker_mode='forkserver' | 'spawn'``: same batch-building protocol
  through a clean-child multiprocessing context. Forking a parent whose
  JAX backend is live is safe here ONLY because workers never touch
  JAX (see docs/troubleshooting.md "os.fork() warnings"); these modes
  exist for callers who run arbitrary code in ``Dataset.__getitem__``
  and want children that inherit no parent threads/locks at all. Costs:
  the dataset is pickled to every worker each epoch (no copy-on-write
  inheritance), so prefer 'process' unless the invariant is violated.

Batches are emitted in submission order in both modes, and a bounded
prefetch queue lets host data building overlap device compute.
"""

from __future__ import annotations

import os
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_FORK_POOL_DATASET = None

# Max seconds to wait for one batch from the fork pool before declaring a
# worker dead (a killed worker's in-flight task is silently lost by Pool).
# Override with JARVIS_WORKER_DEADLINE_S for hosts where one batch
# legitimately takes longer (cold NFS, huge batches); 0 disables the
# deadman and restores unbounded waiting.
_WORKER_DEADLINE_S = float(os.environ.get("JARVIS_WORKER_DEADLINE_S", 300.0))


def _reseed_forked_rngs(dataset, epoch_seed: int) -> None:
    """Give this forked worker its own RNG streams.

    Forked children inherit byte-identical copies of the parent's
    ``np.random.Generator`` state, so without this every worker — and
    every epoch's freshly forked pool — would draw the exact same
    augmentation parameter sequence, silently collapsing augmentation
    diversity by a factor of ``num_workers x epochs``. Derive a distinct
    stream per (epoch, worker, generator attribute) from the parent-drawn
    epoch seed and this child's pid.
    """
    import os

    from ..utils.rng import ThreadLocalGenerator

    holders = [dataset, getattr(dataset, "augpipe", None)]
    targets = [
        (obj, name, val)
        for obj in holders if obj is not None
        for name, val in vars(obj).items()
        if isinstance(val, (np.random.Generator, ThreadLocalGenerator))
    ]
    seq = np.random.SeedSequence([int(epoch_seed), os.getpid()])
    for (obj, name, val), child in zip(targets, seq.spawn(len(targets))):
        if isinstance(val, ThreadLocalGenerator):
            val.reseed(child)
        else:
            setattr(obj, name, np.random.default_rng(child))


def _fork_worker_init(dataset, epoch_seed):
    # runs in the forked child once: stash the inherited dataset
    import signal

    # Forked workers inherit the parent's signal dispositions — including
    # PreemptionGuard's SIGTERM handler, which swallows the first signal.
    # Pool.terminate() kills workers BY SIGTERM, so an inherited guard
    # handler makes workers unkillable: they log "saving a resumable
    # train state" and keep blocking on the task queue, the pool join
    # hangs, one pool leaks per epoch, and interpreter exit deadlocks in
    # multiprocessing's atexit join (observed: 6 wedged workers, parent
    # stuck in do_wait after a completed 100-epoch run). Preemption
    # handling belongs to the parent only; workers must die on demand.
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    # Ctrl-C is delivered to the whole foreground process group; the
    # parent turns it into a graceful stop + pool terminate, so workers
    # ignore it rather than dying mid-batch with a stack-trace storm.
    signal.signal(signal.SIGINT, signal.SIG_IGN)

    global _FORK_POOL_DATASET
    _FORK_POOL_DATASET = dataset
    _reseed_forked_rngs(dataset, epoch_seed)
    try:  # avoid cv2 thread oversubscription inside workers
        import cv2

        cv2.setNumThreads(0)
    except ImportError:
        pass


def _fork_build_batch(idxs):
    ds = _FORK_POOL_DATASET
    return _collate([ds[int(i)] for i in idxs])


class _ProducerError:
    """Sentinel carrying a producer-side exception to the consumer.

    Without it, a sample-building failure kills the producer thread
    silently and the consuming loop blocks on the queue forever.
    """

    def __init__(self, exc: BaseException):
        self.exc = exc


def available_ram_bytes() -> int:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover
        pass
    try:  # pragma: no cover - non-Linux fallback (no /proc/meminfo)
        return (os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE"))
    except (ValueError, OSError, AttributeError):  # pragma: no cover
        return 4 << 30


def maybe_preload(cfg, *datasets) -> None:
    """Honor ``DATALOADER_PRELOAD`` for datasets that support an in-memory
    decoded-sample cache: 'auto' (default) preloads when the cache fits in
    half the available RAM, 'on' forces, 'off' disables. Preloading before
    the fork-pool workers start means they inherit the cache
    copy-on-write."""
    mode = str(cfg.get("DATALOADER_PRELOAD", "auto")).lower()
    if mode in ("off", "false", "0", "none"):
        return
    targets = [d for d in datasets if hasattr(d, "preload")]
    need = sum(d.preload_nbytes() for d in targets)
    if mode == "auto" and need > 0.5 * available_ram_bytes():
        from ..utils import clp

        clp.info(f"Dataset preload skipped ({need / 1e9:.1f} GB cache vs "
                 f"{available_ram_bytes() / 1e9:.1f} GB available); set "
                 "DATALOADER_PRELOAD: on to force")
        return
    for d in targets:
        d.preload()


def _collate(samples):
    first = samples[0]
    if isinstance(first, dict):
        return {
            k: _collate([s[k] for s in samples])
            for k in first
        }
    if isinstance(first, (list, tuple)):
        return type(first)(
            _collate([s[i] for s in samples]) for i in range(len(first))
        )
    if isinstance(first, str):
        return list(samples)
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
        num_workers: int = 4,
        worker_mode: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self._epoch = 0
        self.num_workers = max(0, int(num_workers))
        assert worker_mode in ("thread", "process", "forkserver",
                               "spawn"), worker_mode
        self.worker_mode = worker_mode if self.num_workers else "thread"

    def set_epoch(self, epoch: int) -> None:
        """Pin the ABSOLUTE epoch the next ``__iter__`` belongs to.

        Shuffle order and fork-pool augmentation seeds derive from
        ``(seed, epoch)``, not from a stateful RNG: a run resumed at epoch
        k (``--resume latest`` after preemption) must see epoch k's
        permutation and augmentation streams, not replay epoch 0's.
        Trainers call this at every epoch top; plain iteration without it
        still advances one epoch per ``__iter__``.
        """
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        epoch_rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            epoch_rng.shuffle(order)
        batches = [
            order[i: i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(item) -> bool:
            """Bounded put that gives up once the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        if self.num_workers == 0:
            def produce_serial():
                try:
                    for idxs in batches:
                        if stop.is_set():
                            break
                        if not put_checked(
                            _collate([self.dataset[int(i)] for i in idxs])
                        ):
                            return
                    put_checked(None)
                except BaseException as e:  # propagate to the consumer
                    put_checked(_ProducerError(e))

            thread = threading.Thread(target=produce_serial, daemon=True)
        elif self.worker_mode in ("process", "forkserver", "spawn"):
            import multiprocessing as mp

            # 'process' forks from the calling thread (not the producer
            # thread): the children inherit only this moment's state and
            # never touch jax/XLA, so the usual fork-after-backend-init
            # hazards don't apply to the worker loop (invariant pinned by
            # tests/test_dataset.py fork-after-device-activity stress).
            # 'forkserver'/'spawn' children start clean instead; the
            # initializer args (incl. the dataset) are pickled to them.
            ctx = mp.get_context(
                "fork" if self.worker_mode == "process"
                else self.worker_mode)
            # a fresh seed every epoch, derived from the ABSOLUTE epoch:
            # re-forked pools never replay a previous epoch's augmentation
            # streams, including across preemption resumes (set_epoch)
            epoch_seed = int(epoch_rng.integers(2**31 - 1))
            pool_proc = ctx.Pool(self.num_workers,
                                 initializer=_fork_worker_init,
                                 initargs=(self.dataset, epoch_seed))
            # pin the worker Process handles now: the SIGKILL escalation
            # below must not depend on Pool._pool (a private attribute)
            # still existing at teardown time
            pool_workers = list(getattr(pool_proc, "_pool", None) or [])
            if not pool_workers:  # pragma: no cover - stdlib drift
                from ..utils import clp

                clp.warning(
                    "multiprocessing.Pool no longer exposes worker "
                    "processes (_pool); wedged-worker SIGKILL escalation "
                    "is disabled for this run")

            def produce_proc():
                it = iter(batches)
                pending: deque = deque()

                def submit_next() -> bool:
                    idxs = next(it, None)
                    if idxs is None:
                        return False
                    pending.append(pool_proc.apply_async(
                        _fork_build_batch, ([int(i) for i in idxs],)))
                    return True

                def get_checked(result):
                    """AsyncResult.get with a heartbeat: Pool silently
                    loses the in-flight task of a killed worker (e.g.
                    OOM), so a bare get() would hang training forever.
                    Poll with a timeout, honor consumer shutdown, and
                    raise once no result appears within the deadline."""
                    waited = 0.0
                    while not stop.is_set():
                        try:
                            return result.get(timeout=1.0)
                        except mp.TimeoutError:
                            waited += 1.0
                            if _WORKER_DEADLINE_S and \
                                    waited >= _WORKER_DEADLINE_S:
                                raise RuntimeError(
                                    "dataloader worker produced no batch "
                                    f"for {int(waited)}s — a forked worker "
                                    "likely died (OOM-killed?); its task "
                                    "is lost. Reduce num_workers or "
                                    "memory per sample.")
                    return None

                try:
                    # keep the workers saturated one batch ahead of the
                    # prefetch queue
                    for _ in range(self.prefetch + self.num_workers):
                        if not submit_next():
                            break
                    while pending:
                        batch = get_checked(pending.popleft())
                        if batch is None:  # consumer gone
                            return
                        submit_next()
                        if not put_checked(batch):
                            return
                    put_checked(None)
                except BaseException as e:  # propagate to the consumer
                    put_checked(_ProducerError(e))
                finally:
                    pool_proc.terminate()
                    # Pool.join has no timeout and a wedged worker (e.g.
                    # one forked before _fork_worker_init restored its
                    # signal dispositions, or stuck in uninterruptible
                    # IO) hangs it forever — which leaks one pool per
                    # epoch and deadlocks interpreter exit. Bound the
                    # join and escalate to SIGKILL.
                    joiner = threading.Thread(target=pool_proc.join,
                                              daemon=True)
                    joiner.start()
                    joiner.join(timeout=10.0)
                    if joiner.is_alive():  # pragma: no cover - escalation
                        for p in pool_workers:
                            if p.is_alive():
                                p.kill()
                        joiner.join(timeout=5.0)

            thread = threading.Thread(target=produce_proc, daemon=True)
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)

            def produce():
                it = iter(batches)
                pending: deque = deque()

                def submit_next() -> bool:
                    idxs = next(it, None)
                    if idxs is None:
                        return False
                    pending.append([
                        pool.submit(self.dataset.__getitem__, int(i))
                        for i in idxs
                    ])
                    return True

                put = put_checked

                try:
                    # keep prefetch+1 batches worth of samples in flight
                    for _ in range(self.prefetch + 1):
                        if not submit_next():
                            break
                    while pending:
                        futs = pending.popleft()
                        batch = _collate([f.result() for f in futs])
                        submit_next()
                        if not put(batch):
                            return
                    put(None)
                except BaseException as e:  # propagate to the consumer
                    put(_ProducerError(e))
                finally:
                    pool.shutdown(wait=False, cancel_futures=True)

            thread = threading.Thread(target=produce, daemon=True)

        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            stop.set()
