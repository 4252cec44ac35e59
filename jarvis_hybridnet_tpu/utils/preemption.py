"""Preemption-safe training (the SURVEY §5 "failure detection / elastic
recovery" subsystem — absent in the reference, where failures surface as
asserts and runs are not resumable mid-epoch).

On TPU fleets preemption is routine: the scheduler delivers SIGTERM with
a short grace window before evicting the VM. ``PreemptionGuard`` turns
that into a clean stop: it installs signal handlers for the duration of
a training run, trainers poll ``guard.should_stop`` at step boundaries,
and on a request they write a full resumable train state (params +
optimizer + epoch, ``training.checkpoints.save_train_state``) and return
with ``results["preempted"] = True``. The next run passes
``resume_from=<savepath>/train_state.ckpt`` and continues; the partial
epoch is re-run from its start (data order is epoch-deterministic, so no
loader state needs saving).

A second signal while the guard is active restores the previous handler
and re-raises it, so a stuck save can still be killed the normal way.

Multi-host: signal delivery is NOT synchronized across hosts, so trainers
poll ``should_stop_global()`` — a tiny flag all-gather (strided to every
``POD_POLL_STRIDE``-th step, unconditional at epoch ends) that makes
every process stop at the same boundary iff any process saw a signal.
Only process 0 writes the checkpoint (train state is replicated).
"""

from __future__ import annotations

import os
import signal
import threading

from . import clp

# SIGTERM: what TPU-VM maintenance/preemption actually delivers.
# SIGINT:  lets an interactive Ctrl-C produce a resumable run too.
DEFAULT_SIGNALS = (signal.SIGTERM, signal.SIGINT)

# In-step cadence for the pod stop collective: at most this many extra
# steps run after a signal before the pod agrees to stop — far inside any
# eviction grace window, at 1/16th the per-step DCN cost.
POD_POLL_STRIDE = 16


class PreemptionGuard:
    """Context manager that converts termination signals into a polled
    stop request. Only usable from the main thread (POSIX signal rule);
    anywhere else it degrades to a manual ``request_stop()`` flag."""

    def __init__(self, signals=DEFAULT_SIGNALS):
        self._signals = tuple(signals)
        self._pid = os.getpid()
        self._stop = threading.Event()
        self._prev: dict[int, object] = {}
        self._installed = False
        self._calls = 0  # strided should_stop_global collective gate

    # -- context management -------------------------------------------
    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            self._pid = os.getpid()
            for sig in self._signals:
                self._prev[sig] = signal.signal(sig, self._on_signal)
            self._installed = True
        return self

    def __exit__(self, *exc):
        if self._installed:
            for sig, prev in self._prev.items():
                signal.signal(sig, prev)
            self._prev.clear()
            self._installed = False
        return False

    # -- signal path ---------------------------------------------------
    def _on_signal(self, signum, frame):
        if os.getpid() != self._pid:
            # Forked child inheriting this handler (dataloader fork-pool
            # workers reset their dispositions at init, but a fork can
            # land before that): the guard owns preemption in the PARENT
            # only. Swallowing the signal here would make the child
            # unkillable by Pool.terminate(); disown and die normally.
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
            return
        if self._stop.is_set():
            # Second signal: give up gracefulness — restore the previous
            # handler and re-deliver, so the process can actually die.
            # A None previous handler (installed by non-Python code) can't
            # be re-set from Python, and SIG_IGN would swallow the
            # re-raise; both fall back to the default action.
            prev = self._prev.get(signum, signal.SIG_DFL)
            if prev is None or prev == signal.SIG_IGN:
                prev = signal.SIG_DFL
            signal.signal(signum, prev)
            signal.raise_signal(signum)
            return
        self._stop.set()
        clp.warning(
            f"Received signal {signal.Signals(signum).name}: finishing the "
            "current step, saving a resumable train state, then exiting. "
            "Send again to terminate immediately."
        )

    # -- trainer API -----------------------------------------------------
    def request_stop(self) -> None:
        """Manual trigger (tests, schedulers with their own signal plumbing)."""
        self._stop.set()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def should_stop_global(self, stride: int = 1) -> bool:
        """Pod-safe stop check: all processes agree at the same boundary.

        Signal delivery is not synchronized across hosts, so a local flag
        can flip between different hosts' step boundaries; a host that
        dispatched one more step would then hang in that step's gradient
        all-reduce while the others have left the loop (and if that host
        is process 0, no checkpoint gets written). Every process calls
        this at every step/epoch boundary: with >1 process it all-gathers
        the local flags (a few bytes over DCN) and stops iff ANY process
        saw a signal — the agreement is itself the synchronization point.

        ``stride``: on pods, pay the collective only every ``stride``-th
        call (a per-step DCN round-trip would tax short steps); the call
        COUNT gates the collective, never the local flag, so every process
        joins exactly the same collectives. All processes must therefore
        call this with the same stride sequence at the same boundaries.
        Single-process runs read the local flag and never pay anything.
        """
        import jax

        if jax.process_count() == 1:
            return self.should_stop
        self._calls += 1
        if stride > 1 and self._calls % stride:
            return False
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self.should_stop]))
        return bool(np.asarray(flags).any())


def is_primary_host() -> bool:
    """True on the process that should write shared checkpoints."""
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True
