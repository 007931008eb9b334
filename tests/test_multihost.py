"""Two-process multi-host data parallelism, actually executed.

Spawns two python processes that join one `jax.distributed` deployment
(4 virtual CPU devices each -> an 8-device global mesh), shard the fold
per host with `shard_fold_data`, and run DP train+eval epochs whose psum
crosses the process boundary. The replicated loss must come out identical
on both hosts — the invariant that makes multi-host DP correct."""

import os
import re
import socket
import subprocess
import sys

import pytest

# Compile-heavy tier: deselect with `-m "not slow"` for the fast smoke pass
# (see pyproject [tool.pytest.ini_options] markers and docs/DESIGN.md).
pytestmark = pytest.mark.slow

CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_epoch_runs_and_replicates():
    port = str(_free_port())
    env = dict(os.environ)
    # The child sets its own JAX_PLATFORMS/XLA_FLAGS before importing jax;
    # scrub the pytest session's values so they don't pre-empt it.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    results = {}
    guards = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d) train_loss=([\d.]+) val_loss=([\d.]+) er=([\d.]+) "
            r"guard=(\S+) ms_loss=([\d.]+)",
            out,
        )
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (m.group(2), m.group(3), m.group(4), m.group(6))
        guards[int(m.group(1))] = m.group(5)

    assert set(results) == {0, 1}
    # Replicated state: both hosts must report the SAME losses/metrics
    # (the gradient psum crossed the process boundary and agreed).
    assert results[0] == results[1], results
    # Starved-shard guard: host 0's adversarial shard passes, host 1's (no
    # positives in its contiguous half) is refused with an actionable error.
    assert guards == {0: "ok", 1: "raised"}, guards
