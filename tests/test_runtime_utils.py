"""Checkpoint/resume, work queue, profiling-scope smoke gates."""

import numpy as np
import pytest

import jax.numpy as jnp

from dsr_tpu.asr.am.gmm import GmmParams
from dsr_tpu.utils import checkpoint as ckpt
from dsr_tpu.utils import profiling
from dsr_tpu.utils import workqueue


def test_checkpoint_roundtrip(tmp_path):
    p = GmmParams(
        jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4),
        jnp.ones((2, 3, 4)),
        jnp.zeros((2, 3)),
    )
    path = str(tmp_path / "ck")
    ckpt.save(path, p)
    q = ckpt.restore(path, p)
    np.testing.assert_allclose(np.asarray(q.means), np.asarray(p.means))
    np.testing.assert_allclose(np.asarray(q.variances), np.asarray(p.variances))


def test_decode_progress_and_workqueue_resume(tmp_path):
    path = str(tmp_path / "progress.json")
    utts = [f"utt{i:03d}" for i in range(10)]
    seen = []

    def crashy(batch):
        if "utt006" in batch:
            raise RuntimeError("simulated failure")
        seen.extend(batch)

    prog = ckpt.DecodeProgress(path)
    with pytest.raises(RuntimeError):
        workqueue.run_batched(utts, 2, crashy, prog)
    # resume: completed utterances are skipped, the failed batch is retried
    prog2 = ckpt.DecodeProgress(path)
    done_before = set(prog2.done)
    assert "utt006" not in done_before and "utt000" in done_before
    seen2 = []
    workqueue.run_batched(utts, 2, lambda b: seen2.extend(b), prog2)
    assert set(seen2) == set(utts) - done_before
    prog3 = ckpt.DecodeProgress(path)
    assert prog3.done == set(utts)


def test_profiling_scope_smoke():
    with profiling.scope("stage"):
        x = jnp.sum(jnp.ones(8))
    assert float(x) == 8.0
