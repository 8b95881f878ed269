"""Device-mesh construction for the (data, model, subband) logical axes."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from dsr_tpu.config import MeshConfig

AXES = ("data", "model", "subband")


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a Mesh over the logical axes.

    With cfg=None, all devices go to `data` (utterance-batch parallelism,
    the dominant axis for DSR workloads).  Axis sizes must multiply to the
    device count used.
    """
    devices = jax.devices() if devices is None else devices
    if cfg is None:
        cfg = MeshConfig(data=len(devices))
    n = cfg.num_devices
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.model, cfg.subband)
    return Mesh(arr, AXES)


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host runtime init (jax.distributed) — the reference's grid-job
    scale-out story becomes a real communication backend (SURVEY.md §2.3).

    No-op when single-process (the only mode testable in this environment).
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
