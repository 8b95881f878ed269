"""Runtime utilities: host transfer, metrics, profiling, checkpointing."""

from dsr_tpu.utils.hostxfer import to_host  # noqa: F401
