"""Runtime utilities: host transfer, metrics, profiling, checkpointing."""

from dsr_tpu.utils.hostxfer import from_host, to_host  # noqa: F401
