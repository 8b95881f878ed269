"""Test harness: CPU backend with 8 virtual devices (SURVEY.md §4.4).

Multi-chip hardware is unavailable; all sharded code paths are exercised on
a simulated 8-device CPU mesh.  Kernel correctness on the real TPU chip is
covered by `tools/run_pallas_on_tpu.py` (runs the test_pallas.py cases
non-interpreted on the chip: DSR_TPU_TESTS=1 keeps the axon backend) and by
bench.py / __graft_entry__.py runs.
"""

import os
import sys

ON_TPU = bool(os.environ.get("DSR_TPU_TESTS"))
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # CPU suites never touch the persistent compile cache: entries written
    # by axon-session processes carry the REMOTE compile machine's CPU
    # feature set (+amx/+prefer-no-scatter...), and loading such an AOT
    # result on this host warns "could lead to SIGILL" and has segfaulted
    # a suite run (round 5).  Local CPU compiles are cheap; the cache's
    # value is the 10-90 s axon remote compiles, which keep it.
    os.environ.setdefault("DSR_TPU_NO_CACHE", "1")
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # 8 virtual devices share few physical cores: a long-running
    # other-device computation can hold a collective rendezvous past
    # XLA:CPU's terminate timeout, which CHECK-fails the process (seen as
    # a flaky fatal in a contended dryrun).  Warn early, terminate late.
    if "--xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
    os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize (PYTHONPATH=/root/.axon_site) registers the
# axon TPU plugin and sets jax_platforms="axon,cpu" before conftest runs, so
# the env var alone is not enough — override the live config too.
import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

# NaN-guard test mode (SURVEY.md §5 sanitizer analogue): DSR_DEBUG_NANS=1
# flips jax_debug_nans for the WHOLE suite; the `debug_nans` fixture scopes
# it to individual tests (tests/test_nan_guard.py runs the numeric core
# paths under it every run).
if os.environ.get("DSR_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import pytest  # noqa: E402


@pytest.fixture
def debug_nans():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
